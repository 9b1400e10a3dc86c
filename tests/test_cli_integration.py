"""End-to-end CLI integration (tiny config, subprocess level).

These run in the DEFAULT suite: flag-level regressions (a broken default
checkpoint path, an argparse typo) can't be caught by module-level tests.
Each CLI invocation compiles its own graphs, so the subprocesses share the
persistent XLA compilation cache — first run pays, reruns are cheap.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow


TINY_YAML = """
model:
  view_num: 2
  image_size: 64
  spatial_volume_size: 8
  frustum_volume_depth: 8
  voxel_grid_shape: [16, 16, 16]
  max_vertices: 64
  sample_steps: 2
  dtype: float32
  vae_ch: 32
  vae_ch_mult: [1, 1, 1, 1]
  vae_num_res_blocks: 1
  vae_encode_chunk: 0
  fine_voxel_size: 0.02
  unet:
    model_channels: 32
    num_heads: 4
    volume_dims: [8, 16, 32, 64]
  clip:
    width: 64
    layers: 2
    num_heads: 2
    patch_size: 14
    output_dim: 768
data:
  dataset: facescape
  batch_size: 2
  num_workers: 1
train:
  max_steps: 1
  log_every: 1
  val_check_interval: 0
  shard_opt_state: false
"""


def _env(devices: int | None = None):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    # share the suite's persistent XLA compile cache across CLI subprocesses
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/mdtpu_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    if devices is not None:  # e.g. train: data mesh must divide the batch
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    return env


def _tiny_inputs(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(TINY_YAML)
    img = tmp_path / "in.png"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
    ).save(img)
    mesh = tmp_path / "mesh.obj"
    v = rng.uniform(-0.1, 0.1, (12, 3))
    mesh.write_text("".join(f"v {a} {b} {c}\n" for a, b, c in v))
    return cfg, img, mesh


def _run(args, timeout=1800, devices=None):
    r = subprocess.run(
        [sys.executable, "-m"] + args,
        capture_output=True, text=True, env=_env(devices), timeout=timeout,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-3000:])
    return r


def test_generate_face_cli(tmp_path):
    cfg, img, mesh = _tiny_inputs(tmp_path)
    out = tmp_path / "out"
    _run(["morphablediffusion_tpu.apps.generate_face",
          "--input_img", str(img), "--mesh", str(mesh), "--cfg", str(cfg),
          "--ckpt", "random", "--output_dir", str(out), "--sample_steps", "2",
          "--prepare_neus2_data"])
    strip = out / "in_mesh.png"
    assert strip.is_file()
    arr = np.asarray(Image.open(strip))
    assert arr.shape == (64, 64 * 3, 3)  # input + 2 views
    neus = out / "neus2_data" / "in_mesh"
    tf = json.loads((neus / "transform.json").read_text())
    assert len(tf["frames"]) == 2
    assert (neus / "images" / "00.png").is_file()


def test_generate_face_cli_torch_ckpt(tmp_path):
    """The documented happy path: --ckpt <torch .ckpt> must import-and-run
    (this exact path crashed in round 1: load_params without a template)."""
    torch = pytest.importorskip("torch")
    cfg, img, mesh = _tiny_inputs(tmp_path)
    ckpt = tmp_path / "weights.ckpt"
    # width-independent tensors every config accepts (VAE z=4 -> 8ch quant)
    torch.save(
        {"state_dict": {
            "first_stage_model.quant_conv.weight": torch.randn(8, 8, 1, 1),
            "first_stage_model.quant_conv.bias": torch.randn(8),
        }},
        ckpt,
    )
    out = tmp_path / "out_ckpt"
    r = _run(["morphablediffusion_tpu.apps.generate_face",
              "--input_img", str(img), "--mesh", str(mesh), "--cfg", str(cfg),
              "--ckpt", str(ckpt), "--output_dir", str(out),
              "--sample_steps", "2"])
    assert "imported 2 tensors" in r.stdout
    assert (out / "in_mesh.png").is_file()


def test_generate_face_cli_fine_autoselect(tmp_path):
    """A .ckpt shipping trained xyzc_net (spconv) weights auto-selects the
    fine-grid conditioner, cropped to the mesh, and samples through it."""
    torch = pytest.importorskip("torch")
    from test_mesh_voxel_fine import SparseConvNetOracle

    cfg, img, mesh = _tiny_inputs(tmp_path)
    torch.manual_seed(0)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in SparseConvNetOracle().spconv_state_dict().items()}
    ckpt = tmp_path / "with_xyzc.ckpt"
    torch.save({"state_dict": sd}, ckpt)
    out = tmp_path / "out_fine"
    r = _run(["morphablediffusion_tpu.apps.generate_face",
              "--input_img", str(img), "--mesh", str(mesh), "--cfg", str(cfg),
              "--ckpt", str(ckpt), "--output_dir", str(out),
              "--sample_steps", "2", "--no_mica_alignment"])
    assert "using the fine-grid conditioner" in r.stdout
    assert "imported 45 tensors" in r.stdout
    assert (out / "in_mesh.png").is_file()


def test_autoselect_fine_conditioner_unit():
    from morphablediffusion_tpu.apps.generate_face import (
        autoselect_fine_conditioner,
    )
    from morphablediffusion_tpu.utils.config import Config

    sd = {"spatial_volume.xyzc_net.conv0.0.weight": np.zeros(1)}
    # mesh spanning 0.10 x 0.20 x 0.40 m -> dhw-ordered out_sh at 0.005 m
    verts = np.asarray([[0.0, 0.0, 0.0], [0.1, 0.2, 0.4]], np.float32)

    cfg = Config()
    assert autoselect_fine_conditioner(cfg.model, sd, verts)
    assert cfg.model.mesh_voxel_mode == "fine"
    assert cfg.model.fine_grid_shape == (84, 44, 24)  # (ceil|3)+1, (z, y, x)

    cfg = Config()
    assert not autoselect_fine_conditioner(cfg.model, {}, verts)
    assert cfg.model.mesh_voxel_mode == "coarse"

    cfg = Config()
    cfg.model.mesh_voxel_mode = "fine"
    shape = cfg.model.fine_grid_shape
    assert not autoselect_fine_conditioner(cfg.model, sd, verts)
    assert cfg.model.fine_grid_shape == shape  # explicit config untouched


def test_train_cli(tmp_path):
    """train -b tiny.yaml on a synthetic on-disk dataset: one optimizer step,
    checkpoint written, clean exit."""
    # synthetic FaceScape layout (mirrors tests/test_data.py fixture)
    root = tmp_path / "data"
    flame = tmp_path / "flame"
    rng = np.random.default_rng(1)
    for s in ["001", "002"]:
        for e in ["01", "02"]:
            d = root / s / e
            cams = {}
            for v in range(4):
                p = d / f"view_{str(v).zfill(5)}" / "rgba_colorcalib.png"
                p.parent.mkdir(parents=True, exist_ok=True)
                a = rng.integers(0, 255, (64, 64, 4), dtype=np.uint8)
                a[..., 3] = 255
                Image.fromarray(a, "RGBA").save(p)
                cams[str(v)] = {
                    "intrinsics": [[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]],
                    "extrinsics": [[1, 0, 0, 0], [0, 1, 0, 0],
                                   [0, 0, 1, 1.5]],
                    "angles": {"azimuth": (v - 2) * 20, "elevation": 0.0},
                }
            (d / "cameras.json").write_text(json.dumps(cams))
            m = flame / s / e / "mesh.obj"
            m.parent.mkdir(parents=True, exist_ok=True)
            m.write_text("".join(
                f"v {a} {b} {c}\n"
                for a, b, c in rng.uniform(-0.1, 0.1, (12, 3))
            ))

    # extend the tiny config with dataset paths + explicit uids
    cfg = tmp_path / "train.yaml"
    cfg.write_text(TINY_YAML.replace(
        "data:\n  dataset: facescape",
        "data:\n  dataset: facescape\n"
        f"  data_dir: {root}\n"
        f"  flame_assets_dir: {flame}\n"
        "  uids: ['001/01', '001/02', '002/01', '002/02']\n"
        "  val_uids: ['002/02']\n"
        "  shuffled_expression: false",
    ))

    # pre-train a tiny first stage on the same images and graft it in:
    # the from-scratch recipe's stage-2 path (train.py --vae_from)
    vae_out = tmp_path / "vae.msgpack"
    r = _run(["morphablediffusion_tpu.apps.train_vae",
              "--data_dir", str(root), "--out", str(vae_out),
              "--image_size", "64", "--ch", "32", "--ch_mult", "1,1,1,1",
              "--num_res_blocks", "1", "--steps", "4", "--batch_size", "2",
              "--log_every", "2", "--save_every", "4", "--num_workers", "1"])
    assert "folded" in r.stdout and vae_out.is_file()

    run_dir = tmp_path / "runs"
    # 2-device mesh: the data axis must divide the batch of 2
    r = _run(["morphablediffusion_tpu.apps.train", "-b", str(cfg),
              "-l", str(run_dir), "-n", "smoke", "--max_steps", "1",
              "--vae_from", str(vae_out)],
             devices=2)
    assert "grafting first_stage" in r.stdout
    assert "training done" in r.stdout
    assert (run_dir / "smoke" / "ckpt").is_dir()
