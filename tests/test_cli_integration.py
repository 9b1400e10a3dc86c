"""End-to-end CLI integration (tiny config, random weights).

Slow on the 1-core CPU test host (each CLI invocation compiles its own
graphs), so gated behind MDTPU_SLOW_TESTS=1. The driver's fast suite covers
the same code paths at module level (test_model_smoke, test_trainer).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

slow = pytest.mark.skipif(
    not os.environ.get("MDTPU_SLOW_TESTS"),
    reason="set MDTPU_SLOW_TESTS=1 to run CLI integration tests",
)

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
train:
  max_steps: 1
"""


def _env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    return env


@slow
def test_generate_face_cli(tmp_path):
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

    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "morphablediffusion_tpu.apps.generate_face",
         "--input_img", str(img), "--mesh", str(mesh), "--cfg", str(cfg),
         "--ckpt", "random", "--output_dir", str(out), "--sample_steps", "2",
         "--prepare_neus2_data"],
        capture_output=True, text=True, env=_env(), timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    strip = out / "in_mesh.png"
    assert strip.is_file()
    arr = np.asarray(Image.open(strip))
    assert arr.shape == (64, 64 * 3, 3)  # input + 2 views
    neus = out / "neus2_data" / "in_mesh"
    tf = json.loads((neus / "transform.json").read_text())
    assert len(tf["frames"]) == 2
    assert (neus / "images" / "00.png").is_file()
