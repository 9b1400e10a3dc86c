"""Eval harness CLI stages on synthetic fixtures (host-side, no model)."""

import json

import numpy as np
import pytest
from PIL import Image

from morphablediffusion_tpu.apps.eval_2d import main as eval_2d_main
from morphablediffusion_tpu.apps.eval_keypoints import main as kpts_main
from morphablediffusion_tpu.apps.eval_select_views import select_views


@pytest.fixture
def eval_fixture(tmp_path):
    """Synthetic facescape root (1 test subject), a generated strip, and
    kpts JSONs."""
    rng = np.random.default_rng(0)
    subject, exp = "122", "01"
    d = tmp_path / "data" / subject / exp
    cams = {}
    views = [0, 1, 2]
    gt_imgs = []
    for v in views:
        img = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
        img[..., 3] = 255
        vd = d / f"view_{str(v).zfill(5)}"
        vd.mkdir(parents=True)
        Image.fromarray(img, "RGBA").save(vd / "rgba_colorcalib.png")
        gt_imgs.append(img[..., :3].astype(np.float32) / 255.0)
        cams[str(v)] = {
            "intrinsics": [[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]],
            "extrinsics": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 1.5]],
            "angles": {"azimuth": (v - 1) * 10.0, "elevation": 0.0},
        }
    (d / "cameras.json").write_text(json.dumps(cams))

    # stage 1 output
    views_json = tmp_path / "views.json"
    meta = select_views(str(tmp_path / "data"))
    views_json.write_text(json.dumps(meta))

    # a "generated" strip that equals GT (perfect metrics) for the targets
    sel = meta[subject][exp]["target_views"]
    strip = np.concatenate(
        [(gt_imgs[int(v)] * 255).astype(np.uint8) for v in sel], axis=1
    )
    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    Image.fromarray(strip).save(gen_dir / f"{subject}_{exp}.png")

    kpts = {f"{subject}_{exp}_{v}": rng.uniform(5, 27, (68, 2)).tolist()
            for v in sel}
    gt_kpts_path = tmp_path / "kpts_gt.json"
    pred_kpts_path = tmp_path / "kpts_pred.json"
    gt_kpts_path.write_text(json.dumps(kpts))
    pred_kpts_path.write_text(json.dumps(kpts))
    return tmp_path, views_json, gen_dir, gt_kpts_path, pred_kpts_path


def test_select_views(eval_fixture):
    tmp_path, views_json, *_ = eval_fixture
    meta = json.loads(views_json.read_text())
    e = meta["122"]["01"]
    # input = min-azimuth frontal; all 3 views are < 90 deg targets
    assert e["input_view"] == "0"  # azimuth -10 is the minimum
    assert sorted(e["target_views"]) == ["0", "1", "2"]


def test_eval_keypoints_precomputed(eval_fixture, capsys):
    tmp_path, _, _, gt_kpts, _ = eval_fixture
    out = tmp_path / "kpts_out.json"
    kpts_main(["--image_dir", "unused", "--output", str(out),
               "--backend", "precomputed", "--precomputed", str(gt_kpts)])
    data = json.loads(out.read_text())
    assert all(len(v) == 68 for v in data.values())


def test_iter_strip_tiles_and_restricted_scan(eval_fixture):
    """--strips slices {subject}_{exp}.png into per-target-view tiles with
    GT-matching keys (predict_keypoints.py:219-232 does the same on the
    reference side), and --views_json restricts the GT scan to stage-1
    subjects/expressions."""
    from morphablediffusion_tpu.apps.eval_keypoints import (
        _iter_strip_tiles,
        _iter_view_images,
    )

    tmp_path, views_json, gen_dir, *_ = eval_fixture
    meta = json.loads(views_json.read_text())
    sel = meta["122"]["01"]["target_views"]

    tiles = dict(_iter_strip_tiles(gen_dir, str(views_json)))
    assert set(tiles) == {
        f"122_01_view_{str(v).zfill(5)}_rgba_colorcalib" for v in sel
    }
    assert all(t.size == (32, 32) for t in tiles.values())

    gt = dict(_iter_view_images(tmp_path / "data", str(views_json)))
    # keys intersect exactly: eval_2d pairs pred/GT by key set intersection
    assert set(tiles) <= set(gt)
    # tile pixels equal the GT view they were sliced from (strip == GT here)
    for key, tile in tiles.items():
        assert np.array_equal(
            np.asarray(tile), np.asarray(gt[key].convert("RGB"))
        )


def test_eval_2d_perfect_reconstruction(eval_fixture):
    tmp_path, views_json, gen_dir, gt_kpts, pred_kpts = eval_fixture
    result = eval_2d_main([
        "--data_dir", str(tmp_path / "data"),
        "--generated_dir", str(gen_dir),
        "--views_json", str(views_json),
        "--image_size", "32",
        "--pred_kpts", str(pred_kpts),
        "--gt_kpts", str(gt_kpts),
    ])
    assert result["pairs"] == 3
    assert result["ssim"] > 0.99
    assert result["psnr"] > 40
    assert result["pck@0.2"] == 1.0


def test_eval_2d_all_five_metrics(eval_fixture, tmp_path):
    """eval_2d emits every reference metric (eval_2d_facescape.py:139) from
    in-repo backends: SSIM/PSNR native, FID from a CLIP tower in a torch
    .ckpt, Re-ID from IR-SE50 weights, PCK from kpts JSONs. LPIPS stays
    null without the external lpips package (documented)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    root, views_json, gen_dir, gt_kpts, pred_kpts = eval_fixture

    # tiny model cfg matching the 32x32 fixture images
    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(
        "model:\n  image_size: 32\n  max_vertices: 16\n  view_num: 2\n"
        "  clip:\n    width: 32\n    layers: 1\n    num_heads: 2\n"
        "    patch_size: 14\n    output_dim: 16\n"
    )

    # synthesize a torch ckpt holding exactly the CLIP-tower tensors
    from morphablediffusion_tpu.models.clip import CLIPImageEncoder
    from morphablediffusion_tpu.utils import torch_import as ti
    from test_torch_import import _get, _torch_shape

    enc = CLIPImageEncoder(width=32, layers=1, num_heads=2, patch_size=14,
                           output_dim=16)
    like = jax.eval_shape(
        lambda: enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    )
    rng = np.random.default_rng(3)
    sd = {}
    for tkey, opath, kind in ti.clip_mapping(layers=1):
        leaf = _get(like["params"], opath.split("/", 1)[1])
        if leaf is None:
            continue
        name = opath.rsplit("/", 1)[-1]
        sd[tkey] = torch.from_numpy(
            rng.normal(0, 0.05, _torch_shape(kind, name, leaf.shape)).astype(
                np.float32
            )
        )
    ckpt = tmp_path / "clip.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    # IR-SE50 weights: random-init reference-shaped state_dict
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.thirdp.psp.model_irse import Backbone

    torch.manual_seed(2)
    reid_w = tmp_path / "ir_se50.pth"
    torch.save(Backbone(112, 50, "ir_se").eval().state_dict(), reid_w)

    # VERDICT r3 item 10: IR-SE50 weights WITHOUT an explicit calibrated
    # threshold must refuse (the dlib 0.6 default is known-wrong for
    # IR-SE50's distance scale) and point at calibrate_reid
    with pytest.raises(SystemExit, match="calibrate_reid"):
        eval_2d_main([
            "--data_dir", str(root / "data"),
            "--generated_dir", str(gen_dir),
            "--views_json", str(views_json),
            "--image_size", "32",
            "--reid_weights", str(reid_w),
        ])

    result = eval_2d_main([
        "--data_dir", str(root / "data"),
        "--generated_dir", str(gen_dir),
        "--views_json", str(views_json),
        "--image_size", "32",
        "--pred_kpts", str(pred_kpts),
        "--gt_kpts", str(gt_kpts),
        "--ckpt", str(ckpt),
        "--cfg", str(cfg_path),
        "--reid_weights", str(reid_w),
        "--reid_threshold", "0.6",
    ])
    # generated == GT: FID ~ 0, every view re-identified, PCK perfect
    assert result["fid"] is not None and result["fid"] < 1e-3
    assert result["re_id"] == 1.0
    assert result["pck@0.2"] == 1.0
    assert result["ssim"] > 0.99
    assert "lpips" in result  # present (null without the external package)


def test_reid_eer_threshold():
    """EER calibration math: separable distributions -> threshold between
    them with ~0 EER; the threshold feeds eval_2d --reid_threshold."""
    from morphablediffusion_tpu.apps.calibrate_reid import eer_threshold

    rng = np.random.default_rng(0)
    same = rng.normal(0.4, 0.05, 300)
    diff = rng.normal(1.1, 0.08, 300)
    t, eer = eer_threshold(same, diff)
    assert 0.55 < t < 0.95 and eer < 0.01

    # overlapping distributions: EER reflects the overlap
    same2 = rng.normal(0.8, 0.2, 300)
    diff2 = rng.normal(1.0, 0.2, 300)
    t2, eer2 = eer_threshold(same2, diff2)
    assert 0.7 < t2 < 1.1 and 0.15 < eer2 < 0.5


def test_calibrate_reid_same_view_pairing(tmp_path):
    """End-to-end calibrate_reid with --pairing same_view: pairs hold the
    camera fixed (the deployed metric's geometry — eval_2d compares each
    generated view against GT at the SAME camera), the landmark-feature
    embedder runs, and the JSON artifact records distributions + pairing."""
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.apps.calibrate_reid import main as cal_main
    from morphablediffusion_tpu.eval.keypoint_net import (
        LandmarkNet,
        save_params,
    )

    rng = np.random.default_rng(0)
    # 2 subjects x 2 expressions x 3 shared view ids; subject-specific base
    # color so identity signal exists even at random-init features
    for si, sub in enumerate(["001", "002"]):
        base = rng.integers(40, 200, 3)
        for exp in ["01", "02"]:
            d = tmp_path / "data" / sub / exp
            for v in range(3):
                img = np.clip(
                    base + rng.integers(-20, 20, (32, 32, 3)), 0, 255
                ).astype(np.uint8)
                rgba = np.concatenate(
                    [img, np.full((32, 32, 1), 255, np.uint8)], -1
                )
                vd = d / f"view_{str(v).zfill(5)}"
                vd.mkdir(parents=True)
                Image.fromarray(rgba, "RGBA").save(vd / "rgba_colorcalib.png")

    net = LandmarkNet()
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    weights = tmp_path / "net.msgpack"
    save_params(str(weights), params)

    out = tmp_path / "cal.json"
    cal_main([
        "--data_dir", str(tmp_path / "data"),
        "--embedder", "landmark",
        "--weights", str(weights),
        "--image_size", "32",
        "--pairs", "16",
        "--pairing", "same_view",
        "--out", str(out),
    ])
    result = json.loads(out.read_text())
    assert result["pairing"] == "same_view"
    assert result["n_pairs"] == 16
    for cls in ("same", "diff"):
        assert np.isfinite(result[cls]["mean"])
    assert np.isfinite(result["eer_threshold"])
    assert 0.0 <= result["eer"] <= 0.5


def test_calibrate_reid_same_view_skips_invalid_subjects(tmp_path):
    """ADVICE r3: same_view pairing used to crash (rng.integers(0)) when it
    sampled a subject with no multi-image view; now such subjects are skipped
    for same-identity pairs, and a tree with NO valid subject exits cleanly."""
    import jax
    import jax.numpy as jnp
    import pytest

    from morphablediffusion_tpu.apps.calibrate_reid import main as cal_main
    from morphablediffusion_tpu.eval.keypoint_net import (
        LandmarkNet,
        save_params,
    )

    rng = np.random.default_rng(1)

    def write_subject(sub, exps, views):
        base = rng.integers(40, 200, 3)
        for exp in exps:
            for v in views:
                img = np.clip(
                    base + rng.integers(-20, 20, (32, 32, 3)), 0, 255
                ).astype(np.uint8)
                rgba = np.concatenate(
                    [img, np.full((32, 32, 1), 255, np.uint8)], -1
                )
                vd = tmp_path / "data" / sub / exp / f"view_{str(v).zfill(5)}"
                vd.mkdir(parents=True)
                Image.fromarray(rgba, "RGBA").save(vd / "rgba_colorcalib.png")

    # subject 001: two expressions -> multi-image views (valid for "same")
    # subject 002: ONE expression -> every view dir has a single image;
    #   sampling it for a same-identity pair used to raise ValueError
    write_subject("001", ["01", "02"], range(3))
    write_subject("002", ["01"], range(3))

    net = LandmarkNet()
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    weights = tmp_path / "net.msgpack"
    save_params(str(weights), params)

    out = tmp_path / "cal.json"
    cal_main([
        "--data_dir", str(tmp_path / "data"),
        "--embedder", "landmark",
        "--weights", str(weights),
        "--image_size", "32",
        "--pairs", "8",
        "--pairing", "same_view",
        "--seed", "3",
        "--out", str(out),
    ])
    assert json.loads(out.read_text())["n_pairs"] == 8

    # no subject has a multi-image view -> clean SystemExit, not ValueError
    only_single = tmp_path / "single"
    for sub in ["001", "002"]:
        for v in range(2):
            vd = only_single / sub / "01" / f"view_{str(v).zfill(5)}"
            vd.mkdir(parents=True)
            Image.fromarray(
                np.zeros((32, 32, 4), np.uint8), "RGBA"
            ).save(vd / "rgba_colorcalib.png")
    with pytest.raises(SystemExit, match="same_view"):
        cal_main([
            "--data_dir", str(only_single),
            "--embedder", "landmark",
            "--weights", str(weights),
            "--image_size", "32",
            "--pairs", "4",
            "--pairing", "same_view",
            "--out", str(tmp_path / "cal2.json"),
        ])
