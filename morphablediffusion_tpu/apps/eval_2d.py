"""Eval stage 4: 2D quality metrics over generated FaceScape views.

Parity target: eval/eval_2d_facescape.py — per (subject, expression): load
the generated strip `{subject}_{exp}.png`, mask each generated view by the
GT alpha (:95), accumulate SSIM / LPIPS / FID / PCK@0.2 / Re-ID and print
the summary line (:139). PSNR is reported additionally.

All five reference metrics are computed in-repo:
  * SSIM / PSNR / PCK — native numpy (eval/metrics.py).
  * FID — Frechet distance over CLIP-tower features extracted with the
    model's own frozen CLIP encoder (`--ckpt`, weights present in every
    published morphable-diffusion checkpoint). The reference uses
    InceptionV3 features (torchmetrics); CLIP-FID is the framework-native
    backend — absolute values are not comparable across feature spaces, but
    it ranks models the same way. The default --fid_backend auto picks the
    reference-exact inception backend whenever torchmetrics is importable.
  * Re-ID — IR-SE50 ArcFace descriptors (eval/irse.py, weights via
    --reid_weights model_ir_se50.pth), Euclidean distance < --reid_threshold
    (0.6 default, matching the reference's dlib rule :97-108).
  * LPIPS — native VGG backend (eval/lpips_vgg.py) from the published
    torchvision vgg16 + lpips calibration weight files
    (--lpips_vgg vgg16-397923af.pth --lpips_lin vgg_lpips.pth); falls back
    to the external `lpips` package if importable, else null.

  python -m morphablediffusion_tpu.apps.eval_2d --data_dir <root> \
      --generated_dir eval_out --views_json eval/facescape_input_target_views.json \
      [--ckpt ckpt/facescape_flame.ckpt --cfg configs/facescape.yaml] \
      [--reid_weights model_ir_se50.pth] \
      [--pred_kpts kpts_gen.json --gt_kpts kpts_gt.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image

from morphablediffusion_tpu.eval import metrics as M


def _load_strip(path, size=256):
    img = np.asarray(Image.open(path)).astype(np.float32) / 255.0
    n = img.shape[1] // size
    return [img[:, i * size : (i + 1) * size, :3] for i in range(n)]


def _load_gt(view_dir, size=256):
    from morphablediffusion_tpu.data.common import load_mask, load_rgba_white

    img = (load_rgba_white(view_dir / "rgba_colorcalib.png", size) + 1) / 2
    mask = load_mask(view_dir / "rgba_colorcalib.png", size)
    return img, mask


def _load_clip_params(ckpt_path: str, cfg_path: str):
    """CLIP-tower params for FID features, from a model checkpoint.

    Torch `.ckpt`: map `clip_image_encoder.model.visual.*` keys onto a fresh
    CLIPImageEncoder tree. Orbax dir: restore and take the
    `clip_image_encoder` subtree.
    """
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.clip import CLIPImageEncoder
    from morphablediffusion_tpu.utils.config import Config, load_config

    cfg = load_config(cfg_path) if cfg_path else Config()
    c = cfg.model.clip
    enc = CLIPImageEncoder(width=c.width, layers=c.layers,
                           num_heads=c.num_heads, patch_size=c.patch_size,
                           output_dim=c.output_dim)
    size = cfg.model.image_size
    like = jax.eval_shape(
        lambda: enc.init(jax.random.key(0),
                         jnp.zeros((1, size, size, 3), jnp.float32))
    )
    like = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), like)
    if str(ckpt_path).endswith((".ckpt", ".pt", ".pth")):
        import torch

        from morphablediffusion_tpu.utils.torch_import import import_state_dict

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        wrapped = {"params": {"clip_image_encoder": like["params"]}}
        imported, report = import_state_dict(sd, wrapped, clip_layers=c.layers)
        print(f"clip tower: {report['filled']} tensors imported")
        return {"params": imported["params"]["clip_image_encoder"]}, c
    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.utils.checkpoint import CheckpointManager

    # orbax params export holds the full model tree: restore abstractly
    # (zeros batch, eval_shape — no compute) and take the clip subtree
    m = cfg.model
    model = MorphableDiffusion(m)
    z = jnp.zeros
    batch = {
        "input_image": z((1, size, size, 3)),
        "input_elevation": z((1, 1)),
        "input_azimuth": z((1, 1)),
        "target_elevation": z((1, m.view_num)),
        "target_azimuth": z((1, m.view_num)),
        "target_K": jnp.broadcast_to(jnp.eye(4), (1, m.view_num, 4, 4)),
        "target_RT": jnp.broadcast_to(
            jnp.eye(4)[:3], (1, m.view_num, 3, 4)
        ),
        "vertices": z((1, m.max_vertices, 3)),
        "vertex_mask": jnp.ones((1, m.max_vertices)),
        "target_image": z((1, m.view_num, size, size, 3)),
    }
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    abstract = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), rngs, batch
    )
    mgr = CheckpointManager(ckpt_path)
    params = mgr.restore_params(abstract)
    return {"params": params["params"]["clip_image_encoder"]}, c


def _clip_features(images, enc_params, clip_cfg, chunk=16):
    """(N, H, W, 3) [0,1] -> (N, D) CLIP embeddings, chunked jit."""
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.clip import CLIPImageEncoder

    c = clip_cfg
    enc = CLIPImageEncoder(width=c.width, layers=c.layers,
                           num_heads=c.num_heads, patch_size=c.patch_size,
                           output_dim=c.output_dim)
    fn = jax.jit(enc.apply)
    out = []
    arr = np.stack(images)
    for lo in range(0, len(arr), chunk):
        x = jnp.asarray(arr[lo : lo + chunk]) * 2.0 - 1.0
        out.append(np.asarray(fn(enc_params, x)))
    feats = np.concatenate(out)
    return feats.reshape(feats.shape[0], -1)


def _inception_fid(real, fake):
    """Reference-exact FID via torchmetrics InceptionV3, if importable."""
    import torch
    from torchmetrics.image.fid import FrechetInceptionDistance

    fid = FrechetInceptionDistance()
    to8 = lambda ims: torch.from_numpy(
        (np.stack(ims) * 255).astype(np.uint8)
    ).permute(0, 3, 1, 2)
    fid.update(to8(real), real=True)
    fid.update(to8(fake), real=False)
    return float(fid.compute().item())


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--generated_dir", type=str, required=True)
    parser.add_argument("--views_json", type=str,
                        default="./eval/facescape_input_target_views.json")
    parser.add_argument("--mode", type=str, default="nes", choices=["nvs", "nes"])
    parser.add_argument("--pred_kpts", type=str, default="")
    parser.add_argument("--gt_kpts", type=str, default="")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--ckpt", type=str, default="",
                        help="model checkpoint (torch .ckpt or orbax dir) "
                             "providing the CLIP tower for FID features")
    parser.add_argument("--cfg", type=str, default="",
                        help="model config yaml (CLIP dims for --ckpt)")
    parser.add_argument("--fid_backend", type=str, default="auto",
                        choices=["auto", "clip", "inception"],
                        help="inception: reference-exact (torchmetrics, "
                             "eval_2d_facescape.py:110-139); clip: "
                             "framework-native CLIP-FID; auto (default): "
                             "inception when torchmetrics imports, else clip")
    parser.add_argument("--reid_weights", type=str, default="",
                        help="IR-SE50 ArcFace weights (model_ir_se50.pth) "
                             "for the Re-ID rate")
    parser.add_argument("--reid_threshold", type=float, default=None,
                        help="Re-ID accept distance. REQUIRED with "
                             "--reid_weights: the reference's 0.6 is dlib's "
                             "calibrated threshold (eval_2d_facescape.py:"
                             "97-108) and is known-wrong for IR-SE50's "
                             "distance scale — run apps/calibrate_reid.py "
                             "on a multi-view tree with the same weights "
                             "and pass its EER threshold")
    parser.add_argument("--lpips_vgg", type=str, default="",
                        help="torchvision vgg16 weights "
                             "(vgg16-397923af.pth) for native LPIPS")
    parser.add_argument("--lpips_lin", type=str, default="",
                        help="lpips v0.1 vgg calibration weights "
                             "(vgg.pth) for native LPIPS")
    flags = parser.parse_args(argv)

    metadata = json.loads(Path(flags.views_json).read_text())
    gen_dir = Path(flags.generated_dir)

    if flags.lpips_vgg and flags.lpips_lin:
        from morphablediffusion_tpu.eval.lpips_vgg import load_lpips

        dist = load_lpips(flags.lpips_vgg, flags.lpips_lin)
        lpips_fn = lambda a, b: float(dist([a], [b])[0])
    else:
        try:
            import lpips as lpips_pkg
            import torch

            lpips_model = lpips_pkg.LPIPS(net="vgg")
            def lpips_fn(a, b):
                ta = torch.from_numpy((a * 2 - 1).transpose(2, 0, 1)[None]).float()
                tb = torch.from_numpy((b * 2 - 1).transpose(2, 0, 1)[None]).float()
                return float(lpips_model(ta, tb).item())
        except Exception:
            lpips_fn = None

    reid_fn = None
    if flags.reid_weights:
        if flags.reid_threshold is None:
            raise SystemExit(
                "--reid_weights needs an explicit --reid_threshold: the "
                "dlib default (0.6) does not transfer to IR-SE50's distance "
                "scale, so a silently-computed rate would be wrong. "
                "Calibrate one with\n"
                "  python -m morphablediffusion_tpu.apps.calibrate_reid "
                f"--data_dir <multi-view tree> --reid_weights "
                f"{flags.reid_weights} --pairing same_view --out cal.json\n"
                "and pass its printed EER threshold here.")
        import jax
        import jax.numpy as jnp
        import torch

        from morphablediffusion_tpu.eval.irse import (
            IRSE50,
            face_descriptors,
            import_irse_state_dict,
        )

        sd = torch.load(flags.reid_weights, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: np.asarray(v) for k, v in sd.items()}
        like = IRSE50().init(jax.random.key(0),
                             jnp.zeros((1, 112, 112, 3), jnp.float32))
        irse_params, report = import_irse_state_dict(sd, like)
        print(f"irse50: {report['filled']} tensors imported")
        reid_fn = lambda ims: face_descriptors(np.stack(ims), irse_params)

    ssims, psnrs, lpipss, reid_dists = [], [], [], []
    real_imgs, fake_imgs = [], []
    n_pairs = 0
    for strip_path in sorted(gen_dir.glob("*_*.png")):
        subject, exp = strip_path.stem.split("_")
        meta = metadata.get(subject.zfill(3), metadata.get(subject, {})).get(exp)
        if not meta:
            continue
        views = meta["target_views"]
        gen_views = _load_strip(strip_path, flags.image_size)
        for i, v in enumerate(views[: len(gen_views)]):
            gt_dir = (
                Path(flags.data_dir) / subject / exp / f"view_{str(v).zfill(5)}"
            )
            if not gt_dir.exists():
                continue
            gt, mask = _load_gt(gt_dir, flags.image_size)
            gen = M.masked(gen_views[i], mask)  # eval_2d_facescape.py:95
            ssims.append(M.ssim(gen, gt))
            psnrs.append(M.psnr(gen, gt))
            if lpips_fn:
                lpipss.append(lpips_fn(gen, gt))
            real_imgs.append(gt)
            fake_imgs.append(gen)
            if reid_fn is not None:
                d = reid_fn([gt, gen])
                reid_dists.append(float(np.linalg.norm(d[0] - d[1])))
            n_pairs += 1

    fid_backend = flags.fid_backend
    if fid_backend == "auto":
        # reference-exact Inception FID whenever torchmetrics is available
        # (eval_2d_facescape.py:110-139); CLIP-FID otherwise
        try:
            import torchmetrics  # noqa: F401

            fid_backend = "inception"
        except ImportError:
            fid_backend = "clip"

    fid_val = None
    if real_imgs and (flags.ckpt or fid_backend == "inception"):
        if fid_backend == "inception":
            fid_val = _inception_fid(real_imgs, fake_imgs)
        else:
            enc_params, clip_cfg = _load_clip_params(flags.ckpt, flags.cfg)
            real_f = _clip_features(real_imgs, enc_params, clip_cfg)
            fake_f = _clip_features(fake_imgs, enc_params, clip_cfg)
            fid_val = M.frechet_distance(real_f, fake_f)

    reid_val = (
        M.reid_rate(np.asarray(reid_dists), flags.reid_threshold)
        if reid_dists else None
    )

    pck_val = None
    if flags.pred_kpts and flags.gt_kpts:
        pred = json.loads(Path(flags.pred_kpts).read_text())
        gt = json.loads(Path(flags.gt_kpts).read_text())
        common = sorted(set(pred) & set(gt))
        pck_val = M.pck(
            np.asarray([pred[k] for k in common], np.float64),
            np.asarray([gt[k] for k in common], np.float64),
        )

    result = {
        "pairs": n_pairs,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "fid": fid_val,
        "pck@0.2": pck_val,
        "re_id": reid_val,
    }
    # self-describing nulls: say WHY a metric is absent, in the artifact
    # itself (committed JSONs otherwise carry silent nulls — EVAL.md has
    # the context but the file should stand alone)
    unavailable = {}
    if result["lpips"] is None:
        unavailable["lpips"] = (
            "no LPIPS backend: pass --lpips_vgg/--lpips_lin (vgg16 + lpips "
            "v0.1 calibration weights, non-redistributable; download_data.sh)"
            " or install the `lpips` package"
        )
    if result["re_id"] is None:
        unavailable["re_id"] = (
            "no Re-ID embedder: pass --reid_weights model_ir_se50.pth with a "
            "calibrated --reid_threshold (apps/calibrate_reid.py; EVAL.md §2)"
        )
    if result["fid"] is None:
        unavailable["fid"] = (
            "no FID backend: torchmetrics unavailable and no --ckpt for the "
            "CLIP fallback"
        )
    if unavailable:
        result["unavailable_backends"] = unavailable
    # reference printout shape (eval_2d_facescape.py:139)
    print(
        f"SSIM: {result['ssim']}, LPIPS: {result['lpips']}, "
        f"FID: {result['fid']}, PCK: {result['pck@0.2']}, "
        f"Re-ID: {result['re_id']}"
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
