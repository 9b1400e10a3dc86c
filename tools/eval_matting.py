"""Quantify the native matting backend against ground-truth alphas.

VERDICT r3 item 6: `preprocessing/matting.py`'s color-model backend (the
in-pipeline replacement for carvekit Tracer-B7, reference
generate_face.py:47-69) had no quantitative artifact. This tool measures it
on composites with KNOWN alpha: each RGBA image from a synthetic multi-view
dataset (tools/make_synthetic_facescape.py renders carry exact alphas) is
composited onto several background classes and the recovered alpha is scored
with IoU (alpha > 0.5) and MAE.

Background classes, easiest to hardest for a border-seeded color model:
  * uniform   — flat studio-like color (the pipeline's intended regime)
  * gradient  — smooth two-color ramp (multi-cluster border model)
  * clutter   — high-frequency colored blobs (documented failure regime:
                the foreground/background color models overlap)

  python tools/eval_matting.py --data_dir /tmp/synth_scratch/data \
      --out artifacts/matting_eval.json

Writes the JSON artifact summarized in EVAL.md.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image


def backgrounds(shape, rng):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    uniform = np.broadcast_to(
        rng.uniform(0.55, 0.95, 3).astype(np.float32), (H, W, 3))
    c0, c1 = rng.uniform(0.2, 1.0, (2, 3))
    t = (xx / W * 0.6 + yy / H * 0.4)[..., None]
    gradient = (c0 * (1 - t) + c1 * t).astype(np.float32)
    clutter = np.zeros((H, W, 3), np.float32) + 0.5
    for _ in range(12):
        cy, cx = rng.uniform(0, H), rng.uniform(0, W)
        r = rng.uniform(0.05, 0.25) * H
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        clutter[m] = rng.uniform(0, 1, 3)
    return {"uniform": uniform, "gradient": gradient, "clutter": clutter}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True,
                    help="dataset tree with RGBA pngs (GT alpha)")
    ap.add_argument("--out", default="artifacts/matting_eval.json")
    ap.add_argument("--samples", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from morphablediffusion_tpu.preprocessing.matting import matte

    paths = sorted(Path(args.data_dir).rglob("*.png"))
    if not paths:
        raise SystemExit(f"no pngs under {args.data_dir}")
    rng = np.random.default_rng(args.seed)
    picks = [paths[i] for i in
             rng.choice(len(paths), size=min(args.samples, len(paths)),
                        replace=False)]

    per_bg = {}
    for p in picks:
        rgba = np.asarray(Image.open(p)).astype(np.float32) / 255.0
        if rgba.shape[-1] != 4:
            continue
        fg, gt_alpha = rgba[..., :3], rgba[..., 3]
        for name, bg in backgrounds(gt_alpha.shape, rng).items():
            comp = fg * gt_alpha[..., None] + bg * (1 - gt_alpha[..., None])
            out = matte((comp * 255).astype(np.uint8), backend="native")
            alpha = out[..., 3].astype(np.float32) / 255.0
            mae = float(np.abs(alpha - gt_alpha).mean())
            a, g = alpha > 0.5, gt_alpha > 0.5
            iou = float((a & g).sum() / max((a | g).sum(), 1))
            per_bg.setdefault(name, []).append({"mae": mae, "iou": iou})
            print(f"{p.parent.parent.parent.name}/{p.parent.name} {name}: "
                  f"IoU {iou:.3f} MAE {mae:.3f}", flush=True)

    summary = {
        bg: {
            "iou_mean": float(np.mean([r["iou"] for r in rows])),
            "iou_min": float(np.min([r["iou"] for r in rows])),
            "mae_mean": float(np.mean([r["mae"] for r in rows])),
            "n": len(rows),
        }
        for bg, rows in per_bg.items()
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"summary": summary, "per_image": per_bg,
         "data_dir": args.data_dir, "samples": args.samples}, indent=1))
    for bg, s in summary.items():
        print(f"{bg:9s}: IoU {s['iou_mean']:.3f} (min {s['iou_min']:.3f}) "
              f"MAE {s['mae_mean']:.3f} over {s['n']}")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
