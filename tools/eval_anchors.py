"""Trivial-baseline anchors for the eval harness (SSIM/PSNR floor/sanity).

The from-scratch quality proof (EVAL.md §5) grades generated views against
two trivial predictors under EXACTLY the harness's protocol (white-composite
load, generated/predicted image masked by the GT alpha — reference
eval_2d_facescape.py:95):

  * copy-input — predict every target view with the (masked) INPUT view:
    the "is the model using the camera/mesh conditioning at all" anchor;
  * noise — uniform random pixels: the floor.

Round 4 computed these with an ad-hoc session script; this tool makes the
anchors reproducible for any dataset layout + stage-1 views.json.

  python tools/eval_anchors.py --data_dir /tmp/synth_scratch2/data \
      --views_json /tmp/synth_scratch2/eval/views.json --image_size 128
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--views_json", required=True)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from morphablediffusion_tpu.data.common import load_mask, load_rgba_white
    from morphablediffusion_tpu.eval import metrics as M

    meta = json.loads(Path(args.views_json).read_text())
    rng = np.random.default_rng(args.seed)
    S = args.image_size

    def load(subject, exp, view):
        p = (Path(args.data_dir) / subject / exp
             / f"view_{int(view):05d}" / "rgba_colorcalib.png")
        img = (load_rgba_white(p, S) + 1) / 2
        return img, load_mask(p, S)

    rows = {"copy_input": {"ssim": [], "psnr": []},
            "noise": {"ssim": [], "psnr": []}}
    per_pair = []
    n = n_identity = 0
    for subject in meta:
        for exp, m in meta[subject].items():
            inp, _ = load(subject, exp, m["input_view"])
            for v in m["target_views"]:
                n += 1
                if int(v) == int(m["input_view"]):
                    # copy-input is EXACT on the input view itself (infinite
                    # PSNR) — degenerate for an anchor; excluded and counted.
                    # Compare the model on the same non-identity subset.
                    n_identity += 1
                    continue
                gt, mask = load(subject, exp, v)
                for name, pred in (
                    ("copy_input", inp),
                    ("noise", rng.uniform(size=gt.shape).astype(np.float32)),
                ):
                    pm = M.masked(pred, mask)  # protocol: mask by GT alpha
                    rows[name]["ssim"].append(M.ssim(pm, gt))
                    rows[name]["psnr"].append(M.psnr(pm, gt))
                per_pair.append(f"{subject}/{exp}/{int(v):05d}")
    result = {
        "pairs_total": n,
        "pairs_scored": n - n_identity,
        "identity_pairs_excluded": n_identity,
        **{name: {k: float(np.mean(vals)) for k, vals in d.items()}
           for name, d in rows.items()},
        "scored_pairs": per_pair,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
