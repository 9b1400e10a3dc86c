#!/usr/bin/env python
"""Held-out evaluation of a native landmark net, with optional domain shift.

Measures PCK@0.2 / pixel error of a trained `eval/keypoint_net.py` net on a
held-out subject tree (GT = the 68 mesh landmarks projected per view, the
same label source `apps/train_keypoints.py --labels mesh:` trains on), in
two conditions:

  * plain  — the renders as stored (white/transparent background);
  * shifted — each render composited over a random background with the
    photometric jitter of `train_keypoints.augment_batch` (no geometric
    transform, so the GT labels are unchanged). This is the measurable
    half of the synthetic-to-photo gap on a zero-egress box: a net that
    collapses here cannot survive a real photo's background clutter, while
    robustness here is a necessary (not sufficient) transfer condition.

Reference parity: mmpose HRNetV2 (eval/predict_keypoints.py) is trained on
real annotated faces and is robust to photo nuisances by construction; this
tool quantifies how far a synthetic-trained replacement is from that bar.

  python tools/eval_landmark_net.py --weights net.msgpack \
      --image_dir /tmp/synthkp/test_data \
      --landmarks /tmp/synthkp/landmarks.json \
      --mesh "/tmp/synthkp/flame/{subject}/{exp}/mesh.obj" \
      --image_size 128 [--shifted] [--out eval.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--landmarks", required=True,
                    help="landmarks.json (68 mesh landmark specs)")
    ap.add_argument("--mesh", required=True,
                    help="mesh path template with {subject}/{exp}")
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--shifted", action="store_true",
                    help="composite random backgrounds + photometric jitter "
                         "(labels unchanged)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    flags = ap.parse_args(argv)

    from morphablediffusion_tpu.apps.train_keypoints import (
        _collect_images,
        _labels_from_mesh,
        _random_background,
    )
    from morphablediffusion_tpu.eval.keypoint_net import detect, load_params
    from morphablediffusion_tpu.eval.metrics import pck

    image_dir = Path(flags.image_dir)
    S = flags.image_size
    images = _collect_images(image_dir, S, with_alpha=True)
    labels = _labels_from_mesh(Path(flags.landmarks), image_dir,
                               Path(flags.mesh), S)
    keys = sorted(set(images) & set(labels))
    if not keys:
        raise SystemExit(f"no pairs: {len(images)} images, {len(labels)} labels")

    rng = np.random.default_rng(flags.seed)
    X = np.empty((len(keys), S, S, 3), np.float32)
    for i, k in enumerate(keys):
        fg, alpha = images[k][..., :3], images[k][..., 3:]
        if flags.shifted:
            img = fg * alpha + _random_background(S, S, rng) * (1 - alpha)
            img = img * rng.uniform(0.7, 1.3, 3) + rng.uniform(-0.1, 0.1, 3)
            X[i] = np.clip(img, 0, 1)
        else:
            X[i] = fg * alpha + (1 - alpha)  # white composite, as trained
    Y = np.stack([labels[k] for k in keys])

    net, params = load_params(flags.weights, S)
    pred = detect(net, params, X)

    err = np.linalg.norm(pred - Y, axis=-1)
    result = {
        "weights": flags.weights,
        "condition": "shifted" if flags.shifted else "plain",
        "n_views": len(keys),
        "pck_0.2": round(pck(pred, Y, 0.2), 4),
        "pck_0.5": round(pck(pred, Y, 0.5), 4),
        "mean_px": round(float(err.mean()), 3),
        "median_px": round(float(np.median(err)), 3),
        "image_size": S,
    }
    print(json.dumps(result, indent=1))
    if flags.out:
        Path(flags.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
