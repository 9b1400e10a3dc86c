"""Eval stage 3: 68-keypoint prediction on GT and generated views.

Parity target: eval/predict_keypoints.py(.sh) — the reference shells out to
mmdet (YOLOX face detector) + mmpose (HRNetV2 68-kpt top-down) and writes a
kpts JSON per image set. This CLI keeps the same artifact contract with
three backends:

  --backend native: run the in-repo landmark detector
      (eval/keypoint_net.py, trained with apps/train_keypoints.py) over
      every image in --image_dir — PCK fully standalone, no model zoo.
  --backend command: run an arbitrary user command per image directory that
      must produce the JSON (bring-your-own mmpose/face-alignment env).
  --backend precomputed: validate + pass through an existing kpts JSON.

Output JSON format: {image_name: [[x, y] * 68]} — consumed by eval_2d's
PCK@0.2 metric.
"""

from __future__ import annotations

import argparse
import json
import subprocess
from pathlib import Path

import numpy as np


def _native(image_dir: Path, weights: str, image_size: int):
    from PIL import Image

    from morphablediffusion_tpu.eval.keypoint_net import detect, load_params

    net, params = load_params(weights, image_size)
    keys, imgs, scales = [], [], []
    for p in sorted(image_dir.rglob("*.png")):
        key = str(p.relative_to(image_dir).with_suffix("")).replace("/", "_")
        im = Image.open(p).convert("RGB")
        scales.append(np.asarray(im.size, np.float32) / image_size)
        im = im.resize((image_size, image_size), Image.BILINEAR)
        keys.append(key)
        imgs.append(np.asarray(im, np.float32) / 255.0)
    if not keys:
        raise SystemExit(f"no .png images under {image_dir}")
    kpts = detect(net, params, np.stack(imgs))  # (N, 68, 2) at image_size
    # report in the original pixel grid of each image
    kpts = kpts * np.stack(scales)[:, None, :]
    return {k: kpts[i].tolist() for i, k in enumerate(keys)}


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--backend", type=str, default="native",
                        choices=["native", "command", "precomputed"])
    parser.add_argument("--weights", type=str, default="",
                        help="landmark net weights (train_keypoints --out)")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--command", type=str, default="",
                        help="shell command; {image_dir} and {output} are "
                             "substituted")
    parser.add_argument("--precomputed", type=str, default="")
    flags = parser.parse_args(argv)

    out = Path(flags.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    if flags.backend == "native":
        if not flags.weights:
            raise SystemExit("--backend native needs --weights "
                             "(see apps/train_keypoints.py)")
        data = _native(Path(flags.image_dir), flags.weights, flags.image_size)
        out.write_text(json.dumps(data))
    elif flags.backend == "command":
        cmd = flags.command.format(image_dir=flags.image_dir, output=flags.output)
        subprocess.run(cmd, shell=True, check=True)
    else:
        src = Path(flags.precomputed or flags.output)
        data = json.loads(src.read_text())
        for name, kpts in data.items():
            assert len(kpts) == 68, f"{name}: expected 68 keypoints"
        if src != out:
            out.write_text(json.dumps(data))
    kpts = json.loads(out.read_text())
    print(f"keypoints for {len(kpts)} images at {out}")


if __name__ == "__main__":
    main()
