"""Eval stage 3: 68-keypoint prediction on GT and generated views.

Parity target: eval/predict_keypoints.py(.sh) — the reference shells out to
mmdet (YOLOX face detector) + mmpose (HRNetV2 68-kpt top-down) and writes a
kpts JSON per image set. Those CUDA model zoos are host-side binary deps the
TPU framework intentionally does not vendor; this CLI keeps the same
artifact contract and supports two backends:

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


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--backend", type=str, default="precomputed",
                        choices=["command", "precomputed"])
    parser.add_argument("--command", type=str, default="",
                        help="shell command; {image_dir} and {output} are "
                             "substituted")
    parser.add_argument("--precomputed", type=str, default="")
    flags = parser.parse_args(argv)

    out = Path(flags.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    if flags.backend == "command":
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
