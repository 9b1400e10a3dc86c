"""In-tree FLAME mesh fitting CLI — generate_face.sh stages 1+2 with zero
external checkouts.

Reference parity: /root/reference/generate_face.sh runs the vendored MICA
(`third_party/MICA/demo.py`, identity codes from the input photo) and
metrical-tracker (`tracker.py`, FLAME expression/pose fit to the expression
photo), producing `mesh/00001.ply` for generate_face.py. This CLI produces
the same artifact from the same two photos using the repo's own stack:

  landmarks   — the native 68-landmark net (eval/keypoint_net.py weights
                via --kpt_weights), a precomputed .npy/.json
                (--input_landmarks/--exp_landmarks), or the optional
                `face_alignment` package if imported successfully.
  fitting     — fitting/fit.py staged jitted optimization (identity from
                the input photo, expression/pose from the expression photo,
                recombined like the reference's identity retarget).
  FLAME data  — the user-downloaded FLAME2020 pkl + landmark embedding
                (download_data.sh), the only external files required.

Usage:
  python -m morphablediffusion_tpu.apps.fit_face \
      --input_img demo/input.png --exp_img demo/exp.jpg \
      --flame assets/FLAME2020/generic_model.pkl \
      --lmk_embedding assets/landmark_embedding.npy \
      --out output/fitted_mesh.ply
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load_image(path: str):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _detect(img: np.ndarray, precomputed: str, kpt_weights: str,
            kpt_size: int = 128) -> np.ndarray:
    """(H, W, 3) [0,1] -> (68, 2) pixel coords, trying backends in order:
    precomputed file, face_alignment (if installed), native landmark net."""
    if precomputed:
        p = Path(precomputed)
        if p.suffix == ".json":
            data = json.loads(p.read_text())
            arr = np.asarray(next(iter(data.values())) if isinstance(data, dict)
                             else data, np.float32)
        else:
            arr = np.load(p).astype(np.float32)
        return arr.reshape(68, 2)
    try:  # optional external detector, if the host env has it
        import face_alignment  # type: ignore

        fa = face_alignment.FaceAlignment(
            face_alignment.LandmarksType.TWO_D, device="cpu"
        )
        preds = fa.get_landmarks((img * 255).astype(np.uint8))
        if preds:
            return np.asarray(preds[0][:, :2], np.float32)
    except ImportError:
        pass
    if not kpt_weights:
        raise SystemExit(
            "no landmark source: pass --input_landmarks/--exp_landmarks, "
            "install face_alignment, or train the native net "
            "(apps/train_keypoints.py) and pass --kpt_weights"
        )
    from PIL import Image

    from morphablediffusion_tpu.eval.keypoint_net import detect, load_params

    size = kpt_size  # run the net at its TRAINING resolution (shipped
    net, params = load_params(kpt_weights, size)  # nets train at 128 px)
    im = Image.fromarray((img * 255).astype(np.uint8)).resize(
        (size, size), Image.BILINEAR
    )
    kpts = detect(net, params, np.asarray(im, np.float32)[None] / 255.0)[0]
    scale = np.asarray([img.shape[1], img.shape[0]], np.float32) / size
    return kpts * scale


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_img", type=str, required=True,
                        help="identity photo")
    parser.add_argument("--exp_img", type=str, default="",
                        help="expression photo (defaults to input_img)")
    parser.add_argument("--flame", type=str, required=True,
                        help="FLAME2020 generic_model.pkl")
    parser.add_argument("--lmk_embedding", type=str, required=True,
                        help="landmark_embedding.npy")
    parser.add_argument("--out", type=str, required=True,
                        help="output fitted mesh .ply")
    parser.add_argument("--kpt_weights", type=str, default="",
                        help="native landmark-net weights")
    parser.add_argument("--kpt_size", type=int, default=128,
                        help="inference resolution for the native landmark "
                             "net — use the resolution it was trained at "
                             "(shipped artifacts/landmark_net_*.msgpack: 128)")
    parser.add_argument("--input_landmarks", type=str, default="",
                        help="precomputed (68,2) .npy/.json for input_img")
    parser.add_argument("--exp_landmarks", type=str, default="")
    parser.add_argument("--steps", type=int, default=40,
                        help="Levenberg-Marquardt iterations per stage")
    parser.add_argument("--n_shape", type=int, default=100)
    parser.add_argument("--n_exp", type=int, default=50)
    parser.add_argument("--focal", type=float, default=0.0,
                        help="fitting focal length in px (default: 1.2*max(H,W))")
    parser.add_argument("--silhouette", action="store_true",
                        help="add the silhouette LM stage: matte each photo "
                             "with the native backend (preprocessing/"
                             "matting.py) and couple the fit to the matte "
                             "contour (fitting/silhouette.py). Default off — "
                             "on synthetic ground truth the stage is 2D-"
                             "informative but does not improve 3D vertex "
                             "RMS (measured, docs/FITTING.md); intended for "
                             "real-FLAME deployment")
    parser.add_argument("--overlay", type=str, default="",
                        help="write a PNG of the input photo with the "
                             "DETECTED landmarks (green) and the fitted "
                             "mesh's reprojected landmarks (red) — the "
                             "visual QA artifact for real photos")
    flags = parser.parse_args(argv)

    from morphablediffusion_tpu.fitting import FitConfig, fit_two_photos, load_model
    from morphablediffusion_tpu.utils.mesh_io import save_ply

    img_in = _load_image(flags.input_img)
    img_exp = _load_image(flags.exp_img or flags.input_img)
    lmk_in = _detect(img_in, flags.input_landmarks, flags.kpt_weights,
                     flags.kpt_size)
    lmk_exp = _detect(img_exp, flags.exp_landmarks, flags.kpt_weights,
                      flags.kpt_size)

    model = load_model(flags.flame, flags.lmk_embedding,
                       n_shape=flags.n_shape, n_exp=flags.n_exp)
    H, W = img_exp.shape[:2]
    f = flags.focal or 1.2 * max(H, W)
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    mask_in = mask_exp = None
    if flags.silhouette:
        from morphablediffusion_tpu.preprocessing.matting import matte

        def _mask(img):
            rgba = matte((np.clip(img, 0, 1) * 255).astype(np.uint8),
                         backend="native")
            return rgba[..., 3] > 127

        mask_in, mask_exp = _mask(img_in), _mask(img_exp)
    verts, info = fit_two_photos(
        model, lmk_in, lmk_exp, K, FitConfig(steps_per_stage=flags.steps),
        mask_input=mask_in, mask_exp=mask_exp,
    )
    out = Path(flags.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_ply(out, verts, np.asarray(model.faces))
    for k, v in info.items():
        print(f"  {k}: {v:.5f}", file=sys.stderr)
    print(f"fitted mesh -> {out} ({len(verts)} verts)")

    if flags.overlay:
        import jax.numpy as jnp
        from PIL import Image

        from morphablediffusion_tpu.fitting import fit_landmarks
        from morphablediffusion_tpu.fitting.flame import (
            flame_forward,
            flame_landmarks,
            project_points,
        )

        p_in, info_in = fit_landmarks(
            model, lmk_in, K, FitConfig(steps_per_stage=flags.steps)
        )
        v_in = flame_forward(model, jnp.asarray(p_in["shape"]),
                             jnp.asarray(p_in["exp"]), jnp.asarray(p_in["pose"]))
        uv = np.asarray(project_points(
            flame_landmarks(model, v_in, jnp.asarray(p_in["pose"])),
            jnp.asarray(p_in["cam_r"]), jnp.asarray(p_in["cam_t"]),
            jnp.asarray(K),
        ))
        canvas = (img_in * 255).astype(np.uint8).copy()

        def dot(x, y, color, r=2):
            xs = slice(max(int(x) - r, 0), int(x) + r + 1)
            ys = slice(max(int(y) - r, 0), int(y) + r + 1)
            canvas[ys, xs] = color

        for x, y in lmk_in:
            dot(x, y, (0, 255, 0))          # detected: green
        for x, y in uv:
            dot(x, y, (255, 0, 0), r=1)     # fitted reprojection: red
        Path(flags.overlay).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(canvas).save(flags.overlay)
        print(f"overlay (input fit px err "
              f"{info_in['mean_px_err']:.2f}) -> {flags.overlay}")


if __name__ == "__main__":
    main()
