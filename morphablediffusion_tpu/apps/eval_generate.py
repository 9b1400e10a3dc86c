"""Eval stage 2: generate all test views for FaceScape (nvs / nes modes).

Parity target: eval/generate_all_facescape.py — per (subject, expression):
read the stage-1 JSON, pad target views up to a multiple of 16 (:107-108),
batch the 16-view groups through the sampler sharing one input image + mesh,
and save a horizontal strip named `{subject}_{exp}.png` whose i-th 256-px
tile is target view i (deduplicated after padding).

Modes: 'nvs' (same expression input, all 20 expressions) / 'nes' (input from
a different random expression, heldout expression 06 only) (:77-81,109-114).

  python -m morphablediffusion_tpu.apps.eval_generate --data_dir <root> \
      --mode nes --ckpt <run>/ckpt --output_dir eval_out [--views_json ...]
"""

from __future__ import annotations

import argparse
import json
import math
import random
from pathlib import Path

import numpy as np


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--mode", type=str, required=True, choices=["nvs", "nes"])
    parser.add_argument("--cfg", type=str, default="configs/facescape.yaml")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./eval_output")
    parser.add_argument("--views_json", type=str,
                        default="./eval/facescape_input_target_views.json")
    parser.add_argument("--cfg_scale", type=float, default=2.0)
    parser.add_argument("--seed", type=int, default=6033)
    parser.add_argument("--sample_steps", type=int, default=50)
    parser.add_argument("--eta", type=float, default=1.0,
                        help="DDIM eta (reference uses 1.0; 0 = deterministic)")
    parser.add_argument("--batch_view_num", type=int, default=0,
                        help="0 = all views in one batch; >0 chunks the "
                        "sampler's view axis (memory knob)")
    parser.add_argument("--limit", type=int, default=0,
                        help="stop after N (subject, expression) pairs (smoke)")
    parser.add_argument("--nes_exp", type=str, nargs="*", default=["06"],
                        help="expressions to synthesize in nes mode (the "
                        "reference hardcodes the heldout expression '06', "
                        "generate_all_facescape.py:79; override for datasets "
                        "with a different heldout layout)")
    parser.add_argument("--w8a8", action="store_true",
                        help="serve the UNet's internal convs in W8A8 int8 "
                             "(ops/int8.py) — the int8 quality gate runs the "
                             "eval harness under this flag")
    flags = parser.parse_args(argv)

    import jax
    from PIL import Image

    from morphablediffusion_tpu.apps.eval_select_views import TEST_SUBJECTS
    from morphablediffusion_tpu.apps.generate_face import load_params, to_uint8
    from morphablediffusion_tpu.data.facescape import FaceScapeDataset
    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.utils.config import load_config

    cfg = load_config(flags.cfg)
    if flags.w8a8:
        cfg.model.unet.w8a8 = True
    if str(flags.ckpt).endswith((".ckpt", ".pt", ".pth")):
        # checkpoints with trained spconv weights select the fine-grid
        # conditioner (see generate_face.autoselect_fine_conditioner); the
        # grid stays at the config's dataset-max extent — meshes vary per
        # (subject, expression) and the jit graph must be shared
        from morphablediffusion_tpu.apps.generate_face import (
            autoselect_fine_conditioner,
        )
        from morphablediffusion_tpu.utils.torch_import import load_torch_state_dict

        _params_cache["sd"] = load_torch_state_dict(flags.ckpt)
        autoselect_fine_conditioner(cfg.model, _params_cache["sd"])
    model = MorphableDiffusion(cfg.model)
    N = cfg.model.view_num
    rng = random.Random(flags.seed)

    metadata = json.loads(Path(flags.views_json).read_text())
    exps = (list(flags.nes_exp) if flags.mode == "nes"
            else [str(i).zfill(2) for i in range(1, 21)])

    # dataset object reused for its loading/transform helpers
    ds = FaceScapeDataset(
        flags.data_dir, uids=[], image_size=cfg.model.image_size,
        num_views=N, max_vertices=cfg.model.max_vertices,
        mesh_topology=cfg.data.mesh_topology, shuffled_expression=False,
        **(
            {"flame_assets_dir": cfg.data.flame_assets_dir}
            if cfg.data.flame_assets_dir else {}
        ),
    )

    out = Path(flags.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    params = None
    sampler = SyncDDIMSampler(model, sample_steps=flags.sample_steps,
                              batch_view_num=flags.batch_view_num,
                              eta=flags.eta)
    fn = jax.jit(lambda p, b, r: sampler.sample(p, b, r, flags.cfg_scale)[0])

    done = 0
    # iterate the stage-1 JSON's subjects (== TEST_SUBJECTS for reference
    # data; --subjects overrides there flow through here automatically)
    for subject in sorted(metadata, key=lambda s: TEST_SUBJECTS.index(s)
                          if s in TEST_SUBJECTS else len(TEST_SUBJECTS)):
        for exp in exps:
            d = Path(flags.data_dir) / subject / exp
            meta = metadata.get(subject.zfill(3), metadata.get(subject, {})).get(exp, {})
            if not meta or not d.exists():
                continue
            camera_dict = json.loads((d / "cameras.json").read_text())
            targets = list(meta["target_views"])
            n_groups = math.ceil(len(targets) / N)
            padded = targets + targets[: n_groups * N - len(targets)]

            submeta = metadata.get(subject.zfill(3), metadata.get(subject, {}))
            if flags.mode == "nes":
                # reference draws from range(1, 21) (generate_all_facescape
                # .py:110); restrict to expressions stage 1 actually found so
                # sparse datasets (e.g. the synthetic 2-expression layout)
                # don't KeyError on a never-rendered input expression
                cands = sorted(e for e in submeta if e != exp and submeta[e])
                if not cands:
                    raise SystemExit(
                        f"nes mode: no alternate input expression for "
                        f"{subject}/{exp} (stage 1 found only this expression;"
                        f" pass --nes_exp or rerun stage 1 with more)"
                    )
                input_exp = rng.choice(cands)
            else:
                input_exp = exp
            input_meta = submeta[input_exp]
            input_dir = Path(flags.data_dir) / subject / input_exp
            input_cams = json.loads((input_dir / "cameras.json").read_text())
            input_img = ds._load_view(input_dir, input_meta["input_view"])

            from morphablediffusion_tpu.data.common import pad_vertices

            verts = ds._vertices(subject, exp)
            vpad, vmask = pad_vertices(verts, cfg.model.max_vertices)

            groups = [padded[i * N : (i + 1) * N] for i in range(n_groups)]
            batch = {
                "input_image": np.repeat(input_img[None], n_groups, 0),
                "input_elevation": np.zeros((n_groups, 1), np.float32),
                "input_azimuth": np.zeros((n_groups, 1), np.float32),
                "target_elevation": np.zeros((n_groups, N), np.float32),
                "target_azimuth": np.zeros((n_groups, N), np.float32),
                "vertices": np.repeat(vpad[None], n_groups, 0),
                "vertex_mask": np.repeat(vmask[None], n_groups, 0),
            }
            Ks, RTs = [], []
            for g in groups:
                gk, gr = [], []
                for v in g:
                    K, RT = ds._camera(camera_dict, v)
                    gk.append(K)
                    gr.append(RT)
                Ks.append(np.stack(gk))
                RTs.append(np.stack(gr))
            batch["target_K"] = np.stack(Ks).astype(np.float32)
            batch["target_RT"] = np.stack(RTs).astype(np.float32)

            images = np.asarray(
                fn(
                    _ensure_params(model, batch, flags.ckpt, locals()),
                    {k: jax.numpy.asarray(v) for k, v in batch.items()},
                    jax.random.key(flags.seed),
                )
            )  # (n_groups, N, H, W, 3)
            flat = images.reshape(-1, *images.shape[2:])[: len(targets)]
            strip = np.concatenate([to_uint8(im) for im in flat], axis=1)
            Image.fromarray(strip).save(out / f"{subject}_{exp}.png")
            print(f"wrote {subject}_{exp}.png ({len(targets)} views)")
            done += 1
            if flags.limit and done >= flags.limit:
                return


_params_cache = {}


def _ensure_params(model, batch, ckpt, _):
    if "p" not in _params_cache:
        from morphablediffusion_tpu.apps.generate_face import load_params

        one = {k: np.asarray(v[:1]) for k, v in batch.items()}
        _params_cache["p"] = load_params(model, one, ckpt,
                                         state_dict=_params_cache.pop("sd", None))
    return _params_cache["p"]


if __name__ == "__main__":
    main()
