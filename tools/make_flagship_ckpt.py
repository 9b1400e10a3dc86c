"""Build a flagship-width reference-style torch .ckpt for real-weights runs.

The published morphable-diffusion checkpoints (download_data.sh) cannot be
fetched in this environment, so the real-weights device run (import path,
value-dependent numerics, bench) uses a checkpoint synthesized at the exact
flagship width with realistic magnitudes: every tensor follows its
initializer family (lecun-normal kernels scaled by fan-in, unit norm scales,
zero biases, BN running stats at (0, 1)), exported through
`utils.torch_import.export_state_dict` — the exact inverse of the importer —
into the reference's state_dict naming. Importing it back exercises every
mapped path a published checkpoint would.

  python tools/make_flagship_ckpt.py --out /tmp/flagship.ckpt [--fine]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def leaf_init(name: str, shape, rng) -> np.ndarray:
    if name in ("scale", "var"):
        return np.ones(shape, np.float32)
    if name in ("bias", "mean"):
        return np.zeros(shape, np.float32)
    if len(shape) >= 2:
        fan_in = int(np.prod(shape[:-1]))
        std = (1.0 / max(fan_in, 1)) ** 0.5
        return rng.normal(0.0, std, shape).astype(np.float32)
    return rng.normal(0.0, 0.02, shape).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fine", action="store_true",
                    help="include spconv (xyzc_net) tensors for the "
                         "fine-grid conditioner")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.utils import torch_import as ti
    from morphablediffusion_tpu.utils.config import Config

    sys.path.insert(0, "tests")
    from tiny import tiny_batch, tiny_config

    cfg = Config()
    if args.fine:
        cfg.model.mesh_voxel_mode = "fine"
    model = MorphableDiffusion(cfg.model)
    t = tiny_config(view_num=cfg.model.view_num)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    batch = tiny_batch(t, B=1)
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    abstract = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), rngs, batch
    )

    rng = np.random.default_rng(args.seed)
    flat, tree_def = jax.tree_util.tree_flatten_with_path(abstract)
    leaves = [
        leaf_init(str(getattr(path[-1], "key", path[-1])), s.shape, rng)
        for path, s in flat
    ]
    params = jax.tree_util.tree_unflatten(tree_def, leaves)
    n = sum(v.size for v in leaves)

    count = ti.export_torch_checkpoint(params, args.out, cfg.model)
    print(json.dumps({"out": args.out, "tensors": count,
                      "params_m": round(n / 1e6, 1), "fine": args.fine}))


if __name__ == "__main__":
    main()
