#!/usr/bin/env python
"""AOT memory analysis of the train step and the sampling step.

Compiles the jitted graphs ahead-of-time for the current backend and prints
XLA's memory analysis (argument/output/temp/generated-code bytes) — the
tool for checking a recipe fits HBM before launching it (e.g. the reference
batch-70-per-chip recipe, README.md:35) and for sizing remat/batch trade-offs.

Usage:
  python tools/memory_report.py [--batch 70] [--views 16] [--tiny]
  JAX_PLATFORMS=cpu python tools/memory_report.py --tiny   # host-side check
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def fmt(n):
    return f"{n / 2**30:8.2f} GiB" if n >= 2**28 else f"{n / 2**20:8.1f} MiB"


def report(name, compiled):
    m = compiled.memory_analysis()
    if m is None:
        print(f"{name}: no memory analysis available on this backend")
        return
    rows = [
        ("arguments", getattr(m, "argument_size_in_bytes", 0)),
        ("outputs", getattr(m, "output_size_in_bytes", 0)),
        ("temps", getattr(m, "temp_size_in_bytes", 0)),
        ("aliased", -getattr(m, "alias_size_in_bytes", 0)),
        ("code", getattr(m, "generated_code_size_in_bytes", 0)),
    ]
    total = sum(v for _, v in rows)
    print(f"\n== {name} ==")
    for k, v in rows:
        print(f"  {k:<10} {fmt(abs(v))}{' (saved by donation)' if v < 0 else ''}")
    print(f"  {'total':<10} {fmt(total)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="train batch per chip (default: config batch_size)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--tiny", action="store_true", help="tiny shapes (fast)")
    ap.add_argument("--no_train", action="store_true")
    ap.add_argument("--no_sample", action="store_true")
    args = ap.parse_args()

    import jax

    from tiny import tiny_batch, tiny_config

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.parallel.mesh import create_mesh, shard_batch
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.training.trainer import Trainer
    from morphablediffusion_tpu.utils.config import Config

    if args.tiny:
        cfg = tiny_config(view_num=min(args.views, 4))
    else:
        cfg = Config()
        cfg.model.view_num = args.views
    if args.batch:
        cfg.data.batch_size = args.batch

    # full-size synthetic batch with the flagship geometry
    t = tiny_config(view_num=cfg.model.view_num)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    t.model.projection = cfg.model.projection
    batch = tiny_batch(t, B=max(cfg.data.batch_size, 1) if not args.tiny else 1)

    if not args.no_train:
        mesh = create_mesh()
        trainer = Trainer(cfg, mesh=mesh)
        sbatch = shard_batch(batch, mesh)
        state = trainer.init_state(sbatch)
        lowered = jax.jit(
            trainer._train_step, donate_argnums=(0,)
        ).lower(state, sbatch)
        report(
            f"train step (B={batch['input_image'].shape[0]}, "
            f"N={cfg.model.view_num}, remat={cfg.model.unet.use_checkpoint})",
            lowered.compile(),
        )

    if not args.no_sample:
        model = MorphableDiffusion(cfg.model)
        b1 = tiny_batch(t, B=1, with_targets=False)
        names = ["params", "time", "noise", "view", "vae", "drop"]
        rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
        import jax.numpy as jnp

        init_b = {
            **b1,
            "target_image": jnp.zeros(
                (1, cfg.model.view_num, cfg.model.image_size, cfg.model.image_size, 3)
            ),
        }
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda r, b: model.init(r, b, method="init_fn"),
                           rngs, init_b),
        )
        sampler = SyncDDIMSampler(model, sample_steps=cfg.model.sample_steps)
        lowered = jax.jit(
            lambda p, b, r: sampler.sample(p, b, r, 2.0)
        ).lower(params, b1, jax.random.key(0))
        report(
            f"sampling ({cfg.model.sample_steps} steps, N={cfg.model.view_num})",
            lowered.compile(),
        )


if __name__ == "__main__":
    main()
