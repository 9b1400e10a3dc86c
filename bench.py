#!/usr/bin/env python
"""Headline benchmark: one 16-view 50-step DDIM avatar, end-to-end on device.

Prints ONE JSON line:
  {"metric": "e2e_16view_50step_ddim_s", "value": <seconds>, "unit": "s",
   "vs_baseline": <target_seconds / value>}

Baseline: the reference publishes no timings (BASELINE.md); the driver's
north-star target is < 5 s for the full avatar on TPU v5e. vs_baseline > 1
means faster than the target.

The run uses the flagship architecture with randomly-initialized weights —
identical FLOPs/memory behavior to trained weights. The whole pipeline
(CLIP + VAE encode, 50 x [volume build + frustum conditioning + CFG UNet on
all 16 views], VAE decode) executes as jitted device graphs.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

TARGET_S = 5.0


def main():
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.utils.config import Config
    from tiny import tiny_batch, tiny_config

    # BENCH_CONFIG: optional YAML (e.g. configs/thuman.yaml) to bench the
    # body/orthographic path instead of the default facescape flagship
    cfg_path = os.environ.get("BENCH_CONFIG", "")
    if cfg_path:
        from morphablediffusion_tpu.utils.config import load_config

        cfg = load_config(cfg_path)
    else:
        cfg = Config()
    # W8A8 int8 UNet serving (ops/int8.py) is the DEFAULT serving config —
    # quality-gated in round 4: (a) golden 3-step CFG-denoise trajectory vs
    # the reference modules < 5% rel L2 (tests/test_golden_denoise.py),
    # (b) full eval harness on the trained from-scratch model matches bf16
    # within noise (PERF.md table). Param tree unchanged — the same
    # checkpoint import applies. BENCH_W8A8=0 opts back into bf16 convs.
    if os.environ.get("BENCH_W8A8", "1") != "0":
        cfg.model.unet.w8a8 = True
        print("# W8A8 int8 UNet serving enabled (BENCH_W8A8=0 for bf16)",
              file=sys.stderr)
    model = MorphableDiffusion(cfg.model)

    # flagship-shaped synthetic batch (B=1, 16 views, 256^2, FLAME- or
    # SMPL-X-sized mesh; orthographic Ks when the config says so)
    t = tiny_config(view_num=cfg.model.view_num,
                    projection=cfg.model.projection)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    batch = tiny_batch(t, B=1, with_targets=False)

    names = ["params", "time", "noise", "view", "vae", "drop"]
    full_rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    batch_t = dict(batch)
    batch_t["target_image"] = jnp.zeros(
        (1, cfg.model.view_num, cfg.model.image_size, cfg.model.image_size, 3)
    )
    # Shapes only — param VALUES don't change FLOPs/memory, so skip the huge
    # init graph and materialize zeros directly on device.
    abstract = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), full_rngs, batch_t
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(abstract))
    print(f"# params: {n_params/1e6:.1f}M", file=sys.stderr)

    # Real (non-zero) weights by DEFAULT, so the driver-recorded number is
    # value-dependent and self-validating (finite non-zero checksum):
    #   1. import BENCH_CKPT / the cached flagship-width torch .ckpt,
    #      auto-building it with tools/make_flagship_ckpt.py when absent;
    #   2. if torch or the builder is unavailable, fall back to SEEDED RANDOM
    #      initializer-family params (never zeros);
    #   3. BENCH_REAL_WEIGHTS=0 opts back into the zeros diagnostic run.
    if os.environ.get("BENCH_REAL_WEIGHTS", "1") != "0":
        ckpt = os.environ.get("BENCH_CKPT", "/tmp/mdtpu_flagship.ckpt")
        if not os.path.exists(ckpt) and not os.environ.get("BENCH_CKPT"):
            legacy = "/tmp/flagship.ckpt"  # round-3 cache location
            if os.path.exists(legacy):
                ckpt = legacy
        imported = False
        if not cfg_path:  # the builder emits the facescape flagship layout
            try:
                if not os.path.exists(ckpt):
                    import subprocess

                    print(f"# building flagship ckpt -> {ckpt}", file=sys.stderr)
                    subprocess.run(
                        [sys.executable,
                         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "tools", "make_flagship_ckpt.py"),
                         "--out", ckpt],
                        check=True, timeout=1800,
                    )
                from morphablediffusion_tpu.utils.torch_import import (
                    import_torch_checkpoint,
                )

                like = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
                params = import_torch_checkpoint(ckpt, cfg.model, like=like)
                params = jax.device_put(params)
                imported = True
                print(f"# real weights: imported {ckpt}", file=sys.stderr)
            except Exception as e:  # torch missing, build failed, ...
                print(f"# ckpt import unavailable ({e!r}); falling back to "
                      "seeded random params", file=sys.stderr)
        if not imported:
            # initializer-family random values (fan-in-scaled kernels, unit
            # norm scales, zero biases) — realistic magnitudes, no torch
            def init_leaf(path_key, s):
                name = str(path_key[-1].key) if path_key else ""
                seed = abs(hash(jax.tree_util.keystr(path_key))) % (2**31)
                if name in ("scale", "var"):
                    return jnp.ones(s.shape, s.dtype)
                if name in ("bias", "mean"):
                    return jnp.zeros(s.shape, s.dtype)
                fan_in = int(np.prod(s.shape[:-1])) if len(s.shape) >= 2 else 1
                std = (1.0 / max(fan_in, 1)) ** 0.5 if len(s.shape) >= 2 else 0.02
                return (std * jax.random.normal(
                    jax.random.key(seed), s.shape)).astype(s.dtype)

            params = jax.jit(lambda: jax.tree_util.tree_map_with_path(
                init_leaf, abstract))()
            print("# real weights: seeded random initializer-family params",
                  file=sys.stderr)
    else:
        print(
            "# WARNING: params are ZEROS (FLOPs-identical, but value-dependent"
            " numerics untested in this mode)",
            file=sys.stderr,
        )

    # serving configuration: bf16 matmul/conv weights (fp32 norm params)
    if os.environ.get("BENCH_F32_PARAMS") != "1":
        from morphablediffusion_tpu.utils.checkpoint import (
            cast_params_for_serving,
        )

        params = cast_params_for_serving(params)

    sampler = SyncDDIMSampler(model, sample_steps=cfg.model.sample_steps)

    @jax.jit
    def fn(p, b, r):
        images, _ = sampler.sample(p, b, r, cfg_scale=2.0)
        # in-graph checksum: timing fetches ONE scalar, not the image tensor
        # (pulling megabytes through the remote-TPU tunnel skews timing, and
        # block_until_ready alone can return before remote work finishes)
        return jnp.sum(images.astype(jnp.float32))

    if os.environ.get("BENCH_SYNC") == "block":
        def run(key):  # diagnostic only: may under-measure through the tunnel
            fn(params, batch, key).block_until_ready()
    else:
        def run(key):
            return float(fn(params, batch, key))

    checksum = run(jax.random.key(1))

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        checksum = run(jax.random.key(2 + i))
        times.append(time.perf_counter() - t0)
    print("# runs:", [round(t, 3) for t in times], file=sys.stderr)
    if checksum is not None:
        print(f"# image checksum: {checksum} (finite={np.isfinite(checksum)})",
              file=sys.stderr)
    value = min(times)

    name = "e2e_16view_50step_ddim_s"
    if cfg_path:
        import pathlib

        name += f"_{pathlib.Path(cfg_path).stem}"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(TARGET_S / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
