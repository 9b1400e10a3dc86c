#!/usr/bin/env python
"""Headline benchmark: one 16-view 50-step DDIM avatar, end-to-end on device.

Prints ONE JSON line:
  {"metric": "e2e_16view_50step_ddim_s", "value": <seconds>, "unit": "s",
   "vs_baseline": <target_seconds / value>}

Baseline: the reference publishes no timings (BASELINE.md); the driver's
north-star target is < 5 s for the full avatar on TPU v5e. vs_baseline > 1
means faster than the target.

The whole pipeline (CLIP + VAE encode, 50 x [volume build + frustum
conditioning + CFG UNet on all 16 views], VAE decode) executes as jitted
device graphs with real (imported or seeded-random) weights.

Budget discipline (round-4 postmortem: BENCH_r04 timed out at rc=124 while
importing a 1522-tensor torch checkpoint and compiling a cold int8 graph):
  * the persistent XLA compile cache (.jax_cache/, pre-seeded at the end of
    every build round) makes the driver's compile a near-instant cache hit;
  * imported flagship params are cached NATIVELY (Orbax, serving dtypes)
    next to the torch ckpt, so re-runs skip the torch import entirely;
  * every expensive stage checks a wall-clock budget (BENCH_BUDGET_S,
    default 480 s) first and degrades gracefully (no params in time ->
    seeded random initializer-family values; tight on time -> fewer
    timed runs) — the JSON line always prints.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

TARGET_S = 5.0
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(f"# [{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr)


def _enable_compile_cache():
    """Persistent XLA compile cache, same dir as __graft_entry__ uses."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _seeded_random_params(abstract):
    """Initializer-family random values (fan-in-scaled kernels, unit norm
    scales, zero biases) — realistic magnitudes, no torch needed."""
    import jax
    import jax.numpy as jnp

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

    return jax.jit(lambda: jax.tree_util.tree_map_with_path(
        init_leaf, abstract))()


def _load_real_params(cfg, abstract, cfg_path):
    """Real weights, cheapest source first. Returns (params, source) where
    params are already in SERVING dtypes (bf16 matmul/conv, fp32 norms) and
    on device; source names what happened for the log."""
    import jax
    from morphablediffusion_tpu.utils.checkpoint import cast_params_for_serving

    serving_abstract = jax.eval_shape(cast_params_for_serving, abstract)

    # 1. native cache (Orbax, serving dtypes) — seconds, no torch
    native = os.environ.get("BENCH_NATIVE_CACHE", "/tmp/mdtpu_flagship_params")
    if not cfg_path and os.path.isdir(native):
        try:
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                # restore as host numpy (no sharding metadata needed), then
                # one device_put of the whole tree
                params = ckptr.restore(
                    native,
                    args=ocp.args.PyTreeRestore(
                        restore_args=jax.tree.map(
                            lambda s: ocp.ArrayRestoreArgs(
                                restore_type=np.ndarray, dtype=s.dtype),
                            serving_abstract,
                        )
                    ),
                )
            return jax.device_put(params), f"native cache {native}"
        except Exception as e:
            _log(f"native cache unusable ({e!r}); falling through")

    # 2. torch checkpoint import (expensive: ~2-4 min) — only with time left
    ckpt = os.environ.get("BENCH_CKPT", "/tmp/mdtpu_flagship.ckpt")
    if not os.path.exists(ckpt) and not os.environ.get("BENCH_CKPT"):
        legacy = "/tmp/flagship.ckpt"  # round-3 cache location
        if os.path.exists(legacy):
            ckpt = legacy
    if not cfg_path and _remaining() > 240:
        try:
            if not os.path.exists(ckpt):
                if _remaining() < 420:
                    raise RuntimeError("no time to build the torch ckpt")
                import subprocess

                _log(f"building flagship ckpt -> {ckpt}")
                subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tools", "make_flagship_ckpt.py"),
                     "--out", ckpt],
                    check=True, timeout=max(60, _remaining() - 240),
                )
            from morphablediffusion_tpu.utils.torch_import import (
                import_torch_checkpoint,
            )

            like = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)
            params = import_torch_checkpoint(ckpt, cfg.model, like=like)
            params = cast_params_for_serving(params)
            try:  # populate the native cache for next time
                import orbax.checkpoint as ocp

                with ocp.PyTreeCheckpointer() as ckptr:
                    ckptr.save(native, args=ocp.args.PyTreeSave(params),
                               force=True)
                _log(f"native param cache written -> {native}")
            except Exception as e:
                _log(f"native cache write failed ({e!r}); continuing")
            return jax.device_put(params), f"torch import {ckpt}"
        except Exception as e:
            _log(f"ckpt import unavailable ({e!r}); falling back")

    # 3. seeded random fallback — never zeros, never hangs
    params = cast_params_for_serving(_seeded_random_params(abstract))
    return params, "seeded random initializer-family params"


def main():
    _enable_compile_cache()
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
    # quality-gated: (a) golden 3-step CFG-denoise trajectory vs the
    # reference modules < 5% rel L2 (tests/test_golden_denoise.py), (b) full
    # eval harness matches bf16 within noise, (c) full-trajectory bf16-vs-int8
    # comparison at flagship width (PERF.md). Param tree unchanged — the same
    # checkpoint import applies. BENCH_W8A8=0 opts back into bf16 convs.
    if os.environ.get("BENCH_W8A8", "1") != "0":
        cfg.model.unet.w8a8 = True
        _log("W8A8 int8 UNet serving enabled (BENCH_W8A8=0 for bf16)")
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
    abstract = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), full_rngs, batch_t
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(abstract))
    _log(f"params: {n_params/1e6:.1f}M")

    if os.environ.get("BENCH_REAL_WEIGHTS", "1") != "0":
        params, source = _load_real_params(cfg, abstract, cfg_path)
        _log(f"weights: {source}")
    else:
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), abstract)
        _log("WARNING: params are ZEROS (FLOPs-identical, but value-dependent"
             " numerics untested in this mode)")
    if os.environ.get("BENCH_F32_PARAMS") == "1":
        params = jax.tree.map(
            lambda s, p: jnp.asarray(p, s.dtype), abstract, params)

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

    _log(f"warmup compile/run starting ({_remaining():.0f}s left in budget)")
    checksum = run(jax.random.key(1))
    _log("warmup done")

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    if _remaining() < 60:  # tight: one timed run still beats no number
        runs = min(runs, 1)
        _log("budget tight after warmup; reducing to 1 timed run")
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        checksum = run(jax.random.key(2 + i))
        times.append(time.perf_counter() - t0)
    _log(f"runs: {[round(t, 3) for t in times]}")
    if checksum is not None:
        _log(f"image checksum: {checksum} (finite={np.isfinite(checksum)})")
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
