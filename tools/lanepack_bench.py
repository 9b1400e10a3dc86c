"""Microbench: 128-lane view-packing of the C=64 conditioning subsystem.

PERF.md names "packing the C=64 conditioning subsystem to full 128-lane
tiles" as one of two remaining routes to <= 3.4 s. The cheapest
semantics-preserving form: FrustumTV3DNet processes 16 INDEPENDENT per-view
frustum tensors (16, 48, 32, 32, 64ch) — fold pairs of views into channels,
(8, 48, 32, 32, 128ch), and run every conv with ``feature_group_count=2``
(two independent 64->64 convs per call, bit-identical math, full 128-lane
tiles instead of half-wasted 64-channel ones).

This measures that head-to-head at the real model shapes — the stride-1
64ch and stride-2 64->128 stages that dominate FrustumTV3DNet
(models/conditioner.py, reference ldm/models/diffusion/network.py:313-347).
Numerical identity of the packing is asserted exactly (verified on CPU:
max abs diff 0.0).

MEASURED NEGATIVE (TPU v5e, 2026-08-19 — see PERF.md): packed loses at
both stages (0.131 vs 0.032 ms stage1; 2.071 vs 1.511 ms stage2). XLA
already folds the 27*64 taps*channels into the matmul contracting dim —
full MXU tiles regardless of C=64 — and feature_group_count splits that
into two half-size matmuls it tiles worse. Kept as the reproducible
record; do not adopt.

Run on the TPU (serialize with other device jobs):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/lanepack_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=30):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def conv3d(x, w, groups=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    key = jax.random.key(0)
    B, D, H, W = 16, 48, 32, 32
    x64 = jax.random.normal(key, (B, D, H, W, 64), jnp.bfloat16)
    w64 = jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16) * 0.05
    # packed: pairs of views in channels; grouped conv = same math
    x128 = x64.reshape(B // 2, 2, D, H, W, 64).transpose(0, 2, 3, 4, 1, 5) \
              .reshape(B // 2, D, H, W, 128)
    w128 = jnp.concatenate([w64, w64], axis=-1)

    f_base = jax.jit(lambda x, w: conv3d(x, w))
    f_pack = jax.jit(lambda x, w: conv3d(x, w, groups=2))
    t_base = timeit(f_base, x64, w64)
    t_pack = timeit(f_pack, x128, w128)
    print(f"stage1 64ch  (16,48,32,32, 64) conv3d        : {t_base:.3f} ms")
    print(f"stage1 packed(8, 48,32,32,128) grouped conv3d: {t_pack:.3f} ms")

    o_base = np.asarray(f_base(x64, w64), np.float32)
    o_pack = np.asarray(f_pack(x128, w128), np.float32)
    o_pack = o_pack.reshape(B // 2, D, H, W, 2, 64).transpose(0, 4, 1, 2, 3, 5) \
                   .reshape(B, D, H, W, 64)
    print("max abs diff:", np.abs(o_base - o_pack).max())

    # stage 2: the net's 64 -> 128 stride-2 down conv
    w2 = jax.random.normal(key, (3, 3, 3, 64, 128), jnp.bfloat16) * 0.05
    w2p = jnp.concatenate([w2, w2], axis=-1)
    f2_base = jax.jit(lambda x, w: conv3d(x, w, stride=2))
    f2_pack = jax.jit(lambda x, w: conv3d(x, w, groups=2, stride=2))
    print(f"stage2 64->128 stride2 base  : {timeit(f2_base, x64, w2):.3f} ms")
    print(f"stage2 packed grouped 256out : {timeit(f2_pack, x128, w2p):.3f} ms")


if __name__ == "__main__":
    main()
