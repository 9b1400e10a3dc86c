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
Numerical identity of the packing is asserted exactly (max abs diff 0.0).

MEASURED NEGATIVE (TPU v5e, 2026-08-19 — see PERF.md): packed loses at
both stages — stage1 3.179 vs 4.165 ms/conv (1.31x worse), stage2 0.918
vs 1.606 ms/conv (1.75x worse). XLA already folds the 27*64 taps*channels
into the matmul contracting dim — full MXU tiles regardless of C=64 — and
feature_group_count splits that into two half-size matmuls it tiles worse.
Kept as the reproducible record; do not adopt.

Timing follows PERF.md's axon pitfalls: many chained iterations inside ONE
jit graph (amortizes the ~30 ms dispatch latency, defeats the relay's
identical-args result cache) and synchronization by fetching one in-graph
scalar (`block_until_ready` can return before remote execution completes).

Run on the TPU (serialize with other device jobs):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/lanepack_bench.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def conv3d(x, w, groups=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


@partial(jax.jit, static_argnums=(2,))
def chain_stride1(x, w, groups):
    """ITERS chained stride-1 convs; 0.12 scale keeps bf16 magnitudes
    stable so every iteration does real arithmetic."""
    def body(i, h):
        return conv3d(h, w, groups) * jnp.bfloat16(0.12)
    return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()


@partial(jax.jit, static_argnums=(2,))
def chain_stride2(x, w, groups):
    """Stride-2 changes shape, so chain through a scalar carry that
    perturbs the input — iterations stay data-dependent."""
    def body(i, c):
        y = conv3d(x + c.astype(jnp.bfloat16), w, groups, stride=2)
        return y.astype(jnp.float32).mean() * 1e-6
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


def run(fn, x, w, groups, label):
    float(fn(x, w, groups))  # compile + warm
    t0 = time.perf_counter()
    s = float(fn(x, w, groups))  # scalar fetch = true sync
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {dt * 1e3:.3f} ms/conv (checksum {s:.3g})")
    return dt


def main():
    key = jax.random.key(0)
    B, D, H, W = 16, 48, 32, 32
    x64 = jax.random.normal(key, (B, D, H, W, 64), jnp.bfloat16)
    w64 = jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16) * 0.05
    # packed: pairs of views in channels; grouped conv = same math
    x128 = x64.reshape(B // 2, 2, D, H, W, 64).transpose(0, 2, 3, 4, 1, 5) \
              .reshape(B // 2, D, H, W, 128)
    w128 = jnp.concatenate([w64, w64], axis=-1)

    # exact numerical identity of the packing
    o_base = np.asarray(conv3d(x64, w64), np.float32)
    o_pack = np.asarray(conv3d(x128, w128, groups=2), np.float32)
    o_pack = o_pack.reshape(B // 2, D, H, W, 2, 64).transpose(0, 4, 1, 2, 3, 5) \
                   .reshape(B, D, H, W, 64)
    diff = np.abs(o_base - o_pack).max()
    print(f"packing identity: max abs diff {diff}")
    assert diff == 0.0

    t1b = run(chain_stride1, x64, w64, 1, "stage1 base   (16,...,64ch)     ")
    t1p = run(chain_stride1, x128, w128, 2, "stage1 packed (8,...,128ch) grp2")
    print(f"stage1 packed/base: {t1p / t1b:.2f}x")

    w2 = jax.random.normal(key, (3, 3, 3, 64, 128), jnp.bfloat16) * 0.05
    w2p = jnp.concatenate([w2, w2], axis=-1)
    t2b = run(chain_stride2, x64, w2, 1, "stage2 base   64->128 stride2   ")
    t2p = run(chain_stride2, x128, w2p, 2, "stage2 packed grouped 256out    ")
    print(f"stage2 packed/base: {t2p / t2b:.2f}x")


if __name__ == "__main__":
    main()
