"""Microbench: why is the flagship UNet conv only ~48 TFLOP/s, and what
formulation fixes it?

int8_bench measured the (B=32, 32, 32, 320) 3x3 conv at 47.8 TFLOP/s bf16
(24% of v5e peak) while the same chip runs an 8192^3 matmul at 148 TFLOP/s
(75%). The conv's HBM floor is ~0.05 ms vs 1.26 ms measured, so it is
MXU-underutilized, not bandwidth-bound. This measures the candidate
formulations at every UNet level shape to find the ceiling:

  a. direct NHWC conv (what the model runs today)
  b. the same contraction as ONE raw matmul on pre-formed patches
     (M=B*H*W, K=9C, N=C) — the im2col upper bound, ignoring patch cost
  c. 1x1-conv-shaped matmul (M=B*H*W, K=C, N=C) x9 — the shifted-matmul
     decomposition's compute time
  d. direct conv with batch folded into height (B*H, W) — bigger spatial
     tiles for XLA's conv tiler (timing-only: wraps rows at the seam)

Timing per PERF.md's axon pitfalls (chained in-graph iterations, scalar
fetch). Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/conv_variants_bench.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

ITERS = 30

# (B, H, W, C): the four UNet levels at the flagship config (CFG batch 32)
LEVELS = [
    (32, 32, 32, 320),
    (32, 16, 16, 640),
    (32, 8, 8, 1280),
    (32, 4, 4, 1280),
]


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


@jax.jit
def chain_conv(x, w):
    def body(i, h):
        return conv(h, w) * jnp.bfloat16(0.05)
    return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()


@jax.jit
def chain_mm(a, b):
    def body(i, h):
        return (h @ b) * jnp.bfloat16(0.05)
    return jax.lax.fori_loop(0, ITERS, body, a).astype(jnp.float32).sum()


@jax.jit
def chain_mm_rect(a, b):
    """K != N: chain through a scalar carry to stay data-dependent."""
    def body(i, c):
        y = (a + c.astype(jnp.bfloat16)) @ b
        return y.astype(jnp.float32).mean() * 1e-6
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


def run(fn, args, flops, label):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {label}: {dt * 1e3:.3f} ms, {flops / dt / 1e12:.1f} TFLOP/s "
          f"(compile {compile_s:.0f}s)")
    return dt


def main():
    print(f"backend: {jax.default_backend()}")
    for (B, H, W, C) in LEVELS:
        print(f"level ({B},{H},{W},{C}):")
        key = jax.random.key(0)
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.02
        fl = 2 * B * H * W * 9 * C * C
        run(chain_conv, (x, w), fl, "a. direct conv      ")

        M = B * H * W
        patches = jax.random.normal(key, (M, 9 * C), jnp.bfloat16)
        wmat = jax.random.normal(jax.random.key(2), (9 * C, C), jnp.bfloat16) * 0.02
        run(chain_mm_rect, (patches, wmat), fl, "b. im2col matmul UB ")

        a1 = jax.random.normal(key, (M, C), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.key(3), (C, C), jnp.bfloat16) * 0.02
        t1 = run(chain_mm, (a1, w1), 2 * M * C * C, "c. 1x1 matmul (x1/9)")
        print(f"     -> 9x shifted-matmul compute: {t1 * 9 * 1e3:.3f} ms, "
              f"{fl / (t1 * 9) / 1e12:.1f} TFLOP/s")

        xf = x.reshape(1, B * H, W, C)
        run(chain_conv, (xf, w), fl, "d. batch-folded conv")


if __name__ == "__main__":
    main()
