"""Slope-timed microbench: removes the relay's per-call dispatch constant.

The chained-in-graph method still pays ONE host->device dispatch +
scalar-fetch round trip per jit call (~25-30 ms on the axon relay). At
ITERS=30 that adds ~0.9 ms/iter of bias — enough to swamp sub-ms ops
(tools/conv_variants_bench.py's tiny-matmul "floor"). Fix: run the SAME
chain at two iteration counts and divide the time DIFFERENCE by the
iteration difference — the dispatch constant cancels exactly.

  per_iter = (T(n_hi) - T(n_lo)) / (n_hi - n_lo)

Run on the TPU:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/slope_bench.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

N_LO, N_HI = 30, 150


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


@partial(jax.jit, static_argnums=(2,))
def chain_conv(x, w, n):
    def body(i, h):
        return conv(h, w) * jnp.bfloat16(0.05)
    return jax.lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()


@partial(jax.jit, static_argnums=(2,))
def chain_conv_int8(x, w, n):
    def body(i, h):
        y = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jnp.clip(y >> 12, -127, 127).astype(jnp.int8)
    return jax.lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()


@partial(jax.jit, static_argnums=(2,))
def chain_mm(a, b, n):
    def body(i, h):
        return (h @ b) * jnp.bfloat16(0.05)
    return jax.lax.fori_loop(0, n, body, a).astype(jnp.float32).sum()


def slope(fn, args, flops, label):
    t = {}
    for n in (N_LO, N_HI):
        float(fn(*args, n))  # compile + warm
        t0 = time.perf_counter()
        float(fn(*args, n))
        t[n] = time.perf_counter() - t0
    per = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    base = t[N_LO] - per * N_LO  # implied per-call constant
    print(f"  {label}: {per * 1e3:.4f} ms/iter, {flops / per / 1e12:.1f} "
          f"T(FL)OP/s (dispatch const {base * 1e3:.1f} ms)")
    return per


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.key(0)

    n = 8192
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16) * 0.05
    slope(chain_mm, (a, b), 2 * n**3, "matmul 8192^3 bf16      ")

    for (B, H, W, C) in [(32, 32, 32, 320), (32, 16, 16, 640),
                         (32, 8, 8, 1280), (32, 4, 4, 1280)]:
        x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(2), (3, 3, C, C), jnp.bfloat16) * 0.02
        fl = 2 * B * H * W * 9 * C * C
        tb = slope(chain_conv, (x, w), fl, f"conv ({B},{H},{W},{C}) bf16")
        x8 = jnp.clip(x * 32, -127, 127).astype(jnp.int8)
        w8 = jnp.clip(w * 1600, -127, 127).astype(jnp.int8)
        ti = slope(chain_conv_int8, (x8, w8), fl, f"conv ({B},{H},{W},{C}) int8")
        print(f"     int8/bf16: {tb / ti:.2f}x")

    M, C = 32768, 320
    a1 = jax.random.normal(key, (M, C), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.key(3), (C, C), jnp.bfloat16) * 0.02
    slope(chain_mm, (a1, w1), 2 * M * C * C, "matmul (32768,320)x(320,320)")


if __name__ == "__main__":
    main()
