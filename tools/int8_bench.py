"""Microbench: int8 MXU throughput vs bf16 for the UNet's hot conv shapes.

PERF.md's per-step budget says the UNet conv+GN fusions are ~40 ms of the
~72 ms step and MXU-compute-bound (~68% of bf16 peak; the C=320 lane edge
is inherent). The only way to cut a compute-bound cost without changing the
model is a faster number format: TPU v5e's MXU runs int8 at 2x the bf16
rate (394 vs 197 TOPS peak). This measures whether that rate is reachable
from XLA (jax.lax.dot_general / conv_general_dilated with s8 operands and
preferred_element_type=int32) before any quantized-serving work is built
on it:

  1. 8192^3 matmul, bf16 vs int8 — sanity vs PERF.md's 143 TFLOP/s bf16
     figure, and the headline int8/bf16 ratio.
  2. 3x3 conv at the flagship UNet shape (B=32 CFG batch, 32x32, 320ch),
     bf16 vs int8 — whether XLA lowers int8 convs to the fast path or
     silently upcasts.

Timing follows PERF.md's axon pitfalls: chained data-dependent iterations
inside ONE jit graph, synchronized by fetching one in-graph scalar.

Run on the TPU (serialize with other device jobs):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/int8_bench.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

ITERS = 30


def _requant(y32):
    """int32 accumulator -> int8, cheap shift-based rescale to keep the
    chained iterations doing real arithmetic at stable magnitudes."""
    return jnp.clip(y32 >> 12, -127, 127).astype(jnp.int8)


@jax.jit
def mm_bf16(a, b):
    def body(i, h):
        return (h @ b) * jnp.bfloat16(2 ** -6)
    return jax.lax.fori_loop(0, ITERS, body, a).astype(jnp.float32).sum()


@jax.jit
def mm_int8(a, b):
    def body(i, h):
        y = jax.lax.dot_general(
            h, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return _requant(y)
    return jax.lax.fori_loop(0, ITERS, body, a).astype(jnp.float32).sum()


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


@jax.jit
def convchain_bf16(x, w):
    def body(i, h):
        return conv_bf16(h, w) * jnp.bfloat16(0.05)
    return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()


@jax.jit
def convchain_int8(x, w):
    def body(i, h):
        return _requant(conv_int8(h, w))
    return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()


def run(fn, args, flops_per_iter, label):
    t0 = time.perf_counter()
    float(fn(*args))  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(fn(*args))  # scalar fetch = true sync
    dt = (time.perf_counter() - t0) / ITERS
    tput = flops_per_iter / dt / 1e12
    print(f"{label}: {dt * 1e3:.3f} ms/iter, {tput:.1f} T(FL)OP/s "
          f"(compile {compile_s:.1f}s, checksum {s:.3g})")
    return dt


def main():
    key = jax.random.key(0)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- 1. matmul headline ratio ---
    n = 8192
    a16 = jax.random.normal(key, (n, n), jnp.bfloat16)
    b16 = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16) * 0.05
    fl = 2 * n * n * n
    t_b = run(mm_bf16, (a16, b16), fl, f"matmul {n}^3 bf16")
    a8 = jnp.clip(a16 * 32, -127, 127).astype(jnp.int8)
    b8 = jnp.clip(b16 * 640, -127, 127).astype(jnp.int8)
    t_i = run(mm_int8, (a8, b8), fl, f"matmul {n}^3 int8")
    print(f"matmul int8/bf16 speedup: {t_b / t_i:.2f}x")

    # --- 2. flagship UNet conv shape ---
    B, H, W, C = 32, 32, 32, 320
    x16 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    w16 = jax.random.normal(jax.random.key(2), (3, 3, C, C), jnp.bfloat16) * 0.02
    fl = 2 * B * H * W * 9 * C * C
    t_b = run(convchain_bf16, (x16, w16), fl, f"conv3x3 ({B},{H},{W},{C}) bf16")
    x8 = jnp.clip(x16 * 32, -127, 127).astype(jnp.int8)
    w8 = jnp.clip(w16 * 1600, -127, 127).astype(jnp.int8)
    t_i = run(convchain_int8, (x8, w8), fl, f"conv3x3 ({B},{H},{W},{C}) int8")
    print(f"conv int8/bf16 speedup: {t_b / t_i:.2f}x")


if __name__ == "__main__":
    main()
