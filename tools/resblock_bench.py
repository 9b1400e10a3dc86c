"""Microbench: the conv+stats "mega-fusion" headroom study.

PERF.md names "conv+stats mega-fusion kernels" as the last route to
<= 3.4 s: one Pallas kernel per ResBlock streaming GN -> silu -> conv ->
GN(+temb) -> silu -> conv with intermediates in VMEM. Before building that
(a handwritten TPU conv competing with XLA's), this measures its ceiling:

  1. one raw 3x3 conv at the flagship UNet shape (B=32 CFG batch, 32x32,
     C=320) — the MXU floor a fused kernel cannot beat;
  2. the full ResBlock chain as the model runs it (ops/group_norm fused
     GN+silu, shifted GN for the temb add, zero-init conv, skip add) —
     what XLA's fusions already achieve.

Headroom = (2) - 2 x (1) - skip-conv time. If that is small relative to
the ~40 ms/step UNet budget, the mega-fusion lever is DEAD: the budget is
MXU-compute-bound and only a faster number format (see int8_bench.py) can
cut it.

Timing per PERF.md's axon pitfalls: chained data-dependent iterations in
ONE jit graph, synchronized by one in-graph scalar fetch.

Run on the TPU (serialize with other device jobs):
  PYTHONPATH=/root/.axon_site:/root/repo python tools/resblock_bench.py
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from morphablediffusion_tpu.ops.group_norm import group_norm, group_norm_shifted

N_LO, N_HI = 30, 150
B, H, W, C = 32, 32, 32, 320


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


@partial(jax.jit, static_argnums=(6,))
def chain_resblock(x, w1, w2, gamma, beta, shift, n):
    """The ResBlock exactly as models/layers.py runs it (32 groups,
    silu fused into both norms, temb shift folded into the second)."""
    def body(i, h):
        r = group_norm(h, gamma, beta, 32, 1e-5, "silu")
        r = conv(r, w1)
        r = group_norm_shifted(r, shift, gamma, beta, 32, 1e-5, "silu")
        r = conv(r, w2)
        return (h + r) * jnp.bfloat16(0.5)
    return jax.lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()


def run(fn, args, label, flops_per_iter):
    """Slope timing (see tools/slope_bench.py): two iteration counts,
    difference quotient — the ~25-30 ms relay dispatch constant cancels."""
    t = {}
    for n in (N_LO, N_HI):
        float(fn(*args, n))  # compile + warm
        t0 = time.perf_counter()
        float(fn(*args, n))
        t[n] = time.perf_counter() - t0
    dt = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    print(f"{label}: {dt * 1e3:.3f} ms/iter, {flops_per_iter / dt / 1e12:.1f} "
          f"TFLOP/s")
    return dt


def main():
    key = jax.random.key(0)
    print(f"backend: {jax.default_backend()}")
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.key(2), (3, 3, C, C), jnp.bfloat16) * 0.02
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    shift = jax.random.normal(jax.random.key(3), (B, C), jnp.bfloat16)

    conv_fl = 2 * B * H * W * 9 * C * C
    t_conv = run(chain_conv, (x, w1), f"raw conv3x3 ({B},{H},{W},{C})", conv_fl)
    t_block = run(
        chain_resblock, (x, w1, w2, gamma, beta, shift),
        "full ResBlock (GN+silu -> conv -> GNshift+silu -> conv -> skip)",
        2 * conv_fl,
    )
    headroom = t_block - 2 * t_conv
    print(f"fusion overhead above 2x raw conv: {headroom * 1e3:.3f} ms/iter "
          f"({headroom / t_block * 100:.1f}% of the block)")
    # HBM floor for the non-conv traffic a mega-fusion would remove:
    # two GN stats reads + two normalized writes of (B,H,W,C) bf16
    bytes_gn = 4 * B * H * W * C * 2
    print(f"(GN traffic floor at 819 GB/s: {bytes_gn / 819e9 * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
