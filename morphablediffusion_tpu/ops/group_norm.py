"""Fused GroupNorm (+ optional activation) Pallas TPU kernel.

GroupNorm dominates the non-matmul time of the denoising step (~19% in the
profiler): XLA computes the fp32 statistics in one pass over the activation
and normalizes in another, so every GN costs >= 2 HBM reads + 1 write, plus
convert fusions. This kernel does everything in one VMEM residency per
sample: the per-group sum/sum-of-squares reductions run as ONE MXU matmul
against a constant (C, G) segment matrix, the normalization + affine +
activation are applied in-register, and the activation is read exactly once.

Numerics: statistics and the normalization math in fp32 (matching flax
GroupNorm), output cast back to the input dtype. Backward = recompute via
the XLA reference (training is conv-backward dominated).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_ACTS = {
    None: lambda x: x,
    "silu": lambda x: x * jax.nn.sigmoid(x),
    "relu": lambda x: jnp.maximum(x, 0.0),
}


def _reference(x, gamma, beta, num_groups: int, epsilon: float, act):
    """Lane-aligned XLA formulation.

    Deliberately avoids (a) reshaping the lane dimension C into (G, C/G)
    — a full-tensor relayout on TPU — and (b) two-pass `jnp.var`: per-group
    sums of x and x^2 come from one fused pass as matmuls against a constant
    (C, G) segment matrix, and the group statistics are broadcast back to
    lanes with the transposed segment matrix. Measured 3.3 s faster per
    16-view avatar than the naive reshape/var version across the model's
    ~60 GroupNorm sites.
    """
    B = x.shape[0]
    C = x.shape[-1]
    cg = C // num_groups
    n = cg * int(np.prod(x.shape[1:-1]))

    lane = lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    grp = lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    seg = (lane // cg == grp).astype(jnp.float32)

    x2d = x.reshape(B, -1, C)
    xf = x2d.astype(jnp.float32)
    # Two-stage reduction: the spatial axis collapses on the VPU as a fused
    # fp32 reduce that reads the bf16 activation straight from HBM (no
    # materialized fp32 copy — a big einsum over xf forced ~27 ms/step of
    # convert passes), then the cross-lane group reduction is a tiny
    # (B, C) @ (C, G) matmul. HIGHEST precision on that matmul: the MXU's
    # default bf16-multiply rounding makes E[x^2] - E[x]^2 of a constant
    # input negative beyond epsilon -> NaN.
    colsum = jnp.sum(xf, axis=1)            # (B, C), one fused pass
    colsq = jnp.sum(xf * xf, axis=1)        # (B, C), fuses with the above
    hp = lax.Precision.HIGHEST
    s1 = jnp.dot(colsum, seg, precision=hp)  # (B, G)
    s2 = jnp.dot(colsq, seg, precision=hp)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = lax.rsqrt(var + epsilon)

    mean_l = (mean @ seg.T).reshape((B,) + (1,) * (x.ndim - 2) + (C,))
    inv_l = (inv @ seg.T).reshape((B,) + (1,) * (x.ndim - 2) + (C,))
    g = gamma.astype(jnp.float32)
    b = beta.astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean_l) * inv_l * g + b
    return _ACTS[act](y).astype(x.dtype)


def _kernel(x_ref, g_ref, b_ref, o_ref, *, num_groups, epsilon, act):
    x = x_ref[0]                      # (S, C) one sample, spatial flattened
    S, C = x.shape
    cg = C // num_groups

    lane = lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    grp = lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    seg = (lane // cg == grp).astype(jnp.float32)          # (C, G)

    xf = x.astype(jnp.float32)
    # reduce the spatial rows on the VPU first (one pass over x in VMEM),
    # THEN the cross-lane group reduction is a tiny (1, C) @ (C, G) matmul
    colsum = jnp.sum(xf, axis=0, keepdims=True)             # (1, C)
    colsum_sq = jnp.sum(xf * xf, axis=0, keepdims=True)     # (1, C)
    n = S * cg
    hp = lax.Precision.HIGHEST
    mean = jnp.dot(colsum, seg, preferred_element_type=jnp.float32,
                   precision=hp)[0] / n
    ex2 = jnp.dot(colsum_sq, seg, preferred_element_type=jnp.float32,
                  precision=hp)[0] / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)

    inv = lax.rsqrt(var + epsilon)                          # (G,)
    # broadcast group stats back to lanes via the transposed segment matrix
    mean_l = (seg @ mean.reshape(num_groups, 1)).reshape(1, C)
    inv_l = (seg @ inv.reshape(num_groups, 1)).reshape(1, C)

    gamma = g_ref[0].astype(jnp.float32).reshape(1, C)
    beta = b_ref[0].astype(jnp.float32).reshape(1, C)
    y = (xf - mean_l) * inv_l * gamma + beta
    y = _ACTS[act](y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_forward(x, gamma, beta, num_groups, epsilon, act):
    B = x.shape[0]
    C = x.shape[-1]
    S = 1
    for d in x.shape[1:-1]:
        S *= d
    x2 = x.reshape(B, S, C)
    g2 = gamma.reshape(1, C)
    b2 = beta.reshape(1, C)
    kernel = functools.partial(
        _kernel, num_groups=num_groups, epsilon=epsilon, act=act
    )
    y = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
    )(x2, g2, b2)
    return y.reshape(x.shape)


def _use_pallas(x, num_groups) -> bool:
    # OFF by default: measured end-to-end on v5e the kernel LOST to XLA
    # (8.65 s vs 5.88 s for the 16-view avatar) — grid=(B,) serializes per
    # sample and the (2S, C) @ (C, G=32) stats matmul wastes 3/4 of each
    # 128-lane MXU tile. Kept (MDTPU_PALLAS_GROUPNORM=1) as a baseline for
    # a future revision with batched grid + wider stats layout.
    import os

    if not os.environ.get("MDTPU_PALLAS_GROUPNORM"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    C = x.shape[-1]
    S = 1
    for d in x.shape[1:-1]:
        S *= d
    # one sample must fit comfortably in VMEM (bf16 in + fp32 temporaries)
    return C % 128 == 0 and (C // num_groups) >= 1 and S * C <= 2_000_000


def group_norm_shifted(x, shift, gamma, beta, num_groups: int = 32,
                       epsilon: float = 1e-5, act: str | None = None):
    """GroupNorm(x + shift[:, None, ..., :]) WITHOUT materializing x+shift.

    shift: (B, C) — the ResBlock's time-embedding projection. Adding a
    per-(sample, channel) constant shifts the statistics analytically:
    colsum' = colsum + S*t and colsq' = colsq + 2*t*colsum + S*t^2, so the
    stats still come from one fused pass over x (which XLA fuses into the
    producing conv), and the apply collapses to a per-(B, C) affine of x
    that fuses into the consumer — the materialized x+shift pass of the
    previous formulation disappears. Exact same f32 math up to
    reassociation (unit-tested against group_norm(x + shift))."""
    B = x.shape[0]
    C = x.shape[-1]
    cg = C // num_groups
    S = int(np.prod(x.shape[1:-1]))
    n = cg * S

    lane = lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    grp = lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    seg = (lane // cg == grp).astype(jnp.float32)

    xf = x.reshape(B, S, C).astype(jnp.float32)
    tf = shift.astype(jnp.float32)
    colsum = jnp.sum(xf, axis=1)
    colsq = jnp.sum(xf * xf, axis=1)
    colsum2 = colsum + S * tf
    colsq2 = colsq + 2.0 * tf * colsum + S * tf * tf
    hp = lax.Precision.HIGHEST
    mean = jnp.dot(colsum2, seg, precision=hp) / n
    var = jnp.maximum(jnp.dot(colsq2, seg, precision=hp) / n - mean * mean,
                      0.0)
    inv = lax.rsqrt(var + epsilon)

    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    mean_l = mean @ seg.T
    inv_l = inv @ seg.T
    A = inv_l * gamma.astype(jnp.float32)[None]          # (B, C)
    B2 = (tf - mean_l) * A + beta.astype(jnp.float32)[None]
    y = x.astype(jnp.float32) * A.reshape(bshape) + B2.reshape(bshape)
    return _ACTS[act](y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm(x, gamma, beta, num_groups: int = 32, epsilon: float = 1e-5,
               act: str | None = None):
    """Fused GroupNorm(+act). x: (B, ..., C); gamma/beta: (C,)."""
    if _use_pallas(x, num_groups):
        return _pallas_forward(x, gamma, beta, num_groups, epsilon, act)
    return _reference(x, gamma, beta, num_groups, epsilon, act)


def _fwd(x, gamma, beta, num_groups, epsilon, act):
    return group_norm(x, gamma, beta, num_groups, epsilon, act), (x, gamma, beta)


def _bwd(num_groups, epsilon, act, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, gamma, beta: _reference(x, gamma, beta, num_groups, epsilon, act),
        x, gamma, beta,
    )
    return vjp(g)


group_norm.defvjp(_fwd, _bwd)
