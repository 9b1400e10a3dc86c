"""Fused depth-wise attention (Pallas TPU kernel).

The paper's 3D-aware attention (reference ldm/models/diffusion/attention.py
:26-47) attends over ONLY the frustum depth axis: for every output pixel
(h, w) and head n, `sim[d] = <q[h,w,n,:], k[d,h,w,n,:]> * scale`, softmax
over d (D=48), then a depth-weighted sum of v. Done with plain XLA ops this
materializes several (B, D, H, W, C)-sized temporaries per block — f32
similarity products, layout transposes for the contraction — which the
profiler shows dominating the UNet's runtime (~800 MB of relayout copies per
step at width 32 alone).

The Pallas kernel streams k/v ONCE in their natural channels-minor layout
and keeps every temporary in VMEM. Per grid cell (b, h): load q (W, C) and
k/v (D, W, C); the per-head dot product over head_dim lanes is an MXU matmul
against a constant (C, heads) segment matrix; softmax over D runs on
sublanes in fp32; the depth-weighted sum broadcasts the attention back to
lanes with the transposed segment matrix. No HBM temporaries at all.

Training uses a custom VJP whose backward recomputes through the jnp
reference implementation (inference is the speed-of-light path; the
training step is dominated by the backward UNet convs anyway).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu import fails on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _reference(q, k, v, num_heads: int):
    """Plain-XLA reference: q (B, H, W, C); k, v (B, D, H, W, C) -> (B, H, W, C)."""
    B, H, W, C = q.shape
    D = k.shape[1]
    hd = C // num_heads
    scale = hd**-0.5
    qh = q.reshape(B, H, W, num_heads, hd)
    kh = k.reshape(B, D, H, W, num_heads, hd)
    vh = v.reshape(B, D, H, W, num_heads, hd)
    sim = jnp.einsum("bhwnc,bdhwnc->bdhwn", qh, kh,
                     preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(sim, axis=1).astype(v.dtype)
    out = jnp.einsum("bdhwn,bdhwnc->bhwnc", attn, vh)
    return out.reshape(B, H, W, C)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float):
    q = q_ref[0, 0]          # (W, C)
    k = k_ref[0, :, 0]       # (D, W, C)
    v = v_ref[0, :, 0]
    D, W, C = k.shape
    hd = C // num_heads

    # (C, heads) block-diagonal segment matrix: lane c belongs to head c//hd
    lane = lax.broadcasted_iota(jnp.int32, (C, num_heads), 0)
    head = lax.broadcasted_iota(jnp.int32, (C, num_heads), 1)
    seg = (lane // hd == head).astype(q.dtype)

    p = q[None, :, :] * k                                    # (D, W, C)
    sim = jnp.dot(p.reshape(D * W, C), seg,
                  preferred_element_type=jnp.float32)        # (D*W, heads)
    sim = sim.reshape(D, W, num_heads) * scale
    m = jnp.max(sim, axis=0, keepdims=True)
    e = jnp.exp(sim - m)
    attn = e / jnp.sum(e, axis=0, keepdims=True)             # (D, W, heads) f32

    attn_l = jnp.dot(
        attn.reshape(D * W, num_heads).astype(v.dtype), seg.T,
        preferred_element_type=jnp.float32,
    ).reshape(D, W, C)                                       # broadcast to lanes
    out = jnp.sum(attn_l * v.astype(jnp.float32), axis=0)    # (W, C)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pallas_forward(q, k, v, num_heads: int):
    B, H, W, C = q.shape
    D = k.shape[1]
    hd = C // num_heads
    kernel = functools.partial(_kernel, num_heads=num_heads, scale=hd**-0.5)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, W, C), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, D, 1, W, C), lambda b, h: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, D, 1, W, C), lambda b, h: (b, 0, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, W, C), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), q.dtype),
    )(q, k, v)


def _use_pallas(q, k) -> bool:
    if pltpu is None:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    C = q.shape[-1]
    W = q.shape[-2]
    # W=4 blocks lose to XLA: the per-head segment matmul degenerates to
    # N=4 columns on a 128-wide MXU tile. Measured crossover at W=8.
    return C % 128 == 0 and W >= 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def depth_attention(q, k, v, num_heads: int):
    """Fused depth-axis attention. q: (B, H, W, C); k, v: (B, D, H, W, C).

    Uses the Pallas TPU kernel when shapes tile cleanly (C % 128 == 0),
    otherwise the XLA reference path (CPU tests, tiny configs).
    """
    if _use_pallas(q, k):
        return _pallas_forward(q, k, v, num_heads)
    return _reference(q, k, v, num_heads)


def _fwd(q, k, v, num_heads):
    return depth_attention(q, k, v, num_heads), (q, k, v)


def _bwd(num_heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, num_heads), q, k, v)
    return vjp(g)


depth_attention.defvjp(_fwd, _bwd)
