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


def _pallas_forward(q, k, v, num_heads: int, interpret: bool = False):
    B, H, W, C = q.shape
    D = k.shape[1]
    hd = C // num_heads
    if W < 8:
        # W=4 blocks (the UNet's middle level) would run the kernel on
        # 4-row tiles of a 128-wide MXU. Depth attention is per-pixel
        # independent, so fold the whole spatial map into the row axis
        # ((B, H, W, C) -> (B, 1, H*W, C)) and tile at H*W rows instead —
        # exact, and above the measured W>=8 crossover.
        out = _pallas_forward(
            q.reshape(B, 1, H * W, C),
            k.reshape(B, D, 1, H * W, C),
            v.reshape(B, D, 1, H * W, C),
            num_heads, interpret,
        )
        return out.reshape(B, H, W, C)
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
        interpret=interpret,
    )(q, k, v)


def _use_pallas(q, k) -> bool:
    if pltpu is None:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    C = q.shape[-1]
    H, W = q.shape[-3], q.shape[-2]
    # Per-row tiles narrower than 8 lose to XLA (the per-head segment matmul
    # degenerates on a 128-wide MXU tile; measured crossover at W=8), but
    # depth attention is per-pixel independent, so small-W maps are folded
    # into >=8-row tiles (H*W rows) by _pallas_forward / _ctx_pallas's hb
    # row-blocking — gate on the TOTAL spatial extent.
    return C % 128 == 0 and H * W >= 8


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
    out, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, num_heads), q, k, v)
    # the primal may have run the Pallas kernel, whose output dtype (q.dtype)
    # can differ from the reference path's promoted dtype — align the
    # cotangent to what THIS vjp expects
    return vjp(g.astype(out.dtype))


depth_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# Fused context branch: proj_context -> GroupNorm(relu) -> to_k/to_v ->
# depth attention, without materializing ANY (B, D, H, W, C) intermediate.
#
# The profiler shows the DepthTransformer context chain at width 32 costing
# ~13 ms/step: each of proj_context, the norm, and the k/v projections is a
# separate ~300 MB HBM pass over the (16, 48, 32, 32, C) frustum volume, and
# k/v alone materialize 400 MB. Three observations make one-pass fusion
# possible:
#   1. proj_context is a bias-free 1x1x1 Dense, so the GroupNorm statistics
#      of its OUTPUT are computable from the INPUT's first/second moments:
#      E[p] = E[x] @ Wp and E[p_f^2] = (Wp^T E[x x^T] Wp)_ff — one streaming
#      read of ctx plus tiny (Cc, Cc) matmuls, no materialized projection.
#   2. With stats in hand, norm+affine folds into per-(sample, channel)
#      A, B2: y = relu(p * A + B2).
#   3. The Pallas kernel then streams ctx ONCE per (b, h) grid cell and does
#      proj -> affine+relu -> k/v -> depth attention entirely in VMEM.
# --------------------------------------------------------------------------- #


def ctx_moments(ctx):
    """Per-sample first/second moments of the context channels (fp32):
    mean_x (B, Cc), m2 (B, Cc, Cc) = E[x x^T]. Computed OUTSIDE the fused
    attention's custom_vjp so XLA CSE shares one computation between all
    DepthTransformer blocks that consume the same per-width frustum tensor
    (4 blocks at width 32 in the shipped UNet)."""
    B = ctx.shape[0]
    Cc = ctx.shape[-1]
    flat = ctx.reshape(B, -1, Cc)
    S = flat.shape[1]
    xf = flat.astype(jnp.float32)
    hp = lax.Precision.HIGHEST
    mean_x = jnp.sum(xf, axis=1) / S
    m2 = jnp.einsum("bsc,bse->bce", xf, xf, precision=hp) / S
    return mean_x, m2


def _ctx_affine(mean_x, m2, Wp, gn_scale, gn_bias, num_groups: int,
                eps: float):
    """Fold proj+GroupNorm into per-(B, Cc) affine A, B2 (fp32)."""
    Cc = mean_x.shape[-1]
    cg = Cc // num_groups
    hp = lax.Precision.HIGHEST

    wp = Wp.astype(jnp.float32)
    mean_p = jnp.dot(mean_x, wp, precision=hp)  # (B, Cc)
    # E[p_f^2] = diag(Wp^T M2 Wp)
    e2 = jnp.einsum("cf,bce,ef->bf", wp, m2, wp, precision=hp)

    lane = lax.broadcasted_iota(jnp.int32, (Cc, num_groups), 0)
    grp = lax.broadcasted_iota(jnp.int32, (Cc, num_groups), 1)
    seg = (lane // cg == grp).astype(jnp.float32)
    mu_g = jnp.dot(mean_p, seg, precision=hp) / cg
    e2_g = jnp.dot(e2, seg, precision=hp) / cg
    var = jnp.maximum(e2_g - mu_g * mu_g, 0.0)
    inv = lax.rsqrt(var + eps)  # (B, G)

    inv_l = inv @ seg.T  # (B, Cc)
    mu_l = mu_g @ seg.T
    A = gn_scale.astype(jnp.float32)[None] * inv_l
    B2 = gn_bias.astype(jnp.float32)[None] - mu_l * A
    return A, B2


def _ctx_reference(q, ctx, Wp, A, B2, Wk, Wv, num_heads: int):
    """Plain-XLA fused-chain reference (same math as the kernel)."""
    B, D = ctx.shape[:2]
    Cc = ctx.shape[-1]
    p = jnp.dot(ctx.reshape(B, -1, Cc), Wp.astype(ctx.dtype))
    y = jnp.maximum(
        p.astype(jnp.float32) * A[:, None, :] + B2[:, None, :], 0.0
    ).astype(ctx.dtype)
    k = jnp.dot(y, Wk.astype(y.dtype)).reshape(ctx.shape[:-1] + (Wk.shape[-1],))
    v = jnp.dot(y, Wv.astype(y.dtype)).reshape(ctx.shape[:-1] + (Wv.shape[-1],))
    return _reference(q, k, v, num_heads)


def _ctx_kernel(q_ref, ctx_ref, wp_ref, a_ref, b_ref, wk_ref, wv_ref, o_ref,
                *, num_heads: int, scale: float):
    q = q_ref[0].reshape(-1, q_ref.shape[-1])   # (hb*W, Ci)
    ctx = ctx_ref[0]                            # (D, hb, W, Cc)
    D, hb, W, Cc = ctx.shape
    Ci = q.shape[-1]
    hd = Ci // num_heads
    S = hb * W

    b_idx = pl.program_id(0)
    a = a_ref[pl.ds(b_idx, 1), :]  # (1, Cc)
    b2 = b_ref[pl.ds(b_idx, 1), :]
    p = jnp.dot(ctx.reshape(D * S, Cc), wp_ref[...],
                preferred_element_type=jnp.float32)
    y = jnp.maximum(p * a + b2, 0.0).astype(ctx.dtype)
    k = jnp.dot(y, wk_ref[...], preferred_element_type=jnp.float32)
    v = jnp.dot(y, wv_ref[...], preferred_element_type=jnp.float32)
    k = k.astype(ctx.dtype).reshape(D, S, Ci)
    v = v.astype(jnp.float32).reshape(D, S, Ci)

    # lane-REPLICATED block-diagonal segment matrix: segrep[c, f] =
    # (c // hd == f // hd). One matmul lands sim already broadcast to all
    # hd lanes of its head, so the softmax runs on full 128-lane tiles of
    # real data and the old narrow (D*S, heads) matmul + attn @ seg.T
    # broadcast matmul both disappear. (The VPU processes 128 lanes per
    # cycle regardless, so the pre-replication softmax on a heads-wide
    # tile wasted 1 - heads/128 of every cycle.) Measured 1.88 -> 1.25 ms
    # per call at the flagship W=32 shape (B=16, D=48, Cc=64, Ci=128).
    lane = lax.broadcasted_iota(jnp.int32, (Ci, Ci), 0)
    out_l = lax.broadcasted_iota(jnp.int32, (Ci, Ci), 1)
    segrep = (lane // hd == out_l // hd).astype(q.dtype)

    pq = q[None, :, :] * k                                   # (D, S, Ci)
    sim = jnp.dot(pq.reshape(D * S, Ci), segrep,
                  preferred_element_type=jnp.float32)        # (D*S, Ci)
    sim = sim.reshape(D, S, Ci) * scale
    m = jnp.max(sim, axis=0, keepdims=True)
    e = jnp.exp(sim - m)
    attn = e / jnp.sum(e, axis=0, keepdims=True)             # (D, S, Ci) f32
    out = jnp.sum(attn * v, axis=0)                          # (S, Ci)
    o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _ctx_pallas(q, ctx, Wp, A, B2, Wk, Wv, num_heads: int,
                interpret: bool = False):
    B, H, W, Ci = q.shape
    D = ctx.shape[1]
    Cc = ctx.shape[-1]
    hd = Ci // num_heads
    dt = ctx.dtype
    # block several image rows per grid cell: per-row matmuls have K=Cc<=128
    # and leave the MXU underfed. VMEM stack is dominated by the f32
    # (D, hb*W, Ci) softmax temporaries: measured ~12 B/element all-in
    # (hb=8 at W=32/Ci=128 hit an 18.2M stack vs the 16M limit; hb=4 fits
    # at ~9M), so cap the estimate at 14M.
    hb = 1
    for cand in (8, 4, 2):
        if H % cand == 0 and D * cand * W * Ci * 12 < 14_000_000:
            hb = cand
            break
    kernel = functools.partial(_ctx_kernel, num_heads=num_heads,
                               scale=hd**-0.5)
    return pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, hb, W, Ci), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, D, hb, W, Cc), lambda b, h: (b, 0, h, 0, 0)),
            pl.BlockSpec((Cc, Cc), lambda b, h: (0, 0)),
            pl.BlockSpec((B, Cc), lambda b, h: (0, 0)),
            pl.BlockSpec((B, Cc), lambda b, h: (0, 0)),
            pl.BlockSpec((Cc, Ci), lambda b, h: (0, 0)),
            pl.BlockSpec((Cc, Ci), lambda b, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, W, Ci), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Ci), q.dtype),
        interpret=interpret,
    )(q, ctx, Wp.astype(dt), A, B2, Wk.astype(dt), Wv.astype(dt))


def _ctx_full(q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv, num_heads,
              num_groups, eps, use_kernel):
    A, B2 = _ctx_affine(mean_x, m2, Wp, gn_scale, gn_bias, num_groups, eps)
    if use_kernel:
        return _ctx_pallas(q, ctx, Wp, A, B2, Wk, Wv, num_heads)
    return _ctx_reference(q, ctx, Wp, A, B2, Wk, Wv, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def depth_attention_ctx(q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv,
                        num_heads: int, num_groups: int = 8,
                        eps: float = 1e-5):
    """Fused proj_context+GN(relu)+k/v+depth-attention.

    q: (B, H, W, Ci) projected queries; ctx: (B, D, H, W, Cc) RAW frustum
    context; (mean_x, m2): ctx_moments(ctx), hoisted so blocks sharing a
    context CSE them; Wp: (Cc, Cc) bias-free projection; gn_scale/gn_bias:
    (Cc,); Wk/Wv: (Cc, Ci). Returns (B, H, W, Ci) pre-to_out output.
    """
    use_kernel = _use_pallas(q, ctx)
    return _ctx_full(q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv,
                     num_heads, num_groups, eps, use_kernel)


def _ctx_fwd(q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv, num_heads,
             num_groups, eps):
    out = depth_attention_ctx(q, ctx, mean_x, m2, Wp, gn_scale, gn_bias,
                              Wk, Wv, num_heads, num_groups, eps)
    return out, (q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv)


def _ctx_bwd(num_heads, num_groups, eps, res, g):
    q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv = res
    out, vjp = jax.vjp(
        lambda *a: _ctx_full(*a, num_heads, num_groups, eps, False),
        q, ctx, mean_x, m2, Wp, gn_scale, gn_bias, Wk, Wv,
    )
    # the primal may have run the Pallas kernel (output dtype q.dtype); the
    # reference chain promotes through the inputs (e.g. a fp32 ctx after the
    # training-time condition-drop mask) — align the cotangent to THIS vjp's
    # expected output dtype. Hit in practice by drop_conditions training on
    # device (fp32 keep-mask multiply upcasting the frustum volumes).
    return vjp(g.astype(out.dtype))


depth_attention_ctx.defvjp(_ctx_fwd, _ctx_bwd)
