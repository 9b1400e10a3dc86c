"""Fused depth attention: Pallas kernel vs XLA reference parity."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphablediffusion_tpu.ops import depth_attention as da


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


@pytest.mark.parametrize("B,D,H,W,C,hn", [(2, 8, 4, 4, 128, 4),
                                          (1, 48, 8, 8, 256, 4)])
def test_kernel_interpret_parity(rng, B, D, H, W, C, hn):
    q = _rand(rng, (B, H, W, C))
    k = _rand(rng, (B, D, H, W, C))
    v = _rand(rng, (B, D, H, W, C))

    ref = da._reference(q, k, v, hn)

    from jax.experimental import pallas as pl

    hd = C // hn
    kernel = functools.partial(da._kernel, num_heads=hn, scale=hd**-0.5)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, W, C), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, D, 1, W, C), lambda b, h: (b, 0, h, 0, 0)),
            pl.BlockSpec((1, D, 1, W, C), lambda b, h: (b, 0, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, W, C), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), q.dtype),
        interpret=True,
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,D,H,W,C,hn", [(2, 12, 4, 4, 128, 4),
                                          (1, 48, 4, 2, 128, 8)])
def test_small_w_fold_parity(rng, B, D, H, W, C, hn):
    """W<8 maps fold to (B, 1, H*W, C) tiles inside _pallas_forward — the
    round-4 W=4 lever. Exactness of the fold: depth attention is per-pixel
    independent, so reshaping the spatial map cannot change the result."""
    q = _rand(rng, (B, H, W, C))
    k = _rand(rng, (B, D, H, W, C))
    v = _rand(rng, (B, D, H, W, C))
    ref = da._reference(q, k, v, hn)
    out = da._pallas_forward(q, k, v, hn, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ctx_kernel_small_w_parity(rng):
    """_ctx_pallas at W=4/H=4 rides hb row-blocking (hb=4 -> 16-row tiles);
    parity vs the plain-XLA fused-chain reference in interpret mode."""
    B, D, H, W, Cc, heads, inner = 2, 12, 4, 4, 16, 4, 128
    q = _rand(rng, (B, H, W, inner))
    ctx = _rand(rng, (B, D, H, W, Cc))
    Wp = _rand(rng, (Cc, Cc)) * 0.3
    scale = 1.0 + 0.1 * _rand(rng, (Cc,))
    bias = 0.1 * _rand(rng, (Cc,))
    Wk = _rand(rng, (Cc, inner)) * 0.3
    Wv = _rand(rng, (Cc, inner)) * 0.3

    mean_x, m2 = da.ctx_moments(ctx)
    A, B2 = da._ctx_affine(mean_x, m2, Wp, scale, bias, 8, 1e-5)
    ref = da._ctx_reference(q, ctx, Wp, A, B2, Wk, Wv, heads)
    out = da._ctx_pallas(q, ctx, Wp, A, B2, Wk, Wv, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_entrypoint_falls_back_on_cpu(rng):
    # On the CPU test backend the public entry must use the reference path
    q = _rand(rng, (1, 2, 2, 8))
    k = _rand(rng, (1, 4, 2, 2, 8))
    v = _rand(rng, (1, 4, 2, 2, 8))
    out = da.depth_attention(q, k, v, 2)
    ref = da._reference(q, k, v, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gradients_flow(rng):
    q = _rand(rng, (1, 2, 2, 8))
    k = _rand(rng, (1, 4, 2, 2, 8))
    v = _rand(rng, (1, 4, 2, 2, 8))

    def loss(q, k, v):
        return jnp.sum(da.depth_attention(q, k, v, 2) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    ref_gq, ref_gk, ref_gv = jax.grad(
        lambda q, k, v: jnp.sum(da._reference(q, k, v, 2) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(ref_gq), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(ref_gk), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ref_gv), rtol=1e-5)


def test_cfg_doubled_batch_matches_zero_context(rng):
    """DepthTransformer with a CFG-doubled batch (context at half batch) must
    equal the explicit formulation that projects a zeros_like context for the
    unconditional half (the reference's predict_with_unconditional_scale,
    morphable_diffusion.py:138-140)."""
    from morphablediffusion_tpu.models.unet import DepthTransformer

    B, D, H, W, C, CTX = 2, 6, 4, 4, 16, 8
    x = _rand(rng, (2 * B, H, W, C))
    ctx = _rand(rng, (B, D, H, W, CTX))

    mod = DepthTransformer(num_heads=2, head_dim=8, out_channels=C, ctx_dim=CTX)
    params = mod.init(jax.random.key(0), x[:B], ctx)

    # explicit: full doubled batch with zeroed unconditional context
    ctx_full = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
    ref = mod.apply(params, x, ctx_full)
    # fast path: half-batch context + the EXPLICIT cfg_doubled contract
    out = mod.apply(params, x, ctx, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ctx_chain_matches_module_chain(rng):
    """depth_attention_ctx (stats folded to affine, fused chain) must match
    proj_context -> GroupNorm(relu) -> to_k/to_v -> depth attention."""
    from morphablediffusion_tpu.ops.depth_attention import _ctx_full, _reference
    from morphablediffusion_tpu.ops.group_norm import group_norm

    B, D, H, W, Cc = 2, 6, 4, 4, 16
    heads, inner = 2, 16
    q = _rand(rng, (B, H, W, inner))
    ctx = _rand(rng, (B, D, H, W, Cc))
    Wp = _rand(rng, (Cc, Cc)) * 0.3
    scale = 1.0 + 0.1 * _rand(rng, (Cc,))
    bias = 0.1 * _rand(rng, (Cc,))
    Wk = _rand(rng, (Cc, inner)) * 0.3
    Wv = _rand(rng, (Cc, inner)) * 0.3

    p = jnp.einsum("bdhwc,ce->bdhwe", ctx, Wp)
    y = group_norm(p, scale, bias, 8, 1e-5, "relu")
    k = jnp.einsum("bdhwc,ce->bdhwe", y, Wk)
    v = jnp.einsum("bdhwc,ce->bdhwe", y, Wv)
    ref = _reference(q, k, v, heads)

    from morphablediffusion_tpu.ops.depth_attention import ctx_moments

    mean_x, m2 = ctx_moments(ctx)
    out = _ctx_full(q, ctx, mean_x, m2, Wp, scale, bias, Wk, Wv, heads, 8,
                    1e-5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    # grads flow through the custom_vjp wrapper (stats path included)
    from morphablediffusion_tpu.ops.depth_attention import depth_attention_ctx

    def f(c):
        mx, mm = ctx_moments(c)
        return jnp.sum(
            depth_attention_ctx(q, c, mx, mm, Wp, scale, bias, Wk, Wv,
                                heads) ** 2
        )

    g = jax.grad(f)(ctx)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.sum(jnp.abs(g))) > 0
