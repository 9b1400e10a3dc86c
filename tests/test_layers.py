"""Unit tests for shared layer blocks (models/layers.py).

Covers the single-key cross-attention fast path: with L_kv == 1 the softmax
weight is identically 1, so the module's output must equal the general
attention path. The general path is exercised by duplicating the one context
token — softmax over two identical keys gives 0.5/0.5 and the same convex
combination, so the two calls are mathematically identical.
"""

import jax
import jax.numpy as jnp

from morphablediffusion_tpu.models.layers import BasicTransformerBlock, CrossAttention


def test_cross_attention_single_token_context_matches_general_path():
    B, L, C = 3, 17, 64
    heads, hd = 4, 16
    rng = jax.random.PRNGKey(0)
    kx, kc, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (B, L, C), jnp.float32)
    ctx = jax.random.normal(kc, (B, 1, 48), jnp.float32)

    module = CrossAttention(num_heads=heads, head_dim=hd)
    params = module.init(kp, x, ctx)
    # init through the fast path must create all four projections so
    # checkpoint import sees the same tree as the general path
    names = set(params["params"].keys())
    assert names == {"to_q", "to_k", "to_v", "to_out"}

    fast = module.apply(params, x, ctx)
    ctx2 = jnp.concatenate([ctx, ctx], axis=1)  # forces the general path
    general = module.apply(params, x, ctx2)
    assert fast.shape == (B, L, C)
    assert jnp.max(jnp.abs(fast - general)) < 1e-5


def test_cross_attention_zero_context_is_bias_only():
    # The CFG unconditional half feeds zeros_like(clip_embed): to_v(0) = 0,
    # so the block output must be exactly the to_out bias everywhere.
    B, L, C = 2, 9, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, C), jnp.float32)
    ctx = jnp.zeros((B, 1, 24), jnp.float32)
    module = CrossAttention(num_heads=2, head_dim=16)
    params = module.init(jax.random.PRNGKey(2), x, ctx)
    out = module.apply(params, x, ctx)
    bias = params["params"]["to_out"]["bias"]
    assert jnp.allclose(out, jnp.broadcast_to(bias, out.shape), atol=1e-7)


def test_transformer_block_single_token_context():
    # End-to-end through BasicTransformerBlock (self-attn + cross-attn + FF):
    # the broadcastable (B, 1, C) fast-path output must compose with the
    # residual adds identically to the duplicated-context general path.
    B, L, C = 2, 25, 64
    kx, kc, kp = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (B, L, C), jnp.float32)
    ctx = jax.random.normal(kc, (B, 1, 40), jnp.float32)
    block = BasicTransformerBlock(num_heads=4, head_dim=16)
    params = block.init(kp, x, ctx)
    fast = block.apply(params, x, ctx)
    general = block.apply(params, x, jnp.concatenate([ctx, ctx], axis=1))
    assert jnp.max(jnp.abs(fast - general)) < 1e-5
