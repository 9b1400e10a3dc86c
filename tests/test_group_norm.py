"""Fused GroupNorm: reference vs flax parity + Pallas interpret parity."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from morphablediffusion_tpu.ops import group_norm as gn


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32),
                                          ((2, 4, 6, 6, 32), 8),
                                          ((3, 5, 5, 320), 32)])
def test_reference_matches_flax(rng, shape, groups):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
    beta = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)

    ours = gn._reference(x, gamma, beta, groups, 1e-5, None)
    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ref = mod.apply({"params": {"scale": gamma, "bias": beta}}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("act", [None, "silu", "relu"])
@pytest.mark.parametrize("shape,groups", [((2, 4, 4, 128), 32),
                                          ((1, 6, 8, 8, 320), 8)])
def test_kernel_interpret_parity(rng, shape, groups, act):
    from jax.experimental import pallas as pl

    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    C = shape[-1]
    gamma = jnp.asarray(rng.normal(size=(C,)), jnp.float32)
    beta = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

    ref = gn._reference(x, gamma, beta, groups, 1e-5, act)

    B = shape[0]
    S = int(np.prod(shape[1:-1]))
    kernel = functools.partial(gn._kernel, num_groups=groups, epsilon=1e-5,
                               act=act)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
        interpret=True,
    )(x.reshape(B, S, C), gamma.reshape(1, C), beta.reshape(1, C))
    np.testing.assert_allclose(np.asarray(out).reshape(shape),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)), jnp.float32)
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)

    g1 = jax.grad(lambda x: jnp.sum(gn.group_norm(x, gamma, beta, 32) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(gn._reference(x, gamma, beta, 32, 1e-5, None) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_constant_input_stays_finite():
    """Channel-wise constant inputs make E[x^2]-E[x]^2 catastrophically
    cancel; with the TPU MXU's bf16 multiply rounding the result can be
    negative beyond epsilon (observed as all-NaN UNet outputs). The variance
    clamp + HIGHEST-precision stats must keep this finite everywhere."""
    x = jnp.broadcast_to(
        jnp.linspace(-2.0, 2.0, 32).reshape(1, 1, 1, 32), (2, 8, 8, 32)
    )
    for act in (None, "silu", "relu"):
        y = gn.group_norm(x, jnp.ones(32), jnp.zeros(32), 32, 1e-5, act)
        assert bool(jnp.isfinite(y).all())
        # constant input -> zero-centered output, beta=0 -> exactly act(0)
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-3)


def test_group_norm_shifted_matches_shifted_input():
    """group_norm_shifted(x, t) == group_norm(x + t[:, None, None, :]) — the
    ResBlock temb fold must be exact up to f32 reassociation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from morphablediffusion_tpu.ops.group_norm import (
        group_norm,
        group_norm_shifted,
    )

    B, H, W, C, G = 3, 8, 8, 64, 8
    x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.float32)
    t = jax.random.normal(jax.random.key(1), (B, C), jnp.float32) * 2.0
    gamma = jax.random.normal(jax.random.key(2), (C,), jnp.float32) + 1.0
    beta = jax.random.normal(jax.random.key(3), (C,), jnp.float32)

    for act in (None, "silu", "relu"):
        a = group_norm(x + t[:, None, None, :], gamma, beta, G, 1e-5, act)
        b = group_norm_shifted(x, t, gamma, beta, G, 1e-5, act)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # bf16 storage path (the in-model dtype)
    xb = x.astype(jnp.bfloat16)
    tb = t.astype(jnp.bfloat16)
    a = group_norm(xb + tb[:, None, None, :], gamma, beta, G, 1e-5, "silu")
    b = group_norm_shifted(xb, tb, gamma, beta, G, 1e-5, "silu")
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), rtol=2e-2, atol=2e-2)
