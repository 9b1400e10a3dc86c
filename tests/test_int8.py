"""W8A8 int8 serving path (ops/int8.py + layers.Conv8 + unet w8a8 flag).

Quality gates for the round-4 int8 harvest (PERF.md "int8 is the real
lever"): the quantized conv must track the fp32 conv within int8 error
bounds, the Conv8 param tree must be indistinguishable from nn.Conv's (so
every checkpoint keeps loading), and a full UNet forward with w8a8=True must
stay close to the bf16 forward on realistic (GN-normalized) activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_conv2d_w8a8_matches_fp32(rng):
    from morphablediffusion_tpu.ops.int8 import conv2d_w8a8

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 32, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = conv2d_w8a8(x, w, b, stride=1, padding=1, out_dtype=jnp.float32)
    # int8 symmetric quantization: relative L2 error well under 2%
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel

    # strides + per-channel scale robustness: one output channel 100x larger
    w2 = w.at[..., 0].mul(100.0)
    ref2 = jax.lax.conv_general_dilated(
        x, w2, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got2 = conv2d_w8a8(x, w2, None, stride=2, padding=1,
                       out_dtype=jnp.float32)
    rel2 = float(jnp.linalg.norm(got2 - ref2) / jnp.linalg.norm(ref2))
    assert rel2 < 0.02, rel2

    # all-zero kernel (a freshly zero-initialised conv): exact zeros, no NaN
    out0 = conv2d_w8a8(x, jnp.zeros_like(w), None, stride=1, padding=1,
                       out_dtype=jnp.float32)
    assert float(jnp.abs(out0).max()) == 0.0


def test_conv8_param_tree_matches_nn_conv(rng):
    from morphablediffusion_tpu.models.layers import conv

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    for kwargs in (dict(), dict(stride=2), dict(use_bias=False),
                   dict(kernel=1, padding=0)):
        m_f = conv(24, dtype=jnp.float32, **kwargs)
        m_q = conv(24, dtype=jnp.float32, int8=True, **kwargs)
        p_f = m_f.init(jax.random.key(0), x)
        p_q = m_q.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(p_f) == \
            jax.tree_util.tree_structure(p_q)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_q)):
            assert a.shape == b.shape and a.dtype == b.dtype
        # identical init (same RNG, same initializers) -> the int8 module
        # applied to a bf16-path checkpoint is the intended deployment
        np.testing.assert_allclose(
            np.asarray(m_q.apply(p_f, x)),
            np.asarray(m_f.apply(p_f, x)), rtol=0.05, atol=0.05,
        )


def test_unet_w8a8_close_to_bf16(rng):
    """Full tiny-UNet forward: int8 serving output must track the bf16
    output closely enough that a 50-step CFG trajectory stays on-manifold
    (threshold from the golden-denoise experience: bf16-vs-fp32 itself sits
    at ~1e-2 relative)."""
    from morphablediffusion_tpu.models.unet import DepthWiseUNet

    kw = dict(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_ds=(1, 2), channel_mult=(1, 2), num_heads=4,
        volume_dims=(8, 16, 32, 64), dtype=jnp.float32,
    )
    B, H = 2, 16
    x = jnp.asarray(rng.normal(size=(B, H, H, 8)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.normal(size=(B, 1, 768)).astype(np.float32))
    source = {
        16: jnp.asarray(rng.normal(size=(B, 8, 16, 16, 8)).astype(np.float32)),
        8: jnp.asarray(rng.normal(size=(B, 8, 8, 8, 16)).astype(np.float32)),
    }
    unet_f = DepthWiseUNet(**kw)
    unet_q = DepthWiseUNet(**kw, w8a8=True)
    params = unet_f.init(jax.random.key(1), x, t, ctx, source)
    # same params apply to both (tree-compatible)
    y_f = unet_f.apply(params, x, t, ctx, source)
    y_q = unet_q.apply(params, x, t, ctx, source)
    assert y_q.dtype == y_f.dtype and y_q.shape == y_f.shape
    rel = float(jnp.linalg.norm(y_q - y_f) / (jnp.linalg.norm(y_f) + 1e-9))
    assert np.isfinite(np.asarray(y_q)).all()
    assert rel < 0.05, rel


@pytest.mark.slow
def test_w8a8_trajectory_close_to_fp32(rng):
    """Trajectory-level quality gate (VERDICT r3 item 2a): a multi-step CFG
    DDIM trajectory served in w8a8 must stay close to the fp32 trajectory
    with the SAME params, same noise. Per-step int8 error is ~1% (tests
    above); the gate bounds its accumulation over the synchronous update."""
    import copy

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from tiny import tiny_batch, tiny_config

    cfg = tiny_config(view_num=4)
    cfg.model.sample_steps = 3
    batch = tiny_batch(cfg, B=1)
    rngs = {n: jax.random.key(i) for i, n in enumerate(
        ["params", "time", "noise", "view", "vae", "drop"])}

    model_f = MorphableDiffusion(cfg.model)
    params = jax.jit(
        lambda r, b: model_f.init(r, b, method="init_fn"))(rngs, batch)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )

    cfg_q = copy.deepcopy(cfg)
    cfg_q.model.unet.w8a8 = True
    model_q = MorphableDiffusion(cfg_q.model)

    outs = {}
    for name, m in (("f32", model_f), ("w8a8", model_q)):
        sampler = SyncDDIMSampler(m, sample_steps=cfg.model.sample_steps)
        imgs, _ = jax.jit(
            lambda p, b, r, s=sampler: s.sample(p, b, r, cfg_scale=2.0)
        )(params, batch, jax.random.key(11))
        outs[name] = np.asarray(imgs, np.float64)

    assert np.isfinite(outs["w8a8"]).all()
    rel = np.linalg.norm(outs["w8a8"] - outs["f32"]) / (
        np.linalg.norm(outs["f32"]) + 1e-9)
    # decoded-image relative L2 after 3 synchronous CFG steps; fp32-vs-bf16
    # itself sits ~1e-2 here, int8 must stay the same order
    assert rel < 0.08, rel
