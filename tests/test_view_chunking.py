"""batch_view_num view-chunked sampling == all-views-batched sampling.

The reference serializes the sampler's per-view work in chunks of
batch_view_num for GPU memory (morphable_diffusion.py:723-735). Our sampler
batches all views by default and reproduces the chunked schedule with
`lax.map` when 0 < batch_view_num < N; the spatial volume is always built
from all views jointly. Per-view frustum conditioning and the UNet are
independent across views, so chunking must not change the result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
from morphablediffusion_tpu.sampling import SyncDDIMSampler

from tiny import tiny_batch, tiny_config

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(view_num=4)
    model = MorphableDiffusion(cfg.model)
    batch = tiny_batch(cfg, B=2)
    rngs = {
        "params": jax.random.key(0),
        "time": jax.random.key(1),
        "noise": jax.random.key(2),
        "view": jax.random.key(3),
        "vae": jax.random.key(4),
        "drop": jax.random.key(5),
    }
    params = jax.jit(lambda r, b: model.init(r, b, method="init_fn"))(rngs, batch)
    # perturb away from the zero-init output convs so eps isn't trivially 0
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(42), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    return cfg, model, batch, params


def _eps(model, params, batch, bvn):
    cfg = model.cfg
    B, N, h = 2, cfg.view_num, cfg.latent_size
    x = jax.random.normal(jax.random.key(9), (B, N, h, h, 4), jnp.float32)
    t = jnp.array([7, 123], jnp.int32)
    clip = jax.random.normal(jax.random.key(10), (B, 1, 768), jnp.float32)
    x_in = jax.random.normal(jax.random.key(11), (B, h, h, 4), jnp.float32)
    v = jnp.zeros((B, N, 4), jnp.float32)
    return jax.jit(
        lambda p: model.apply(p, x, t, clip, x_in, v, batch, 2.0, bvn,
                              method="predict_eps_cfg")
    )(params)


def test_chunked_eps_matches_full_batch(setup):
    cfg, model, batch, params = setup
    full = np.asarray(_eps(model, params, batch, 0))
    for bvn in (1, 2):
        chunked = np.asarray(_eps(model, params, batch, bvn))
        np.testing.assert_allclose(chunked, full, rtol=2e-5, atol=2e-5)


def test_chunked_decode_matches_full_batch(setup):
    cfg, model, batch, params = setup
    B, N, h = 2, cfg.model.view_num, cfg.model.latent_size
    latents = 0.2 * jax.random.normal(jax.random.key(3), (B, N, h, h, 4))
    full = np.asarray(jax.jit(
        lambda p: model.apply(p, latents, 0, method="decode_views")
    )(params))
    chunked = np.asarray(jax.jit(
        lambda p: model.apply(p, latents, 2, method="decode_views")
    )(params))
    np.testing.assert_allclose(chunked, full, rtol=2e-5, atol=2e-5)


def test_sampler_with_batch_view_num_runs(setup):
    cfg, model, batch, params = setup
    sampler = SyncDDIMSampler(model, sample_steps=2, batch_view_num=2)
    imgs, _ = jax.jit(lambda p, b, r: sampler.sample(p, b, r, 2.0))(
        params, batch, jax.random.key(1)
    )
    assert np.isfinite(np.asarray(imgs, np.float32)).all()
