"""View-parallel (multi-chip) sampling: parity vs the replicated path.

The reference runs the 16 synchronized views through the UNet in chunks of
`batch_view_num` on one GPU (morphable_diffusion.py:723-735). The TPU build
instead shards the view axis over a device mesh
(parallel.mesh.create_view_mesh); this test checks on the 8-virtual-device
CPU mesh that the sharded denoising scan produces the same avatar as the
single-device graph.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tiny import tiny_batch, tiny_config

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
from morphablediffusion_tpu.parallel.mesh import create_view_mesh, view_sharding
from morphablediffusion_tpu.sampling import SyncDDIMSampler

import pytest

pytestmark = pytest.mark.slow



def test_view_sharded_sampling_matches_replicated():
    n_dev = jax.device_count()
    assert n_dev == 8, "conftest must provide 8 virtual devices"

    cfg = tiny_config(view_num=8)
    model = MorphableDiffusion(cfg.model)
    batch = tiny_batch(cfg, B=1, with_targets=False)

    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    init_batch = {
        **batch,
        "target_image": jnp.zeros(
            (1, cfg.model.view_num, cfg.model.image_size, cfg.model.image_size, 3)
        ),
    }
    params = model.init(rngs, init_batch, method="init_fn")

    sampler = SyncDDIMSampler(model, sample_steps=2)
    rng = jax.random.key(7)

    imgs_ref, lat_ref = jax.jit(
        lambda p, b, r: sampler.sample(p, b, r, 2.0)
    )(params, batch, rng)

    mesh = create_view_mesh(jax.devices())
    sh = view_sharding(mesh)
    imgs_sh, lat_sh = jax.jit(
        lambda p, b, r: sampler.sample(p, b, r, 2.0, view_sharding=sh)
    )(params, batch, rng)

    # the latent scan carry must actually be split across the 8 devices
    assert not lat_sh.sharding.is_fully_replicated
    assert len({s.device for s in lat_sh.addressable_shards}) == n_dev

    np.testing.assert_allclose(
        np.asarray(lat_sh), np.asarray(lat_ref), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(imgs_sh), np.asarray(imgs_ref), rtol=2e-4, atol=2e-4
    )
