"""Gradient checkpointing (use_checkpoint) parity: remat must change memory,
never math. Grads of the training loss with rematerialized UNet blocks must
equal the stored-activation grads, and parameter trees must be identical."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tiny import tiny_batch, tiny_config

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion

import pytest

pytestmark = pytest.mark.slow



def _loss_and_grads(cfg, batch, params=None):
    model = MorphableDiffusion(cfg.model)
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    if params is None:
        params = model.init(rngs, batch, method="init_fn")
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}

    def loss_fn(p):
        return model.apply(p, batch, method="training_loss", rngs=apply_rngs)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return params, loss, grads


def test_remat_grads_match_stored():
    cfg = tiny_config(view_num=2)
    cfg.model.unet = dataclasses.replace(cfg.model.unet, use_checkpoint=False)
    batch = tiny_batch(cfg, B=1)

    params, loss0, g0 = _loss_and_grads(cfg, batch)

    cfg_r = tiny_config(view_num=2)
    cfg_r.model.unet = dataclasses.replace(cfg_r.model.unet, use_checkpoint=True)
    # same param tree must be accepted unchanged (nn.remat keeps names)
    _, loss1, g1 = _loss_and_grads(cfg_r, batch, params=params)

    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
