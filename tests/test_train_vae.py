"""First-stage pre-training CLI: loss decreases, the latent-scale fold is a
numerical no-op for encode->decode while rescaling the reported latents, and
the saved weights graft into the diffusion model's first_stage.

The reference has no counterpart — it inherits SD's pretrained AutoencoderKL
(morphable_diffusion.py:399-422); apps/train_vae.py exists so the
from-scratch synthetic recipe (configs/synth_scratch.yaml) has a working
first stage on a zero-egress host.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image


def _write_images(root: Path, n=24, size=32):
    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / f"{i:03d}" / "01" / f"view_{i:05d}"
        d.mkdir(parents=True)
        # smooth color fields, not noise, so a few steps of training have
        # learnable structure
        yy, xx = np.mgrid[0:size, 0:size] / size
        f = rng.uniform(2, 6, 3)
        img = np.stack([np.sin(f[0] * yy + i), np.cos(f[1] * xx),
                        np.sin(f[2] * (xx + yy))], -1)
        rgba = np.concatenate(
            [((img + 1) * 127.5).astype(np.uint8),
             np.full((size, size, 1), 255, np.uint8)], -1)
        Image.fromarray(rgba, "RGBA").save(d / "rgba_colorcalib.png")


def test_fold_latent_scale_roundtrip(rng):
    from morphablediffusion_tpu.apps.train_vae import fold_latent_scale
    from morphablediffusion_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)) * 0.5
    params = vae.init(jax.random.key(0), x)
    mean0, logvar0 = vae.apply(params, x, method="encode_moments")
    recon0 = vae.apply(params, mean0, method="decode")

    s = 4.0
    folded = fold_latent_scale(params, s)
    mean1, logvar1 = vae.apply(folded, x, method="encode_moments")
    # latents rescale by s (logvar shifts by 2 ln s: std scales by s too)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0) * s,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar1),
                               np.asarray(logvar0) + 2 * np.log(s),
                               rtol=1e-4, atol=1e-4)
    # encode -> decode unchanged
    recon1 = vae.apply(folded, mean1, method="decode")
    np.testing.assert_allclose(np.asarray(recon1), np.asarray(recon0),
                               rtol=1e-4, atol=1e-4)


def test_train_vae_cli_and_graft(tmp_path):
    """Few-step CLI run on tiny images: the loss must drop, the saved
    checkpoint must satisfy the FIRST_STAGE_SCALE unit-variance contract on
    its training data, and the weights must graft into MorphableDiffusion's
    first_stage via the train.py --vae_from path's tree mapping."""
    from morphablediffusion_tpu.apps.train_vae import load_vae, main

    data = tmp_path / "data"
    _write_images(data)
    out = tmp_path / "vae.msgpack"
    main([
        "--data_dir", str(data), "--out", str(out),
        "--image_size", "32", "--ch", "32", "--ch_mult", "1,1,1,1",
        "--num_res_blocks", "1", "--steps", "30", "--batch_size", "8",
        "--lr", "3e-3", "--log_every", "10", "--save_every", "30",
        "--num_workers", "2",
    ])
    params, meta = load_vae(str(out))
    assert meta["ch"] == 32 and "fold_scale" in meta

    # contract: encode_moments' mean * 0.18215 is ~unit-std on training data
    from morphablediffusion_tpu.data.common import load_rgba_white
    from morphablediffusion_tpu.models.diffusion import FIRST_STAGE_SCALE
    from morphablediffusion_tpu.models.vae import AutoencoderKL

    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 1, 1), num_res_blocks=1)
    imgs = np.stack([
        load_rgba_white(p, 32) for p in sorted(data.rglob("*.png"))[:8]
    ])
    mean, _ = vae.apply(params, jnp.asarray(imgs), method="encode_moments")
    scaled_std = float(jnp.std(mean.astype(jnp.float32))) * FIRST_STAGE_SCALE
    assert 0.5 < scaled_std < 2.0, scaled_std

    # graft check: same tree structure + shapes as the diffusion model's
    # first_stage at matching config
    from morphablediffusion_tpu.utils.config import Config
    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from tests.tiny import tiny_config

    cfg = tiny_config()
    cfg.model.vae_ch = 32
    cfg.model.vae_ch_mult = (1, 1, 1, 1)
    cfg.model.vae_num_res_blocks = 1
    model = MorphableDiffusion(cfg.model)
    from tests.tiny import tiny_batch

    batch = tiny_batch(cfg)
    rngs = dict(zip(
        ["params", "time", "noise", "view", "vae", "drop"],
        jax.random.split(jax.random.key(0), 6),
    ))
    full = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), rngs, batch
    )
    like = full["params"]["first_stage"]
    new = params["params"]
    flat_like = jax.tree_util.tree_leaves_with_path(like)
    flat_new = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(new)}
    assert len(flat_like) == len(flat_new)
    for k, v in flat_like:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_new and flat_new[ks].shape == v.shape, ks
