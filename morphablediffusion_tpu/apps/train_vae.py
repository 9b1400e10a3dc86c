"""First-stage (AutoencoderKL) pre-training CLI.

The reference never trains its VAE — it inherits Stable Diffusion's
pretrained AutoencoderKL inside the SyncDreamer checkpoint
(/root/reference/ldm/models/diffusion/morphable_diffusion.py:399-422) and
freezes it. On a zero-egress host a from-scratch end-to-end demo therefore
needs an in-tree way to produce a WORKING first stage: with a random frozen
VAE the diffusion model would learn to denoise garbage latents and decode
them with a decoder that does not invert the encoder.

This CLI trains the same `models.vae.AutoencoderKL` the diffusion model
embeds (identical module tree, so the weights graft directly into
`first_stage` via `train.py --vae_from`) on the images of a facescape-layout
dataset tree, with the standard recon + KL objective (posterior-sampled
reconstructions, MSE, kl_weight ~ 1e-6 like SD's autoencoder recipe).

Latent-scale contract: the diffusion side multiplies latents by the FIXED
Stable-Diffusion constant 0.18215 (models/diffusion.py FIRST_STAGE_SCALE)
and its noise schedule assumes the scaled latents are ~unit-variance. A
freshly trained VAE's latent std is arbitrary, so after training this CLI
measures it and FOLDS the correction into the checkpoint's parameters:
quant_conv's mean rows scale by s (logvar bias shifts by 2*ln s),
post_quant_conv's kernel scales by 1/s. The saved weights then satisfy the
same contract as SD's VAE — no model-code change, no extra config knob —
and `encode -> decode` is unchanged up to float error (tested in
tests/test_train_vae.py).

  python -m morphablediffusion_tpu.apps.train_vae \
      --data_dir /tmp/synth/data --image_size 128 \
      --out runs/synth_vae/vae.msgpack --steps 3000
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


class ImageFolderDataset:
    """Every `rgba_colorcalib.png` (or any png) under a dataset tree, loaded
    with the SAME white-composite + bicubic pipeline the diffusion data layer
    uses (data/common.load_rgba_white) so the VAE trains on exactly the
    distribution it will encode."""

    def __init__(self, data_dir: str, image_size: int):
        root = Path(data_dir)
        self.paths = sorted(root.rglob("rgba_colorcalib.png")) or sorted(
            root.rglob("*.png")
        )
        if not self.paths:
            raise SystemExit(f"no pngs under {data_dir}")
        self.image_size = image_size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from morphablediffusion_tpu.data.common import load_rgba_white

        return {"image": load_rgba_white(self.paths[i], self.image_size)}


def fold_latent_scale(params, s: float):
    """Return params with the latent rescale z -> s*z folded into the quant
    convs: encode_moments' mean scales by s, its logvar shifts by 2*ln(s),
    and decode's input is divided by s — so `decode(encode(x))` is unchanged
    while the reported latents are s times larger. Used to make
    z * FIRST_STAGE_SCALE unit-variance on the training distribution."""
    import flax
    import jax.numpy as jnp

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    qk = ("params", "quant_conv", "kernel")
    qb = ("params", "quant_conv", "bias")
    pk = ("params", "post_quant_conv", "kernel")
    emb = flat[qk].shape[-1] // 2  # mean channels
    flat[qk] = jnp.concatenate(
        [flat[qk][..., :emb] * s, flat[qk][..., emb:]], axis=-1
    )
    flat[qb] = jnp.concatenate(
        [flat[qb][:emb] * s, flat[qb][emb:] + 2.0 * np.log(s)]
    )
    flat[pk] = flat[pk] / s
    return flax.core.freeze(flax.traverse_util.unflatten_dict(flat))


def save_vae(path: str, params, meta: dict):
    import flax

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(flax.serialization.msgpack_serialize(
        {"params": flax.core.unfreeze(params), "meta": meta}
    ))


def load_vae(path: str):
    """-> (params pytree, meta dict). The params tree is the standalone
    AutoencoderKL's {'params': ...}; graft its inner tree into the diffusion
    model at params['params']['first_stage']."""
    import flax

    blob = flax.serialization.msgpack_restore(Path(path).read_bytes())
    return blob["params"], blob["meta"]


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out", type=str, required=True,
                        help="output .msgpack (params + arch meta)")
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--ch", type=int, default=32)
    parser.add_argument("--ch_mult", type=str, default="1,2,2,4")
    parser.add_argument("--num_res_blocks", type=int, default=1)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--kl_weight", type=float, default=1e-6)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--save_every", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=4)
    flags = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from morphablediffusion_tpu.data.loader import PrefetchLoader
    from morphablediffusion_tpu.models.vae import (
        AutoencoderKL,
        sample_diagonal_gaussian,
    )

    ch_mult = tuple(int(x) for x in flags.ch_mult.split(","))
    meta = dict(ch=flags.ch, ch_mult=list(ch_mult),
                num_res_blocks=flags.num_res_blocks,
                image_size=flags.image_size)
    vae = AutoencoderKL(ch=flags.ch, ch_mult=ch_mult,
                        num_res_blocks=flags.num_res_blocks,
                        dtype=jnp.bfloat16)

    ds = ImageFolderDataset(flags.data_dir, flags.image_size)
    print(f"{len(ds)} images under {flags.data_dir}")
    loader = PrefetchLoader(ds, flags.batch_size, seed=flags.seed,
                            num_workers=flags.num_workers)
    batches = iter(loader)

    rng = jax.random.key(flags.seed)
    first = jnp.asarray(next(batches)["image"])
    params = jax.jit(vae.init)(rng, first)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"VAE params: {n_params/1e6:.2f} M "
          f"(ch={flags.ch}, mult={ch_mult}, blocks={flags.num_res_blocks})")

    # cosine decay to 10% after a short warmup
    sched = optax.warmup_cosine_decay_schedule(
        0.0, flags.lr, warmup_steps=min(100, flags.steps // 10),
        decay_steps=flags.steps, end_value=flags.lr * 0.1,
    )
    tx = optax.adam(sched)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, x, step_rng):
        mean, logvar = vae.apply(p, x, method="encode_moments")
        z = sample_diagonal_gaussian(step_rng, mean, logvar)
        recon = vae.apply(p, z, method="decode").astype(jnp.float32)
        mse = jnp.mean((recon - x) ** 2)
        kl = 0.5 * jnp.mean(
            jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=(1, 2, 3))
        )
        loss = mse + flags.kl_weight * kl
        aux = {"mse": mse, "kl": kl,
               "latent_std": jnp.std(mean.astype(jnp.float32))}
        return loss, aux

    @jax.jit
    def train_step(p, opt, x, step_rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, x, step_rng
        )
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss, aux

    out = Path(flags.out)
    t_last = time.time()
    x = first
    for step in range(1, flags.steps + 1):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss, aux = train_step(params, opt_state, x, step_rng)
        x = jnp.asarray(next(batches)["image"])  # overlap host load
        if step % flags.log_every == 0:
            mse = float(aux["mse"])
            psnr = -10.0 * np.log10(max(mse, 1e-12) / 4.0)  # range [-1,1]
            dt = (time.time() - t_last) / flags.log_every
            t_last = time.time()
            print(f"step {step} loss {float(loss):.5f} mse {mse:.5f} "
                  f"psnr {psnr:.1f} dB kl {float(aux['kl']):.1f} "
                  f"latent_std {float(aux['latent_std']):.3f} "
                  f"{dt*1000:.0f} ms/step", flush=True)
        if step % flags.save_every == 0 or step == flags.steps:
            save_vae(str(out), params, meta)

    # fold the latent rescale so z * 0.18215 is ~unit-variance (see module
    # docstring); measured over a few batches with the posterior MEAN, which
    # is what inference encodes
    from morphablediffusion_tpu.models.diffusion import FIRST_STAGE_SCALE

    stds = []
    for _ in range(4):
        mean, _lv = jax.jit(
            lambda p, x: vae.apply(p, x, method="encode_moments")
        )(params, x)
        stds.append(float(jnp.std(mean.astype(jnp.float32))))
        x = jnp.asarray(next(batches)["image"])
    std = float(np.mean(stds))
    s = (1.0 / FIRST_STAGE_SCALE) / max(std, 1e-6)
    params = fold_latent_scale(params, s)
    meta["latent_std_raw"] = std
    meta["fold_scale"] = s
    save_vae(str(out), params, meta)
    print(f"latent std {std:.3f} -> folded x{s:.3f} so that "
          f"z*{FIRST_STAGE_SCALE} is ~unit-variance; saved {out}")
    if hasattr(batches, "close"):
        batches.close()


if __name__ == "__main__":
    main()
