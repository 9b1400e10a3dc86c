"""MorphableDiffusion: the synchronized multi-view latent diffusion model.

Parity target: `SyncMultiviewDiffusion` + `UNetWrapper`
(morphable_diffusion.py:67-149, 322-646):

  * prepare      :473-489 — VAE-encode target/input views, CLIP-encode input.
  * training_loss :520-549 — noise-MSE on ONE random view out of N, while the
    spatial volume consumes ALL N noisy views.
  * predict_eps  :95-149 — classifier-free-guidance UNet call; training-time
    condition dropping (:84-93, 5% bands) and the zero123-style un-scaling of
    the concatenated input latent (:120-124).
  * decode_views :468-471.

TPU-first: every method is one jit-able graph; the N-view axis is batched
(B*N) rather than Python-looped; CFG runs as a doubled batch exactly like the
reference (:132-149) so conditional and unconditional passes share one UNet
launch.

Frozen submodules (VAE, CLIP — :54-59,422,426) get `stop_gradient` on their
outputs; the trainer additionally excludes their params from the optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from morphablediffusion_tpu.models.clip import CLIPImageEncoder
from morphablediffusion_tpu.models.layers import TimestepMLP
from morphablediffusion_tpu.models.spatial_volume import SpatialVolumeNet
from morphablediffusion_tpu.models.unet import DepthWiseUNet
from morphablediffusion_tpu.models.vae import AutoencoderKL, sample_diagonal_gaussian
from morphablediffusion_tpu.ops import schedules
from morphablediffusion_tpu.ops.embeddings import timestep_embedding, viewpoint_embedding
from morphablediffusion_tpu.utils.config import ModelConfig

FIRST_STAGE_SCALE = 0.18215  # morphable_diffusion.py:420


def _dtype_of(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.dtype]


class MorphableDiffusion(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dtype = _dtype_of(self.cfg)
        self.first_stage = AutoencoderKL(
            ch=self.cfg.vae_ch, ch_mult=self.cfg.vae_ch_mult,
            num_res_blocks=self.cfg.vae_num_res_blocks, dtype=dtype,
        )
        c = self.cfg.clip
        self.clip_image_encoder = CLIPImageEncoder(
            width=c.width, layers=c.layers, num_heads=c.num_heads,
            patch_size=c.patch_size, output_dim=c.output_dim, dtype=dtype,
        )
        self.time_embed = TimestepMLP(self.cfg.time_embed_dim, dtype=jnp.float32)
        self.spatial_volume = SpatialVolumeNet(
            view_num=self.cfg.view_num,
            input_image_size=self.cfg.image_size,
            spatial_volume_size=self.cfg.spatial_volume_size,
            spatial_volume_length=self.cfg.spatial_volume_length,
            frustum_volume_depth=self.cfg.frustum_volume_depth,
            frustum_volume_length=self.cfg.frustum_volume_length,
            projection=self.cfg.projection,
            use_spatial_volume=self.cfg.use_spatial_volume,
            voxel_grid_shape=self.cfg.voxel_grid_shape,
            coarse_voxel_size=self.cfg.coarse_voxel_size,
            mesh_voxel_mode=self.cfg.mesh_voxel_mode,
            fine_grid_shape=self.cfg.fine_grid_shape,
            fine_voxel_size=self.cfg.fine_voxel_size,
            volume_dims=self.cfg.unet.volume_dims,
            dtype=dtype,
        )
        u = self.cfg.unet
        self.unet = DepthWiseUNet(
            in_channels=u.in_channels,
            model_channels=u.model_channels,
            out_channels=u.out_channels,
            num_res_blocks=u.num_res_blocks,
            attention_ds=u.attention_ds,
            channel_mult=u.channel_mult,
            num_heads=u.num_heads,
            transformer_depth=u.transformer_depth,
            volume_dims=u.volume_dims,
            dtype=dtype,
            w8a8=u.w8a8,
        )

    def init_fn(self, batch):
        """Initialization entry point touching EVERY submodule (training path
        + VAE decoder), so one `model.init` covers training and sampling."""
        loss = self.training_loss(batch)
        B = batch["input_image"].shape[0]
        h = self.cfg.latent_size
        _ = self.decode_views(jnp.zeros((B, 1, h, h, 4)))
        return loss

    # ------------------------------------------------------------------ #
    # encoding

    def encode_image(self, images, rng=None):
        """images: (..., H, W, 3) in [-1,1] -> scaled latents (..., H/8, W/8, 4).

        Samples the VAE posterior when rng is given, else uses the mode
        (encode_first_stage, morphable_diffusion.py:460-466). Frozen.

        Large flat batches (training encodes batch x 16 target views, the
        reference's per-view Python loop :478) stream through the frozen
        encoder in fixed chunks via `lax.map` — the encoder's transient
        activations at 256^2 are ~60 MB/image, so encoding B*N=1120 images
        at once would need ~10x HBM for zero speedup (the encoder is
        compute-bound); chunking bounds the transient at chunk-size images
        per iteration.
        """
        lead = images.shape[:-3]
        flat = images.reshape((-1,) + images.shape[-3:])
        M = flat.shape[0]
        chunk = self.cfg.vae_encode_chunk
        # no chunking while variables are being created: module calls inside
        # lax.map would initialize params inside the traced body (tracer leak)
        if chunk and M > chunk and M % chunk == 0 and not self.is_initializing():
            fs = self.first_stage
            mean, logvar = jax.lax.map(
                lambda c: fs.encode_moments(c),
                flat.reshape((M // chunk, chunk) + flat.shape[1:]),
            )
            mean = mean.reshape((M,) + mean.shape[2:])
            logvar = logvar.reshape((M,) + logvar.shape[2:])
        else:
            mean, logvar = self.first_stage.encode_moments(flat)
        if rng is not None:
            z = sample_diagonal_gaussian(rng, mean, logvar)
        else:
            z = mean
        z = jax.lax.stop_gradient(z.astype(jnp.float32)) * FIRST_STAGE_SCALE
        return z.reshape(lead + z.shape[-3:])

    def decode_views(self, latents, batch_view_num: int = 0):
        """latents: (B, N, h, w, 4) scaled -> images (B, N, H, W, 3).

        batch_view_num (static): 0 / >= N decodes all views in one VAE call;
        otherwise `lax.map` over view chunks bounds the decoder's activation
        peak (the VAE decoder at 256^2 is the widest activation in the
        sampling graph) — the same memory knob as predict_eps_cfg."""
        B, N = latents.shape[:2]
        flat = latents.reshape((B * N,) + latents.shape[2:]) / FIRST_STAGE_SCALE
        chunk = batch_view_num if 0 < batch_view_num < N else N
        if N % chunk != 0:
            chunk = N
        if chunk == N:
            img = self.first_stage.decode(flat).astype(jnp.float32)
        else:
            stacked = flat.reshape((B * N // chunk, chunk) + flat.shape[1:])
            img = jax.lax.map(
                lambda z: self.first_stage.decode(z).astype(jnp.float32),
                stacked,
            )
            img = img.reshape((B * N,) + img.shape[2:])
        return img.reshape((B, N) + img.shape[1:])

    def encode_clip(self, images):
        """(B, H, W, 3) in [-1,1] -> (B, 1, 768), frozen."""
        return jax.lax.stop_gradient(self.clip_image_encoder(images))

    def embed_time(self, t):
        return self.time_embed(
            timestep_embedding(t, self.cfg.time_embed_dim)
        )

    def embed_viewpoints(self, batch):
        return viewpoint_embedding(
            batch["input_elevation"], batch["input_azimuth"],
            batch["target_elevation"], batch["target_azimuth"],
        )

    # ------------------------------------------------------------------ #
    # conditioning

    def _volume(self, x_noisy, t_embed, v_embed, batch):
        return self.spatial_volume.construct_spatial_volume(
            x_noisy, t_embed, v_embed,
            batch["target_K"], batch["target_RT"],
            batch["vertices"], batch["vertex_mask"],
        )

    def _frustum(self, volume, t_embed, v_embed, batch, target_index):
        """target_index: (B, TN) int32 -> ({width: (B*TN, ...)}, depth)."""
        B, TN = target_index.shape
        take = lambda arr: jnp.take_along_axis(
            arr, target_index.reshape((B, TN) + (1,) * (arr.ndim - 2)), axis=1
        )
        poses = take(batch["target_RT"])
        Ks = take(batch["target_K"])
        v_sel = take(v_embed)
        return self.spatial_volume.construct_view_frustum_volume(
            volume, t_embed, v_sel, poses, Ks
        )

    # ------------------------------------------------------------------ #
    # denoising

    def apply_unet(self, x, t, clip_embed, volume_feats, x_concat,
                   remat: bool = False, cfg_doubled: bool = False):
        """Single (conditional) UNet call with the zero123 concat un-scaling
        (UNetWrapper.forward :120-129). cfg_doubled declares the CFG
        doubled-batch contract (see DepthWiseUNet)."""
        x_in = jnp.concatenate([x, x_concat / FIRST_STAGE_SCALE], axis=-1)
        return self.unet(x_in, t, clip_embed, volume_feats, remat=remat,
                         cfg_doubled=cfg_doubled)

    def predict_eps_cfg(
        self, x_noisy, t, clip_embed, x_input_latent, v_embed, batch,
        cfg_scale: float, batch_view_num: int = 0,
    ):
        """CFG noise prediction for all N views.

        x_noisy: (B, N, h, w, 4); t: (B,). Returns (B, N, h, w, 4).
        (UNetWrapper.predict_with_unconditional_scale :132-149 + the sampler's
        denoise_apply :701-739.)

        batch_view_num (static) is the reference's sampling memory knob
        (morphable_diffusion.py:723-735): 0 / >= N runs ALL views in one
        doubled-batch UNet call (the TPU fast path — one chip fits the full
        16-view batch at serving); 0 < batch_view_num < N serializes the
        frustum + UNet work over view chunks with `lax.map`, cutting peak
        activation memory ~N/batch_view_num x. The spatial volume is always
        built from all N views jointly — that is the synchronization. Both
        paths are numerically identical (tests/test_view_chunking.py).
        """
        B, N, h, w, C = x_noisy.shape
        t_embed = self.embed_time(t)
        volume = self._volume(x_noisy, t_embed, v_embed, batch)

        def eps_for_views(view_idx):
            """view_idx: (TN,) int32 -> eps (B, TN, h, w, C) with CFG applied."""
            TN = view_idx.shape[0]
            vi = jnp.broadcast_to(view_idx[None], (B, TN))
            volume_feats, _ = self._frustum(volume, t_embed, v_embed, batch, vi)

            x_sel = jnp.take_along_axis(
                x_noisy, vi[..., None, None, None], axis=1
            )  # (B, TN, h, w, C)
            x_flat = x_sel.reshape(B * TN, h, w, C)
            t_flat = jnp.repeat(t, TN, axis=0)
            clip_flat = jnp.repeat(clip_embed, TN, axis=0)  # (B*TN, 1, 768)
            concat_flat = jnp.repeat(
                x_input_latent[:, None], TN, axis=1
            ).reshape(B * TN, h, w, C)

            x2 = jnp.concatenate([x_flat, x_flat], axis=0)
            t2 = jnp.concatenate([t_flat, t_flat], axis=0)
            clip2 = jnp.concatenate(
                [clip_flat, jnp.zeros_like(clip_flat)], axis=0
            )
            concat2 = jnp.concatenate(
                [concat_flat, jnp.zeros_like(concat_flat)], axis=0
            )
            # volume_feats stays at half batch: DepthTransformer detects the
            # 2:1 ratio and reproduces the reference's zeros_like(v)
            # unconditional source_dict (morphable_diffusion.py:138-140)
            # analytically instead of projecting a (B*TN, 48, w, w, C) zero
            # tensor through the depth branch.
            eps2 = self.apply_unet(x2, t2, clip2, volume_feats, concat2,
                                   cfg_doubled=True)
            s, s_uc = jnp.split(eps2, 2, axis=0)
            eps = s_uc + cfg_scale * (s - s_uc)
            return eps.reshape(B, TN, h, w, C)

        chunk = batch_view_num if 0 < batch_view_num < N else N
        if N % chunk != 0:
            chunk = N
        if chunk == N:
            return eps_for_views(jnp.arange(N, dtype=jnp.int32))
        groups = jnp.arange(N, dtype=jnp.int32).reshape(N // chunk, chunk)
        eps_chunks = jax.lax.map(eps_for_views, groups)  # (G, B, chunk, ...)
        return jnp.moveaxis(eps_chunks, 0, 1).reshape(B, N, h, w, C)

    # ------------------------------------------------------------------ #
    # training

    def _drop_masks(self, B):
        """5%-band condition dropping (UNetWrapper.get_drop_scheme :84-93)."""
        r = jax.random.uniform(self.make_rng("drop"), (B,))
        drop_clip = (r > 0.15) & (r <= 0.2)
        drop_volume = (r > 0.1) & (r <= 0.15)
        drop_concat = (r > 0.05) & (r <= 0.1)
        drop_all = r <= 0.05
        keep = lambda d: 1.0 - (d | drop_all).astype(jnp.float32)
        return keep(drop_clip), keep(drop_volume), keep(drop_concat)

    def training_loss(self, batch):
        """One training step's loss (training_step :520-549). Needs rngs:
        {'time', 'noise', 'view', 'vae', 'drop'}."""
        cfg = self.cfg
        B = batch["target_image"].shape[0]
        N = cfg.view_num
        sched = schedules.make_diffusion_schedule()

        x = self.encode_image(batch["target_image"], self.make_rng("vae"))
        x_input = self.encode_image(batch["input_image"], self.make_rng("vae"))
        clip_embed = self.encode_clip(batch["input_image"])

        t = jax.random.randint(self.make_rng("time"), (B,), 0, sched.num_timesteps)
        noise = jax.random.normal(self.make_rng("noise"), x.shape, jnp.float32)
        x_noisy = schedules.add_noise(x, noise, t, sched)

        target_index = jax.random.randint(self.make_rng("view"), (B, 1), 0, N)
        v_embed = self.embed_viewpoints(batch)
        t_embed = self.embed_time(t)

        volume = self._volume(x_noisy, t_embed, v_embed, batch)
        volume_feats, _ = self._frustum(volume, t_embed, v_embed, batch, target_index)

        sel = lambda arr: jnp.take_along_axis(
            arr, target_index.reshape((B, 1) + (1,) * (arr.ndim - 2)), axis=1
        )[:, 0]
        x_noisy_sel = sel(x_noisy)
        noise_sel = sel(noise)
        x_concat = x_input

        if cfg.drop_conditions:
            # masks multiply in each tensor's OWN dtype: an fp32 mask would
            # silently promote every (B, D, w, w, C) frustum volume (and the
            # latents) to fp32 — 2x the HBM traffic of the whole UNet
            # conditioning path during training
            keep_clip, keep_vol, keep_cat = self._drop_masks(B)
            clip_embed = clip_embed * keep_clip[:, None, None].astype(
                clip_embed.dtype)
            volume_feats = {
                k: v * keep_vol[:, None, None, None, None].astype(v.dtype)
                for k, v in volume_feats.items()
            }
            x_concat = x_concat * keep_cat[:, None, None, None].astype(
                x_concat.dtype)

        eps = self.apply_unet(
            x_noisy_sel, t, clip_embed, volume_feats, x_concat,
            remat=cfg.unet.use_checkpoint,
        )
        loss = jnp.mean((eps - noise_sel) ** 2)
        return loss

    # ------------------------------------------------------------------ #
    # inference-side preparation (sample loop itself lives in sampling/ddim.py)

    def prepare_inference(self, batch):
        """CLIP + VAE encode the input view (prepare :473-489, no targets;
        posterior mode — deterministic at inference)."""
        x_input = self.encode_image(batch["input_image"])
        clip_embed = self.encode_clip(batch["input_image"])
        v_embed = self.embed_viewpoints(batch)
        return {"x_input": x_input, "clip_embed": clip_embed, "v_embed": v_embed}
