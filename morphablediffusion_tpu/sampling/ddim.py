"""Synchronized multi-view DDIM sampler — one jitted graph for all 50 steps.

Parity target: `SyncDDIMSampler` (morphable_diffusion.py:648-776): uniform
50-step discretization with eta=1.0, each step rebuilding the spatial volume
from the current noisy latents of ALL 16 views, then denoising every view
jointly with classifier-free guidance.

TPU-first restructuring (SURVEY.md section 7, "One-graph DDIM step"): the
reference's Python loops — per-step tqdm (:768), per-view chunks of
batch_view_num (:723-735), per-sample spconv (:245) — become one
`lax.scan` over step indices whose body batches all views and both CFG
branches. First call compiles once; every subsequent avatar is pure device
time with zero host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
from morphablediffusion_tpu.ops import schedules


@dataclasses.dataclass
class SyncDDIMSampler:
    """Stateless sampler bound to a model definition.

    Usage:
        sampler = SyncDDIMSampler(model, sample_steps=50, eta=1.0)
        images, latents = sampler.sample(params, batch, rng, cfg_scale=2.0)
    """

    model: MorphableDiffusion
    sample_steps: int = 50
    eta: float = 1.0
    # Reference memory knob (morphable_diffusion.py:723-735): serialize the
    # frustum + UNet work (and the VAE decode) over chunks of this many views
    # per step via lax.map. 0 = all views in one batch (TPU fast path; a
    # single chip fits the full 16-view batch at serving). Use 4-8 when the
    # chip also holds training state (e.g. validation sampling mid-train).
    batch_view_num: int = 0

    def __post_init__(self):
        sched = schedules.make_diffusion_schedule()
        self.ddim = schedules.make_ddim_schedule(sched, self.sample_steps, self.eta)

    def denoise_latents(self, params, batch, prep, rng, cfg_scale,
                        view_sharding=None, collect_trajectory=False):
        """Run the full reverse process; returns final latents (B, N, h, w, 4).
        With collect_trajectory=True returns (latents, (T, B, N, h, w, 4))
        — the post-update latent at every step, for serving-mode quality
        studies (e.g. bf16-vs-int8 drift curves, tools/int8_trajectory.py).

        view_sharding: optional NamedSharding (e.g. P(None, "view")) pinning
        the N-view axis across a device mesh. XLA's SPMD partitioner then
        splits every per-view stage of the step across chips and inserts the
        single small all-reduce the volume build needs (the mean over views
        of per-vertex features) over ICI.
        """
        cfg = self.model.cfg
        B = batch["input_image"].shape[0]
        N, h = cfg.view_num, cfg.latent_size
        ddim = self.ddim

        constrain = (
            (lambda a: jax.lax.with_sharding_constraint(a, view_sharding))
            if view_sharding is not None
            else (lambda a: a)
        )

        rng, init_rng = jax.random.split(rng)
        x = constrain(jax.random.normal(init_rng, (B, N, h, h, 4), jnp.float32))

        def body(x, index):
            t = jnp.full((B,), ddim.timesteps[index], jnp.int32)
            eps = self.model.apply(
                params,
                x,
                t,
                prep["clip_embed"],
                prep["x_input"],
                prep["v_embed"],
                batch,
                cfg_scale,
                self.batch_view_num,
                method="predict_eps_cfg",
            )
            step_rng = jax.random.fold_in(rng, index)
            # eta-noise on every step except the last (denoise_apply_impl :695-697)
            noise = jax.random.normal(step_rng, x.shape, jnp.float32)
            noise = noise * (index != 0).astype(jnp.float32)
            x_new = constrain(schedules.ddim_step(x, eps, index, ddim, noise))
            return x_new, (x_new if collect_trajectory else None)

        indices = jnp.arange(ddim.num_steps - 1, -1, -1)
        x, traj = jax.lax.scan(body, x, indices)
        if collect_trajectory:
            return x, traj
        return x

    def sample(self, params, batch, rng, cfg_scale: float = 2.0,
               view_sharding=None):
        """Full pipeline: prepare -> scan denoise -> VAE decode.

        Returns (images (B, N, H, W, 3) in [-1, 1], latents).
        Wrap in jax.jit at the call site (see apps/ and bench.py).

        Pass view_sharding (parallel.mesh.view_sharding(mesh)) to run the
        whole denoising scan and the VAE decode view-parallel across a
        device mesh — the TPU-native replacement for the reference's
        single-GPU batch_view_num chunking.
        """
        prep = self.model.apply(params, batch, method="prepare_inference")
        latents = self.denoise_latents(
            params, batch, prep, rng, cfg_scale, view_sharding=view_sharding
        )
        images = self.model.apply(
            params, latents, self.batch_view_num, method="decode_views"
        )
        return images, latents
