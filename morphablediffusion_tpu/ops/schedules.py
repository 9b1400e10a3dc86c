"""Diffusion noise schedules and DDIM tables.

Numerics match the reference (ldm/models/diffusion/morphable_diffusion.py:428-450
`_init_schedule`, :658-672 `SyncDDIMSampler._make_schedule`, and
ldm/modules/diffusionmodules/util.py:46-60 `make_ddim_timesteps`): a
"scaled-linear" beta schedule with linear_start=8.5e-4, linear_end=1.2e-2,
T=1000, and a uniform DDIM discretization with a +1 offset.

Tables are computed eagerly in float64 numpy at model build time and stored as
float32 jnp constants — they are tiny (length <= 1000) and baking them as
constants lets XLA fold every gather of them into the compiled step.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """DDPM forward-process tables, all shape (T,) float32."""

    num_timesteps: int
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Per-DDIM-step tables, all shape (S,) float32 (S = #ddim steps).

    Index s corresponds to DDPM timestep ``timesteps[s]``; sampling walks
    s = S-1 ... 0.
    """

    num_steps: int
    timesteps: jnp.ndarray  # int32, DDPM t for each DDIM index
    alphas: jnp.ndarray
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray
    eta: float


def make_diffusion_schedule(
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
) -> DiffusionSchedule:
    """Scaled-linear beta schedule (Stable Diffusion convention)."""
    betas = (
        np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64)
        ** 2
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.clip(posterior_variance, 1e-20, None))
    posterior_log_variance_clipped = np.clip(posterior_log_variance_clipped, -10, None)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        num_timesteps=num_timesteps,
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
    )


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int = 1000) -> np.ndarray:
    """Uniform DDIM discretization with the reference's +1 offset
    (diffusionmodules/util.py:46-60), emitting EXACTLY num_ddim_steps
    entries: `arange(0, T, c) + 1` overshoots to T (an out-of-range alpha
    index) whenever num_ddim_steps does not divide T — e.g. 3 steps of a
    1000-step schedule yielded [1, 334, 667, 1000]. Identical to the
    reference for every divisor count (50: [1, 21, ..., 981])."""
    c = num_ddpm_steps // num_ddim_steps
    return np.arange(num_ddim_steps) * c + 1


def make_ddim_schedule(
    schedule: DiffusionSchedule,
    num_steps: int = 50,
    eta: float = 1.0,
) -> DDIMSchedule:
    timesteps = make_ddim_timesteps(num_steps, schedule.num_timesteps)
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    alphas = acp[timesteps]
    alphas_prev = np.concatenate([acp[0:1], acp[timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        num_steps=len(timesteps),
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        alphas=f32(alphas),
        alphas_prev=f32(alphas_prev),
        sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
        sigmas=f32(sigmas),
        eta=eta,
    )


def add_noise(x_start, noise, t, schedule: DiffusionSchedule):
    """q(x_t | x_0): returns the noised sample.

    x_start: (B, ...) ; noise: same shape ; t: (B,) int32.
    Matches reference morphable_diffusion.py:551-565.
    """
    b = x_start.shape[0]
    bshape = (b,) + (1,) * (x_start.ndim - 1)
    sac = schedule.sqrt_alphas_cumprod[t].reshape(bshape)
    somac = schedule.sqrt_one_minus_alphas_cumprod[t].reshape(bshape)
    return sac * x_start + somac * noise


def ddim_step(x_t, noise_pred, index, ddim: DDIMSchedule, sigma_noise=None):
    """One synchronized DDIM update (reference denoise_apply_impl :675-698).

    x_t, noise_pred: (..., H, W, C) same shape; index: scalar int (DDIM index).
    sigma_noise: pre-drawn standard normal of x_t's shape, or None for the
    final (index==0) step. The caller supplies noise so RNG stays outside.
    """
    a_t = ddim.alphas[index]
    a_prev = ddim.alphas_prev[index]
    sqrt_one_minus_at = ddim.sqrt_one_minus_alphas[index]
    sigma_t = ddim.sigmas[index]

    pred_x0 = (x_t - sqrt_one_minus_at * noise_pred) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma_t**2, min=1e-7)) * noise_pred
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if sigma_noise is not None:
        x_prev = x_prev + sigma_t * sigma_noise
    return x_prev
