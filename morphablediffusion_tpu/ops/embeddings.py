"""Sinusoidal time embeddings and relative-viewpoint embeddings.

Parity targets:
  * `timestep_embedding` — ldm/modules/diffusionmodules/util.py:151-171
    (note the reference concatenates cos THEN sin).
  * `viewpoint_embedding` — morphable_diffusion.py:383-397
    (delta elevation, sin/cos delta azimuth, zero pad).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding. timesteps: (B,) int or float -> (B, dim) f32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def viewpoint_embedding(
    input_elevation_deg,  # (B, 1)
    input_azimuth_deg,  # (B, 1)
    target_elevation_deg,  # (B, N)
    target_azimuth_deg,  # (B, N)
):
    """Relative viewpoint embedding, (B, N, 4) f32.

    Components: (d_elev, sin d_azim, cos d_azim, 0). Both shipped datasets
    feed zeros for all four angles, making this a learned constant — kept for
    API parity and for trajectories that do supply angles.
    """
    d2r = jnp.pi / 180.0
    d_e = (target_elevation_deg - input_elevation_deg) * d2r
    d_a = (target_azimuth_deg - input_azimuth_deg) * d2r
    return jnp.stack([d_e, jnp.sin(d_a), jnp.cos(d_a), jnp.zeros_like(d_a)], axis=-1)
