"""Conditioning sub-networks for the spatial/frustum volumes.

Parity targets (ldm/models/diffusion/network.py):
  * NoisyTargetViewEncoder  :181-207 (+ Image2DResBlockWithTV :163-179)
  * FrustumTV3DNet          :313-347 (+ FrustumTVBlock / FrustumTVUpBlock)
  * SMPLFeatureExtractor    :7-72 — with filter_channels=[16,16] and
    num_views=16 this reduces to: per-point linear 16->16, then mean over
    the 16 views (the residual/leaky-relu branches are dead for length-2
    filter lists).
  * SpatialTime3DNet        :235-283 (only used when use_spatial_volume=True,
    which no shipped config enables; kept for capability parity).

Layout: 2D feature maps NHWC; 3D volumes (B, D, H, W, C).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from morphablediffusion_tpu.models.layers import (
    ConvTranspose3dTorch,
    GroupNorm,
    conv,
    conv3d,
)

Dtype = Any


def _dense(features, name, dtype, use_bias=True):
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32,
                    use_bias=use_bias, name=name)


class Image2DResBlockWithTV(nn.Module):
    """x + conv(x + t_proj + v_proj); conv = (GN8+SiLU+3x3) x2 (network.py:163-179)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, v):
        # t: (B, tdim), v: (B, vdim) — 1x1 convs on broadcast maps == Dense
        h = (
            x
            + _dense(self.dim, "time_embed", self.dtype)(t)[:, None, None, :]
            + _dense(self.dim, "view_embed", self.dtype)(v)[:, None, None, :]
        )
        h = GroupNorm(8, name="norm0", act="silu")(h)
        h = conv(self.dim, 3, dtype=self.dtype, name="conv0")(h)
        h = GroupNorm(8, name="norm1", act="silu")(h)
        h = conv(self.dim, 3, dtype=self.dtype, name="conv1")(h)
        return x + h


class NoisyTargetViewEncoder(nn.Module):
    """Noisy latent (B,H,W,4) + t/v embeds -> (B,H,W,out) 2D features
    (network.py:181-207)."""

    run_dim: int = 16
    output_dim: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, v):
        h = conv(self.run_dim, 3, dtype=self.dtype, name="init_conv")(x)
        for i in range(3):
            h = Image2DResBlockWithTV(self.run_dim, self.dtype,
                                      name=f"res_{i}")(h, t, v)
        h = GroupNorm(8, name="final_norm", act="silu")(h)
        return conv(self.output_dim, 3, dtype=self.dtype, name="final_conv")(h)


class SMPLFeatureExtractor(nn.Module):
    """Per-vertex linear + mean over views (network.py:7-72, specialized).

    features: (B, N_views, N_verts, C_in) -> (B, N_verts, C_out).

    With pooled=True the input is already view-averaged (B, N_verts, C_in)
    and only the linear is applied — mathematically identical because the
    per-point Conv1d and the view mean commute (mean_v(W x_v + b) =
    W mean_v(x_v) + b); the caller pools with a segment matmul to keep the
    view axis on TPU lanes (see spatial_volume.construct_spatial_volume).
    """

    features: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pooled: bool = False):
        y = _dense(self.features, "conv0", self.dtype)(x)
        return y if pooled else jnp.mean(y, axis=1)


class FrustumTVBlock(nn.Module):
    """(x + t_proj + v_proj) -> GN8 -> SiLU -> conv3 stride s (network.py:285-297)."""

    out_dim: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, v):
        dim = x.shape[-1]
        h = (
            x
            + _dense(dim, "t_conv", self.dtype)(t)[:, None, None, None, :]
            + _dense(dim, "v_conv", self.dtype)(v)[:, None, None, None, :]
        )
        h = GroupNorm(8, name="bn", act="silu")(h)
        return conv3d(self.out_dim, 3, stride=self.stride, dtype=self.dtype,
                      name="conv")(h)


class FrustumTVUpBlock(nn.Module):
    """(x + t + v) -> GN8 -> SiLU -> 2x transposed conv (network.py:299-311)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, v):
        dim = x.shape[-1]
        h = (
            x
            + _dense(dim, "t_conv", self.dtype)(t)[:, None, None, None, :]
            + _dense(dim, "v_conv", self.dtype)(v)[:, None, None, None, :]
        )
        h = GroupNorm(8, name="norm", act="silu")(h)
        return ConvTranspose3dTorch(self.out_dim, self.dtype, name="conv")(h)


class FrustumTV3DNet(nn.Module):
    """3D UNet over the (D=48, 32, 32) frustum; returns 4-scale feature dict
    keyed by spatial width (network.py:313-347)."""

    dims: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, v) -> Dict[int, jnp.ndarray]:
        d0, d1, d2, d3 = self.dims
        w = x.shape[3]
        x0 = conv3d(d0, 3, dtype=self.dtype, name="conv0")(x)
        x1 = FrustumTVBlock(d1, 2, self.dtype, name="conv1")(x0, t, v)
        x1 = FrustumTVBlock(d1, 1, self.dtype, name="conv2")(x1, t, v)
        x2 = FrustumTVBlock(d2, 2, self.dtype, name="conv3")(x1, t, v)
        x2 = FrustumTVBlock(d2, 1, self.dtype, name="conv4")(x2, t, v)
        x3 = FrustumTVBlock(d3, 2, self.dtype, name="conv5")(x2, t, v)
        x3 = FrustumTVBlock(d3, 1, self.dtype, name="conv6")(x3, t, v)

        x2 = FrustumTVUpBlock(d2, self.dtype, name="up0")(x3, t, v) + x2
        x1 = FrustumTVUpBlock(d1, self.dtype, name="up1")(x2, t, v) + x1
        x0 = FrustumTVUpBlock(d0, self.dtype, name="up2")(x1, t, v) + x0
        return {w: x0, w // 2: x1, w // 4: x2, w // 8: x3}


class SpatialTimeBlock(nn.Module):
    """(x + t_proj) -> GN8 -> SiLU -> conv3 stride s (network.py:222-233)."""

    out_dim: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        dim = x.shape[-1]
        h = x + _dense(dim, "t_conv", self.dtype)(t)[:, None, None, None, :]
        h = GroupNorm(8, name="bn", act="silu")(h)
        return conv3d(self.out_dim, 3, stride=self.stride, dtype=self.dtype,
                      name="conv")(h)


class SpatialUpTimeBlock(nn.Module):
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        dim = x.shape[-1]
        h = x + _dense(dim, "t_conv", self.dtype)(t)[:, None, None, None, :]
        h = GroupNorm(8, name="norm", act="silu")(h)
        return ConvTranspose3dTorch(self.out_dim, self.dtype, name="conv")(h)


class SpatialTime3DNet(nn.Module):
    """3D UNet over the 32^3 multi-view volume (network.py:235-283)."""

    dims: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t):
        d0, d1, d2, d3 = self.dims
        x = conv3d(d0, 3, dtype=self.dtype, name="init_conv")(x)
        conv0 = SpatialTimeBlock(d0, 1, self.dtype, name="conv0")(x, t)

        x = SpatialTimeBlock(d1, 2, self.dtype, name="conv1")(conv0, t)
        x = SpatialTimeBlock(d1, 1, self.dtype, name="conv2_0")(x, t)
        conv2 = SpatialTimeBlock(d1, 1, self.dtype, name="conv2_1")(x, t)

        x = SpatialTimeBlock(d2, 2, self.dtype, name="conv3")(conv2, t)
        x = SpatialTimeBlock(d2, 1, self.dtype, name="conv4_0")(x, t)
        conv4 = SpatialTimeBlock(d2, 1, self.dtype, name="conv4_1")(x, t)

        x = SpatialTimeBlock(d3, 2, self.dtype, name="conv5")(conv4, t)
        x = SpatialTimeBlock(d3, 1, self.dtype, name="conv6_0")(x, t)
        x = SpatialTimeBlock(d3, 1, self.dtype, name="conv6_1")(x, t)

        x = conv4 + SpatialUpTimeBlock(d2, self.dtype, name="conv7")(x, t)
        x = conv2 + SpatialUpTimeBlock(d1, self.dtype, name="conv8")(x, t)
        x = conv0 + SpatialUpTimeBlock(d0, self.dtype, name="conv9")(x, t)
        return x
