"""Stable Diffusion KL-f8 autoencoder (frozen first stage), channels-last.

Architecture parity with the reference's hard-coded first-stage config
(morphable_diffusion.py:399-422: ch 128, ch_mult (1,2,4,4), 2 res blocks,
z=4, double_z, no down/up attention, mid attention) and
ldm/modules/diffusionmodules/model.py (Encoder :368-461, Decoder :462-570,
ResnetBlock :82-143, AttnBlock :150-214) + ldm/models/autoencoder.py
AutoencoderKL :285-423 and DiagonalGaussianDistribution
(ldm/modules/distributions/distributions.py:24-59).

Notes:
  * Encoder downsampling uses SD's asymmetric pad ((0,1),(0,1)) + valid
    stride-2 conv.
  * GroupNorm eps is 1e-6 (SD VAE convention), stats in fp32.
  * The latent scale factor 0.18215 is applied by the caller (diffusion
    model), matching morphable_diffusion.py:420,460-471.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from morphablediffusion_tpu.models.layers import GroupNorm, conv, nearest_upsample_2d

Dtype = Any


class VAEResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm(32, epsilon=1e-6, name="norm1", act="silu")(x)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(32, epsilon=1e-6, name="norm2", act="silu")(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, 1, padding=0, dtype=self.dtype,
                     name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention (model.py:150-214)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(32, epsilon=1e-6, name="norm")(x)
        q = conv(C, 1, padding=0, dtype=self.dtype, name="q")(h)
        k = conv(C, 1, padding=0, dtype=self.dtype, name="k")(h)
        v = conv(C, 1, padding=0, dtype=self.dtype, name="v")(h)
        q = q.reshape(B, H * W, 1, C)
        k = k.reshape(B, H * W, 1, C)
        v = v.reshape(B, H * W, 1, C)
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, H, W, C)
        out = conv(C, 1, padding=0, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv(self.ch, 3, dtype=self.dtype, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(ch, self.dtype,
                                   name=f"down_{level}_block_{i}")(h)
            if level != len(self.ch_mult) - 1:
                # SD asymmetric pad + valid stride-2 conv (model.py Downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = conv(ch, 3, stride=2, padding=0, dtype=self.dtype,
                         name=f"down_{level}_downsample")(h)
        h = VAEResnetBlock(h.shape[-1], self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], self.dtype, name="mid_block_2")(h)
        h = GroupNorm(32, epsilon=1e-6, name="norm_out", act="silu")(h)
        out_ch = self.z_channels * (2 if self.double_z else 1)
        return conv(out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = conv(block_in, 3, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(block_in, self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, self.dtype, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            ch = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(ch, self.dtype, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                h = nearest_upsample_2d(h)
                h = conv(ch, 3, dtype=self.dtype, name=f"up_{level}_upsample")(h)
        h = GroupNorm(32, epsilon=1e-6, name="norm_out", act="silu")(h)
        return conv(self.out_ch, 3, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode. Caller applies the 0.18215 scale."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            z_channels=self.embed_dim, dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, dtype=self.dtype,
        )
        self.quant_conv = conv(2 * self.embed_dim, 1, padding=0,
                               dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = conv(self.embed_dim, 1, padding=0,
                                    dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> (mean, logvar) each (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, logvar = self.encode_moments(x)
        return self.decode(mean), (mean, logvar)


def sample_diagonal_gaussian(rng, mean, logvar):
    """DiagonalGaussianDistribution.sample (distributions.py:36-42)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
