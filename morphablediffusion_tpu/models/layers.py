"""Shared NN building blocks: norms, convs, attention, transformer blocks.

These re-create the behavior of the reference's layer zoo
(ldm/modules/diffusionmodules/openaimodel.py ResBlock/Up/Downsample,
ldm/modules/attention.py CrossAttention/BasicTransformerBlock/
SpatialTransformer) in idiomatic Flax with channels-last layout.

Numerics notes:
  * GroupNorm statistics are always computed in float32 (the reference's
    GroupNorm32 does the same), outputs cast back to the module dtype.
  * Attention uses `jax.nn.dot_product_attention` so XLA can pick the fused
    TPU path; softmax accumulates in fp32.
  * "zero" output convs are zero-initialised exactly like the reference's
    `zero_module` (openaimodel.py:174-180) — critical for finetune stability.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

zeros_init = nn.initializers.zeros


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics; fused Pallas kernel on TPU.

    `act` fuses the following nonlinearity into the same kernel pass
    (one HBM read instead of stats-pass + normalize-pass + activation).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x, shift=None):
        from morphablediffusion_tpu.ops.group_norm import (
            group_norm,
            group_norm_shifted,
        )

        C = x.shape[-1]
        if C % self.num_groups != 0:
            # fail loudly: the segment-matrix formulation would silently
            # produce NaN stats for C < num_groups (e.g. a too-narrow VAE)
            raise ValueError(
                f"GroupNorm: channels {C} not divisible by "
                f"num_groups {self.num_groups}")
        gamma = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if shift is not None:
            # GroupNorm(x + shift[:, None, None, :]) with the add folded into
            # the statistics/affine — no materialized shifted tensor (the
            # ResBlock time-embedding path; see group_norm_shifted)
            return group_norm_shifted(x, shift, gamma, beta, self.num_groups,
                                      self.epsilon, self.act)
        return group_norm(x, gamma, beta, self.num_groups, self.epsilon,
                          self.act)


class Conv8(nn.Module):
    """W8A8 int8 serving conv, param-tree-compatible with `nn.Conv`.

    Same "kernel"/"bias" parameters (fp32, identical shapes/inits), so any
    checkpoint trained or imported for the bf16 path loads unchanged; the
    quantization (ops/int8.py) happens in-graph from the fp32 weights and is
    hoisted out of the sampler's scan by XLA as loop-invariant.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    pad: int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        from morphablediffusion_tpu.ops.int8 import conv2d_w8a8

        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", zeros_init, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return conv2d_w8a8(x, kernel, bias, stride=self.stride,
                           padding=self.pad, out_dtype=self.dtype)


def conv(features, kernel=3, stride=1, padding=None, use_bias=True, name=None,
         dtype=jnp.float32, kernel_init=None, int8=False):
    """NHWC/NDHWC conv; padding defaults to torch-style (k-1)//2 on each side.

    int8=True returns the param-compatible W8A8 serving conv (Conv8)."""
    if padding is None:
        padding = (kernel - 1) // 2
    if int8:
        return Conv8(
            features, kernel_size=kernel, stride=stride, pad=padding,
            use_bias=use_bias, dtype=dtype, name=name,
            **({"kernel_init": kernel_init} if kernel_init is not None else {}),
        )
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features,
        kernel_size=(kernel,) * 2,
        strides=(stride,) * 2,
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        **kwargs,
    )


def conv3d(features, kernel=3, stride=1, padding=None, use_bias=True, name=None,
           dtype=jnp.float32, kernel_init=None):
    if padding is None:
        padding = (kernel - 1) // 2
    kwargs = {}
    if kernel_init is not None:
        kwargs["kernel_init"] = kernel_init
    return nn.Conv(
        features,
        kernel_size=(kernel,) * 3,
        strides=(stride,) * 3,
        padding=padding,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        **kwargs,
    )


class ConvTranspose3dTorch(nn.Module):
    """3D transposed conv matching torch ConvTranspose3d(k=3, s=2, p=1, op=1).

    Output is exactly 2x the input on every spatial dim. The kernel parameter
    is stored conv-style (k, k, k, in, out), already spatially flipped relative
    to torch layout; the weight importer handles the transpose+flip.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, D, H, W, C)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros_init, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((1, 2), (1, 2), (1, 2)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + bias.astype(self.dtype)


def nearest_upsample_2d(x):
    """2x nearest-neighbour upsample, NHWC."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


class Upsample(nn.Module):
    """Nearest 2x + 3x3 conv (openaimodel.py:92-120)."""

    features: int
    dtype: Dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2d(x)
        return conv(self.features, 3, dtype=self.dtype, name="conv",
                    int8=self.int8)(x)


class Downsample(nn.Module):
    """Stride-2 3x3 conv (openaimodel.py:135-161)."""

    features: int
    dtype: Dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        return conv(self.features, 3, stride=2, dtype=self.dtype, name="op",
                    int8=self.int8)(x)


class ResBlock(nn.Module):
    """SD UNet residual block (openaimodel.py:164-276), NHWC.

    GN(32) -> SiLU -> conv3x3 -> +time_mlp(emb) -> GN -> SiLU -> zero conv3x3,
    with 1x1 (or identity) skip. use_scale_shift_norm=False path only (the
    shipped configs never enable it). int8=True runs the convs W8A8
    (serving; see ops/int8.py).
    """

    out_channels: int
    dtype: Dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm(32, name="norm_in", act="silu")(x)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="conv_in",
                 int8=self.int8)(h)
        emb_out = nn.Dense(
            self.out_channels, dtype=self.dtype, param_dtype=jnp.float32,
            name="emb_proj",
        )(nn.silu(emb))
        h = GroupNorm(32, name="norm_out", act="silu")(h, shift=emb_out)
        h = conv(
            self.out_channels, 3, dtype=self.dtype, name="conv_out",
            kernel_init=zeros_init, int8=self.int8,
        )(h)
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, 1, padding=0, dtype=self.dtype,
                     name="skip", int8=self.int8)(x)
        return x + h


def attention(q, k, v, num_heads):
    """Multi-head attention core. q/k/v: (B, L, H*D) -> (B, Lq, H*D).

    Self-attention at L >= 1024 runs the Pallas TPU flash-attention kernel
    with measured block sizes (block_q=block_k=1024): the XLA path
    materializes the (B, H, L, L) fp32 logits in HBM (~1 GB per block here).
    Measured on v5e per call at B=32, H=8, L=1024, hd=40: XLA ~3.0 ms,
    flash(defaults) ~8.4 ms, flash(1024/1024) ~0.95 ms. Shorter L (256/64)
    and the L_kv=1 CLIP cross-attention stay on XLA, which wins there.
    MDTPU_NO_FLASH_ATTENTION=1 forces the XLA path everywhere.
    """
    B, Lq, inner = q.shape
    Lk = k.shape[1]
    head_dim = inner // num_heads
    q = q.reshape(B, Lq, num_heads, head_dim)
    k = k.reshape(B, Lk, num_heads, head_dim)
    v = v.reshape(B, Lk, num_heads, head_dim)
    import os

    use_flash = (
        jax.default_backend() in ("tpu", "axon")
        and min(Lq, Lk) >= 1024
        and Lq % 1024 == 0
        and Lk % 1024 == 0
        and not os.environ.get("MDTPU_NO_FLASH_ATTENTION")
    )
    if use_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        # measured per call at B=32, H=8, L=1024, hd=40: 1024/1024 0.95 ms,
        # 512/1024 1.14, 256/1024 1.23, 512/512 1.28; padding hd 40->128
        # does NOT help (the kernel's lane padding already covers it)
        bq, bk = 1024, 1024
        bs = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_q_dkv=bq, block_k_dkv=bk,
            block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
        )
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), sm_scale=head_dim**-0.5,
            block_sizes=bs,
        ).transpose(0, 2, 1, 3)
    else:
        out = jax.nn.dot_product_attention(q, k, v)
    return out.reshape(B, Lq, inner)


class CrossAttention(nn.Module):
    """ldm/modules/attention.py:161-203. Self-attention when context is None."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        to_q = dense(inner, "to_q", False)
        to_k = dense(inner, "to_k", False)
        to_v = dense(inner, "to_v", False)
        to_out = dense(x.shape[-1], "to_out", True)
        if context.shape[1] == 1:
            # Single-key attention (the (B, 1, 768) CLIP context,
            # morphable_diffusion.py:482): softmax over one logit is
            # identically 1 for every query, so the attention output is
            # to_v(context) broadcast over Lq — to_q, the attention core,
            # and the per-position to_out all cancel exactly. This removes
            # two (B, Lq, C) x (C, C) matmuls per transformer site; the
            # general path reproduces it bit-for-bit with the context
            # duplicated to two identical keys (tests/test_layers.py).
            if self.is_initializing():
                _ = to_q(x[:, :1])
                _ = to_k(context)
            out = to_out(to_v(context))  # (B, 1, C_x)
            return jnp.broadcast_to(out, x.shape[:-1] + (out.shape[-1],))
        q = to_q(x)
        k = to_k(context)
        v = to_v(context)
        out = attention(q, k, v, self.num_heads)
        return to_out(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (attention.py FeedForward with glu=True), mult=4."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * 4
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn(context) -> GEGLU FF, pre-LN (attention.py:248-269)."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                       name=name)
        d = x.dtype
        x = CrossAttention(self.num_heads, self.head_dim, self.dtype,
                           name="attn1")(ln("norm1")(x).astype(d)) + x
        x = CrossAttention(self.num_heads, self.head_dim, self.dtype,
                           name="attn2")(ln("norm2")(x).astype(d), context) + x
        x = GEGLUFeedForward(self.dtype, name="ff")(ln("norm3")(x).astype(d)) + x
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 in -> transformer blocks on (B, HW, C) -> zero 1x1 out + skip
    (attention.py:291-336)."""

    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    int8: bool = False

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        inner = self.num_heads * self.head_dim
        h = GroupNorm(32, epsilon=1e-6, name="norm")(x)
        h = conv(inner, 1, padding=0, dtype=self.dtype, name="proj_in",
                 int8=self.int8)(h)
        h = h.reshape(B, H * W, inner)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.dtype,
                name=f"block_{i}",
            )(h, context)
        h = h.reshape(B, H, W, inner)
        h = conv(C, 1, padding=0, dtype=self.dtype, name="proj_out",
                 kernel_init=zeros_init, int8=self.int8)(h)
        return h + x


class TimestepMLP(nn.Module):
    """Linear -> SiLU -> Linear time-embedding MLP."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                     name="dense0")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32,
                        name="dense1")(h)
