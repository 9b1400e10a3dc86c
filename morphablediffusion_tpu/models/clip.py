"""OpenAI CLIP ViT-L/14 image tower (frozen conditioning encoder).

Parity target: ldm/modules/encoders/modules.py:343-382
`FrozenCLIPImageEmbedder` — which wraps `clip.load('ViT-L/14').visual` and
returns the 768-d projected class token as (B, 1, 768).

Architecture (OpenAI CLIP VisionTransformer): 14x14 patchify conv (no bias)
-> prepend class embedding -> add positional embedding (257 tokens) ->
pre-LN -> 24 pre-norm transformer blocks (width 1024, 16 heads, GELU MLP x4)
-> post-LN on class token -> 1024->768 projection (no bias).

Preprocessing matches the reference: input in [-1, 1], bicubic resize to
224 (align_corners=True, no antialias), then CLIP mean/std normalize.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip(x):
    """x: (B, H, W, 3) in [-1, 1] -> (B, 224, 224, 3) CLIP-normalized.

    Bicubic resize without antialias (kornia align_corners=True ~ jax
    'cubic' resize on the same grid; sub-pixel differences are negligible
    for a 256->224 downscale of a frozen encoder input).
    """
    x = jax.image.resize(x, (x.shape[0], 224, 224, x.shape[-1]), method="cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype)
    return (x - mean) / std


class CLIPAttention(nn.Module):
    num_heads: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.num_heads
        q = q.reshape(B, L, self.num_heads, hd)
        k = k.reshape(B, L, self.num_heads, hd)
        v = v.reshape(B, L, self.num_heads, hd)
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, L, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class CLIPBlock(nn.Module):
    num_heads: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        d = x.dtype
        x = x + CLIPAttention(self.num_heads, self.dtype, name="attn")(
            ln("ln_1")(x).astype(d)
        )
        h = ln("ln_2")(x).astype(d)
        C = x.shape[-1]
        h = nn.Dense(C * 4, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc")(h)
        # OpenAI CLIP uses QuickGELU: x * sigmoid(1.702 x)
        h = h * nn.sigmoid(1.702 * h)
        h = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_proj")(h)
        return x + h


class CLIPImageEncoder(nn.Module):
    """ViT-L/14 image tower. __call__ takes [-1,1] images, returns (B, 1, 768)."""

    width: int = 1024
    layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    output_dim: int = 768
    image_size: int = 224
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = preprocess_clip(x).astype(self.dtype)
        B = x.shape[0]
        n_patches = (self.image_size // self.patch_size) ** 2

        h = nn.Conv(
            self.width,
            kernel_size=(self.patch_size,) * 2,
            strides=(self.patch_size,) * 2,
            use_bias=False,
            padding=0,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_conv",
        )(x)
        h = h.reshape(B, n_patches, self.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (n_patches + 1, self.width), jnp.float32)
        cls_tok = jnp.broadcast_to(cls.astype(h.dtype), (B, 1, self.width))
        h = jnp.concatenate([cls_tok, h], axis=1) + pos.astype(h.dtype)

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_pre")(h).astype(self.dtype)
        for i in range(self.layers):
            h = CLIPBlock(self.num_heads, self.dtype, name=f"block_{i}")(h)

        cls_out = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                               name="ln_post")(h[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (self.width, self.output_dim), jnp.float32)
        out = (cls_out @ proj).astype(jnp.float32)
        return out[:, None, :]  # (B, 1, 768)
