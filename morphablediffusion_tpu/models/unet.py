"""SD-style denoiser UNet with depth-wise 3D-aware cross-attention.

Re-creates the reference architecture exactly (so published checkpoints can
be ported) but in channels-last Flax:

  * `UNet` — ldm/modules/diffusionmodules/openaimodel.py:414-777 `UNetModel`
    with the shipped config (configs/facescape.yaml:26-42): in 8ch, model 320,
    out 4, mult (1,2,4,4), 2 res blocks/level, SpatialTransformer at
    ds 1/2/4, 8 heads, context_dim 768, legacy=False.
  * `DepthAttention` / `DepthTransformer` — ldm/models/diffusion/attention.py:
    8-84: query from the 2D feature map, key/value from the per-view frustum
    volume, softmax over the depth axis only.
  * `DepthWiseUNet` — attention.py:87-142 `DepthWiseAttention`: one
    DepthTransformer after the middle block + 9 in the decoder, selected by
    feature-map width (output_b2c map :100).

TPU notes: all feature maps are NHWC; frustum volumes are (B, D, H, W, C).
The depth softmax is a tiny D=48 reduction fused by XLA into the surrounding
1x1 convs.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from morphablediffusion_tpu.models.layers import (
    BasicTransformerBlock,
    Downsample,
    GroupNorm,
    ResBlock,
    SpatialTransformer,
    TimestepMLP,
    Upsample,
    conv,
    conv3d,
    zeros_init,
)
from morphablediffusion_tpu.ops.depth_attention import depth_attention
from morphablediffusion_tpu.ops.embeddings import timestep_embedding

Dtype = Any


class DepthAttention(nn.Module):
    """Per-pixel attention over the frustum depth axis (attention.py:8-47).

    x: (B, H, W, Cq); context: (B, D, H, W, Cc) -> (B, H, W, Cq).
    Cq must equal num_heads*head_dim's source width in the shipped UNet
    (DepthTransformer projects x to `inner` channels before attending).

    setup-style so DepthTransformer's fully-fused context path can read
    to_q/to_k/to_v weights directly (params created by the plain path at
    init; names/shapes identical to the previous compact layout).
    """

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.num_heads * self.head_dim
        dense = lambda feats: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32
        )
        # 1x1(x1) projections as Dense: nn.Conv with a unit kernel lowers to
        # a conv whose output layout forces a full relayout copy of the big
        # (B, D, H, W, C) k/v tensors before the attention kernel (~10 ms/
        # step profiled); a last-axis matmul keeps the standard layout.
        self.to_q = dense(inner)
        self.to_k = dense(inner)
        self.to_v = dense(inner)
        self.to_out = dense(inner)

    def __call__(self, x, context):
        inner = self.num_heads * self.head_dim
        # narrowed contract vs the reference: to_out projects to `inner`
        # (not the input width), identical in the shipped UNet where the
        # DepthTransformer pre-projects x to `inner` — make that explicit.
        assert x.shape[-1] == inner, (
            f"DepthAttention expects pre-projected input of width {inner}, "
            f"got {x.shape[-1]}"
        )
        q = self.to_q(x)
        k = self.to_k(context)
        v = self.to_v(context)
        out = depth_attention(q, k, v, self.num_heads)  # fused Pallas kernel
        return self.to_out(out)


class DepthTransformer(nn.Module):
    """proj_in(2D) + proj_context(3D) -> DepthAttention -> zero-out conv + skip
    (attention.py:50-84).

    out_channels: channel count of x (needed at setup time for the final
    zero-init conv; equals the UNet block width at the injection site).
    ctx_dim: frustum volume channels at this scale.
    """

    num_heads: int
    head_dim: int
    out_channels: int
    ctx_dim: int
    dtype: Dtype = jnp.float32
    int8: bool = False

    def setup(self):
        inner = self.num_heads * self.head_dim
        self.proj_in_conv = conv(inner, 1, padding=0, dtype=self.dtype,
                                 int8=self.int8)
        self.proj_in_norm = GroupNorm(8, act="silu")
        self.proj_context_conv = nn.Dense(
            self.ctx_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.proj_context_norm = GroupNorm(8, act="relu")
        self.depth_attn = DepthAttention(self.num_heads, self.head_dim,
                                         self.dtype)
        self.proj_out_norm0 = GroupNorm(8, act="relu")
        self.proj_out_conv0 = conv(inner, 3, use_bias=False, dtype=self.dtype,
                                   int8=self.int8)
        self.proj_out_norm1 = GroupNorm(8, act="relu")
        self.proj_out_conv1 = conv(self.out_channels, 3, use_bias=False,
                                   dtype=self.dtype, kernel_init=zeros_init,
                                   int8=self.int8)

    def _fused_ok(self, context, train: bool = False) -> bool:
        """Fully-fused context path: proj+GN stats folded to an affine, one
        Pallas kernel streams the raw frustum context ONCE (proj -> norm ->
        k/v -> attention all in VMEM). Profiled ~13 ms/step at width 32 for
        the unfused chain's five HBM passes over (B, 48, 32, 32, C)."""
        import jax as _jax

        from morphablediffusion_tpu.ops.depth_attention import pltpu

        if pltpu is None or _jax.default_backend() not in ("tpu", "axon"):
            return False
        if self.is_initializing():
            return False  # plain path creates all params
        inner = self.num_heads * self.head_dim
        if inner % 128 != 0:
            return False
        if train:
            # TRAINING keeps the round-2/3 W >= 8 gate: routing the W=4
            # middle-level blocks through the fused kernels' custom VJP
            # saves extra residuals and pushed the flagship batch-8 train
            # step ~100 MB over HBM (round-5 ladder re-measure). Serving
            # keeps the fold (it is what the round-4 3.58 s number bought).
            return context.shape[-2] >= 8
        # total spatial extent >= 8: the kernels tile small-W maps at H*W
        # rows (plain path folds, ctx path hb-row-blocks), so the W=4
        # middle-level blocks ride the fused path too (PERF.md round-4
        # W=4 lever study)
        return context.shape[-2] * context.shape[-3] >= 8

    def __call__(self, x, context, cfg_doubled: bool = False,
                 train: bool = False):
        inner = self.num_heads * self.head_dim
        ctx_dim = context.shape[-1]
        x_in = x
        B, Bc = x.shape[0], context.shape[0]
        # CFG-doubled batch with conditional-only context: the reference
        # feeds torch.zeros_like(v) as the unconditional source_dict
        # (morphable_diffusion.py:138-140). For an all-zero context the
        # whole depth branch collapses analytically — GroupNorm(0) = beta
        # exactly (mean 0, var 0), so k/v are depth-constant, the softmax
        # over depth is uniform, and the attention output equals v_const
        # INDEPENDENT of q. We reproduce that exactly by running the same
        # (param-shared) submodules on a single zero context of depth 1 and
        # broadcasting — skipping the (B, 48, w, w, C) projection/attention
        # work for the unconditional half (~10 ms/step at sampling).
        # `cfg_doubled` is an EXPLICIT caller contract (threaded from
        # predict_eps_cfg), not a shape heuristic: a half-batch context
        # without it is an error, never silent unconditional semantics.
        if cfg_doubled:
            assert B == 2 * Bc, (
                f"cfg_doubled expects batch {2 * Bc} (2x context), got {B}"
            )
        else:
            assert B == Bc, (
                f"batch mismatch: x {B} vs context {Bc} (pass cfg_doubled=True "
                "for the CFG doubled-batch path)"
            )
        xc = x[:Bc] if cfg_doubled else x

        h = self.proj_in_norm(self.proj_in_conv(xc))

        if self._fused_ok(context, train=train):
            from morphablediffusion_tpu.ops.depth_attention import (
                ctx_moments,
                depth_attention_ctx,
            )

            p = lambda m: m.variables["params"]
            q = self.depth_attn.to_q(h)
            mean_x, m2 = ctx_moments(context)  # CSE'd across same-width blocks
            out = depth_attention_ctx(
                q, context, mean_x, m2,
                p(self.proj_context_conv)["kernel"],
                p(self.proj_context_norm)["scale"],
                p(self.proj_context_norm)["bias"],
                p(self.depth_attn.to_k)["kernel"],
                p(self.depth_attn.to_v)["kernel"],
                self.num_heads,
            )
            h = self.depth_attn.to_out(out)
        else:
            c = self.proj_context_norm(self.proj_context_conv(context))
            h = self.depth_attn(h, c)

        if cfg_doubled:
            c_u = self.proj_context_norm(self.proj_context_conv(
                jnp.zeros((1, 1, 1, 1, ctx_dim), context.dtype)
            ))
            h_u = self.depth_attn(
                jnp.zeros((1, 1, 1, inner), x.dtype), c_u
            )  # (1,1,1,inner)
            h = jnp.concatenate(
                [h, jnp.broadcast_to(h_u, (B - Bc,) + h.shape[1:])], axis=0
            )

        h = self.proj_out_norm0(h)
        h = self.proj_out_conv0(h)
        h = self.proj_out_norm1(h)
        h = self.proj_out_conv1(h)
        return h + x_in


class DepthWiseUNet(nn.Module):
    """The full denoiser. See module docstring for the reference map.

    volume_dims: frustum-volume channel count per scale (w, w/2, w/4, w/8) —
    (64, 128, 256, 512) in the shipped configs.
    """

    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_ds: Sequence[int] = (1, 2, 4)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    volume_dims: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32
    # W8A8 int8 serving of the internal convs (ops/int8.py): ResBlocks,
    # Up/Downsample, SpatialTransformer 1x1s, DepthTransformer projections.
    # The first (input_conv) and last (out_conv) layers stay bf16 — standard
    # PTQ practice, and out_conv writes eps directly. Param tree unchanged.
    w8a8: bool = False

    @nn.compact
    def __call__(self, x, timesteps, context, source_dict: Dict[int, jnp.ndarray],
                 remat: bool = False, cfg_doubled: bool = False):
        """x: (B, H, W, in_ch); timesteps: (B,); context: (B, M, 768);
        source_dict: {width: (B, D, width, width, C)} frustum volumes.
        cfg_doubled=True declares the CFG doubled-batch contract: x/timesteps/
        context carry 2x the source_dict batch (conditional then
        unconditional halves); the DepthTransformers synthesize the
        unconditional zero-context half analytically.

        remat=True rematerializes every block under autodiff (the reference's
        `use_checkpoint` gradient checkpointing, diffusionmodules/util.py:
        102-148): activations of ResBlock/SpatialTransformer/DepthTransformer
        are recomputed in the backward pass instead of stored, trading ~1/3
        extra forward FLOPs for the activation memory of the whole UNet —
        the jax.checkpoint knob the training step uses to fit the reference's
        batch-70 recipe per chip. Inference passes remat=False (no barriers
        in the sampling graph)."""
        mc = self.model_channels
        emb = TimestepMLP(mc * 4, self.dtype, name="time_embed")(
            timestep_embedding(timesteps, mc).astype(self.dtype)
        )
        x = x.astype(self.dtype)
        context = context.astype(self.dtype)

        res_cls = nn.remat(ResBlock) if remat else ResBlock
        st_cls = nn.remat(SpatialTransformer) if remat else SpatialTransformer
        # cfg_doubled (argnum 3; 0 is the module) is Python control flow ->
        # static under remat
        dt_cls = (
            nn.remat(DepthTransformer, static_argnums=(3, 4))
            if remat else DepthTransformer
        )

        def res(ch, name):
            return res_cls(ch, self.dtype, self.w8a8, name=name)

        def st(ch, name):
            return st_cls(
                self.num_heads, ch // self.num_heads,
                self.transformer_depth, self.dtype, self.w8a8, name=name,
            )

        def depth_tf(ctx_dim, out_ch, name):
            # heads=4, dim_head=ctx//2 (attention.py:97-115)
            return dt_cls(
                num_heads=4, head_dim=ctx_dim // 2, out_channels=out_ch,
                ctx_dim=ctx_dim, dtype=self.dtype, int8=self.w8a8, name=name,
            )

        hs = []
        h = conv(mc, 3, dtype=self.dtype, name="input_conv")(x)
        hs.append(h)

        # encoder
        ds = 1
        block = 1
        for level, mult in enumerate(self.channel_mult):
            ch = mult * mc
            for _ in range(self.num_res_blocks):
                h = res(ch, f"in_{block}_res")(h, emb)
                if ds in self.attention_ds:
                    h = st(ch, f"in_{block}_attn")(h, context)
                hs.append(h)
                block += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(ch, self.dtype, self.w8a8,
                               name=f"in_{block}_down")(h)
                hs.append(h)
                block += 1
                ds *= 2

        # middle
        ch = self.channel_mult[-1] * mc
        h = res(ch, "mid_res0")(h, emb)
        h = st(ch, "mid_attn")(h, context)
        h = res(ch, "mid_res1")(h, emb)
        d3 = self.volume_dims[3]
        h = depth_tf(d3, ch, "middle_conditions")(
            h, source_dict[h.shape[-2]], cfg_doubled, remat
        )

        # decoder; DepthTransformers after output blocks 3..11
        # (attention.py:100 output_b2c)
        out_cond_ctx = {
            3: 2, 4: 2, 5: 1, 6: 1, 7: 1, 8: 0, 9: 0, 10: 0, 11: 0,
        }  # block index -> volume_dims index
        block = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            ch = mult * mc
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = res(ch, f"out_{block}_res")(h, emb)
                if ds in self.attention_ds:
                    h = st(ch, f"out_{block}_attn")(h, context)
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, self.dtype, self.w8a8,
                                 name=f"out_{block}_up")(h)
                    ds //= 2
                if block in out_cond_ctx:
                    cd = self.volume_dims[out_cond_ctx[block]]
                    h = depth_tf(cd, h.shape[-1], f"out_{block}_cond")(
                        h, source_dict[h.shape[-2]], cfg_doubled, remat
                    )
                block += 1

        h = GroupNorm(32, name="out_norm", act="silu")(h)
        h = conv(self.out_channels, 3, dtype=self.dtype, name="out_conv",
                 kernel_init=zeros_init)(h)
        return h.astype(jnp.float32)
