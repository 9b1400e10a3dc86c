"""Bilinear / trilinear grid sampling, channels-last, PyTorch-parity.

Matches `torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)` — the only configuration the
reference uses (morphable_diffusion.py:218,229,255,315) — bit-for-purpose,
with NHWC/NDHWC layout and grid coordinates (x, y[, z]) in [-1, 1] on the
last axis.

Implemented as corner gathers + fused multiply-adds; XLA lowers the gathers
to dynamic-slice batches that pipeline well on TPU. A Pallas kernel for the
3D case (the hot frustum resampling path) can be slotted in behind the same
interface.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=True: -1 -> 0, +1 -> size-1."""
    return (coord + 1.0) * ((size - 1) / 2.0)


def _hat_weights(coord, size):
    """(B, P) unnormalized coords -> (B, P, size) bilinear 'hat' weights.

    w[p, i] = max(0, 1 - |coord[p] - i|): exactly the two-tap bilinear
    weighting, and 0 for taps outside the grid — which reproduces
    padding_mode='zeros' (out-of-range mass is simply dropped).
    """
    idx = jnp.arange(size, dtype=coord.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - idx))


def grid_sample_2d_matmul(feat, grid):
    """Bilinear 2D sampling as two MXU contractions (no gathers).

    TPU gathers with narrow rows run at memory-latency speed; for the
    volume-unprojection path (small 32x32 source maps, ~32k points per view)
    the separable form out[p] = sum_y wy[p,y] * (sum_x wx[p,x] F[y,x,:]) is
    ~25x faster. Numerics match grid_sample_2d to float rounding.
    """
    B, H, W, C = feat.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 2).astype(jnp.float32)

    wx = _hat_weights(_unnormalize(g[..., 0], W), W)  # (B, P, W)
    wy = _hat_weights(_unnormalize(g[..., 1], H), H)  # (B, P, H)

    # contract y first: (B, P, H) @ (B, H, W*C) -> (B, P, W, C)
    fy = jnp.einsum("bph,bhwc->bpwc", wy.astype(feat.dtype), feat)
    out = jnp.einsum("bpw,bpwc->bpc", wx.astype(feat.dtype), fy)
    return out.reshape(out_shape)


def grid_sample_2d(feat, grid):
    """feat: (B, H, W, C); grid: (B, ..., 2) with (x, y) in [-1, 1].

    Returns (B, ..., C). Out-of-bounds reads contribute zero (padding zeros).
    Small source maps route through the gather-free matmul formulation.
    """
    B, H, W, C = feat.shape
    if H * W <= 4096:
        return grid_sample_2d_matmul(feat, grid)
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 2)

    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def corner(dy, dx):
        cy = iy0 + dy
        cx = ix0 + dx
        valid = (cy >= 0) & (cy <= H - 1) & (cx >= 0) & (cx <= W - 1)
        cyc = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        cxc = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        # batched gather: index feat[b] at (cy, cx) per point
        idx = cyc * W + cxc  # (B, P)
        flat = feat.reshape(B, H * W, C)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(feat.dtype)

    w00 = ((1 - ty) * (1 - tx))[..., None].astype(feat.dtype)
    w01 = ((1 - ty) * tx)[..., None].astype(feat.dtype)
    w10 = (ty * (1 - tx))[..., None].astype(feat.dtype)
    w11 = (ty * tx)[..., None].astype(feat.dtype)

    out = (
        corner(0, 0) * w00
        + corner(0, 1) * w01
        + corner(1, 0) * w10
        + corner(1, 1) * w11
    )
    return out.reshape(out_shape)


def grid_sample_3d(feat, grid):
    """feat: (B, D, H, W, C); grid: (B, ..., 3) with (x, y, z) in [-1, 1].

    x indexes W, y indexes H, z indexes D (PyTorch convention).
    Returns (B, ..., C); zeros outside the volume.
    """
    B, D, H, W, C = feat.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 3)

    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    iz = _unnormalize(g[..., 2], D)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    iz0 = jnp.floor(iz)
    tx = ix - ix0
    ty = iy - iy0
    tz = iz - iz0

    flat = feat.reshape(B, D * H * W, C)

    def corner(dz, dy, dx):
        cz = iz0 + dz
        cy = iy0 + dy
        cx = ix0 + dx
        valid = (
            (cz >= 0)
            & (cz <= D - 1)
            & (cy >= 0)
            & (cy <= H - 1)
            & (cx >= 0)
            & (cx <= W - 1)
        )
        czc = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
        cyc = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        cxc = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        idx = (czc * H + cyc) * W + cxc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(feat.dtype)

    wx = (1 - tx, tx)
    wy = (1 - ty, ty)
    wz = (1 - tz, tz)
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (wz[dz] * wy[dy] * wx[dx])[..., None].astype(feat.dtype)
                out = out + corner(dz, dy, dx) * w
    return out.reshape(out_shape)
