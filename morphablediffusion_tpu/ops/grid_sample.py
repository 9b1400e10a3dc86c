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

import jax
import jax.numpy as jnp
from jax import lax


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


def _grid_sample_3d_impl(feat, grid):
    """feat: (B, D, H, W, C); grid: (B, ..., 3) with (x, y, z) in [-1, 1].

    x indexes W, y indexes H, z indexes D (PyTorch convention).
    Returns (B, ..., C); zeros outside the volume.

    Implemented as ONE `lax.gather` of a (2, 2, 2, C) corner block per point
    instead of 8 independent row gathers: TPU gathers are transaction-bound,
    so fetching all 8 corners in a single contiguous-C slice is ~8x fewer
    transactions for the hot frustum-resampling path (measured ~17 ms/step
    -> see PERF.md). Zero padding falls out of the hat-weight formulation:
    the block start is clamped to the volume, tap weights are computed
    against the ACTUAL (clamped) tap positions, and a hat weight
    max(0, 1 - |coord - tap|) is zero for any tap the true footprint does
    not touch — so out-of-range mass is dropped exactly as in PyTorch.
    """
    B, D, H, W, C = feat.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 3)

    # coordinates are defined by the ORIGINAL extents (align_corners over
    # the true volume) before any degenerate-dim padding below
    ix = _unnormalize(g[..., 0], W)
    iy = _unnormalize(g[..., 1], H)
    iz = _unnormalize(g[..., 2], D)

    if min(D, H, W) < 2:
        # degenerate volumes (any spatial extent 1): zero-pad that axis to 2
        # so the fixed (2,2,2) footprint exists. The extra tap sits at index
        # 1 where the hat weight max(0, 1-|coord-1|) is 0 for the only legal
        # coordinate (0), so the padding never contributes.
        feat = jnp.pad(
            feat,
            [(0, 0)] + [(0, max(0, 2 - s)) for s in (D, H, W)] + [(0, 0)],
        )
        B, D, H, W, C = feat.shape

    # block starts, clamped so the (2,2,2) footprint is always in-bounds
    sx = jnp.clip(jnp.floor(ix), 0, max(W - 2, 0)).astype(jnp.int32)
    sy = jnp.clip(jnp.floor(iy), 0, max(H - 2, 0)).astype(jnp.int32)
    sz = jnp.clip(jnp.floor(iz), 0, max(D - 2, 0)).astype(jnp.int32)

    P = g.shape[1]
    if P >= D * H * W and min(D, H, W) >= 2:
        # Overlapped-table path for many-points-per-voxel workloads (the
        # frustum resample: 786k points from a 32^3 volume). Build a
        # (D-1, H-1, W-1, 8C) table whose cell (z, y, x) holds ALL 8 corners
        # of that lattice cell as contiguous channels; each point then costs
        # ONE contiguous 8C-row gather (1 KB at C=64) instead of a strided
        # (2,2,2,C) slice of four 256 B runs. TPU gathers are transaction-
        # bound, so fewer/longer runs win; the table build is a single
        # streaming concat (~8x volume bytes), which only amortizes when
        # P >= V — extending it to the per-vertex sampling path (P=5120,
        # V=32768) was MEASURED SLOWER (4.42 s vs 4.25 s avatar): at sub-
        # voxel point density the 8-slice concat dominates the saved
        # transactions.
        corners = [
            feat[:, dz : dz + D - 1, dy : dy + H - 1, dx : dx + W - 1]
            for dz in (0, 1)
            for dy in (0, 1)
            for dx in (0, 1)
        ]
        table = jnp.concatenate(corners, axis=-1).reshape(
            B, (D - 1) * (H - 1) * (W - 1), 8 * C
        )
        flat_idx = (sz * (H - 1) + sy) * (W - 1) + sx  # starts already <= dim-2
        rows = jnp.take_along_axis(table, flat_idx[..., None], axis=1)
        blocks = rows.reshape(B, P, 2, 2, 2, C)
    else:
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )

        def gather_one(f, idx):
            return lax.gather(
                f, idx, dnums, slice_sizes=(2, 2, 2, C),
                mode=lax.GatherScatterMode.CLIP,
            )  # (P, 2, 2, 2, C)

        idx = jnp.stack([sz, sy, sx], axis=-1)  # (B, P, 3)
        blocks = jax.vmap(gather_one)(feat, idx)

    # hat weights at the actual tap positions (start, start+1) per axis
    def taps(coord, start):
        t0 = jnp.maximum(0.0, 1.0 - jnp.abs(coord - start))
        t1 = jnp.maximum(0.0, 1.0 - jnp.abs(coord - (start + 1)))
        return t0, t1

    wx0, wx1 = taps(ix, sx)
    wy0, wy1 = taps(iy, sy)
    wz0, wz1 = taps(iz, sz)

    wz = jnp.stack([wz0, wz1], axis=-1)  # (B, P, 2)
    wy = jnp.stack([wy0, wy1], axis=-1)
    wx = jnp.stack([wx0, wx1], axis=-1)
    w = (
        wz[..., :, None, None] * wy[..., None, :, None] * wx[..., None, None, :]
    ).astype(feat.dtype)  # (B, P, 2, 2, 2)
    out = jnp.einsum("bpzyx,bpzyxc->bpc", w, blocks)
    return out.reshape(out_shape)


# --------------------------------------------------------------------------- #
# Custom VJP: scatter-free feature gradient.
#
# Autodiff of the trilinear gather produces `lax.scatter_add` with
# OVERLAPPING (2,2,2,C) windows, which XLA/TPU lowers to a SEQUENTIAL
# while-loop — one iteration per point. Profiled on the training step
# (PERF.md round-4): 262k-iteration loops updating the (B,48,48,48,64)
# mesh-voxel grid and the 32^3 spatial volume dominated the whole step
# (~3 s of a 3.3 s step at batch 8). The reference never sees this because
# cuDNN/CUDA scatter-add is atomic-parallel (torch grid_sample backward).
#
# TPU-native replacement (sort + prefix-sum + gather, all parallel):
#   1. each (point, corner) pair contributes w * g[p] to ONE voxel id;
#   2. argsort the 8P ids (bitonic, vectorized);
#   3. exclusive cumsum of the sorted contributions over fp32;
#   4. per-voxel sums = csum[bounds[v+1]] - csum[bounds[v]] with
#      bounds = searchsorted(ids_sorted, arange(V+1)) — binary searches
#      and take_along_axis gathers only. No scatter anywhere.
# --------------------------------------------------------------------------- #


def _gs3d_corner_data(grid, feat_shape):
    """Per-(point, corner) voxel ids and trilinear weights.

    Returns ids (B, 8, P) int32 into the PADDED flat volume, w (B, 8, P)
    fp32 — exactly the weights the forward's hat-tap formulation uses
    (out-of-range points get zero weight, matching CLIP-mode semantics).
    """
    B, D0, H0, W0, C = feat_shape
    g = grid.reshape(B, -1, 3)
    ix = _unnormalize(g[..., 0], W0)
    iy = _unnormalize(g[..., 1], H0)
    iz = _unnormalize(g[..., 2], D0)
    D, H, W = max(D0, 2), max(H0, 2), max(W0, 2)
    sx = jnp.clip(jnp.floor(ix), 0, W - 2).astype(jnp.int32)
    sy = jnp.clip(jnp.floor(iy), 0, H - 2).astype(jnp.int32)
    sz = jnp.clip(jnp.floor(iz), 0, D - 2).astype(jnp.int32)

    def taps(coord, start):
        t0 = jnp.maximum(0.0, 1.0 - jnp.abs(coord - start))
        t1 = jnp.maximum(0.0, 1.0 - jnp.abs(coord - (start + 1)))
        return t0, t1

    wx = taps(ix, sx)
    wy = taps(iy, sy)
    wz = taps(iz, sz)
    ids, ws = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ids.append(((sz + dz) * H + (sy + dy)) * W + (sx + dx))
                ws.append(wz[dz] * wy[dy] * wx[dx])
    return (jnp.stack(ids, axis=1), jnp.stack(ws, axis=1).astype(jnp.float32),
            (D, H, W))


def _gs3d_dfeat(grid, g_out, feat_shape, feat_dtype):
    """d(out)/d(feat) pullback without lax.scatter (see header comment)."""
    B, D0, H0, W0, C = feat_shape
    gc = g_out.reshape(B, -1, C)
    P = gc.shape[1]
    ids8, w8, (D, H, W) = _gs3d_corner_data(grid, feat_shape)
    N = 8 * P
    ids = ids8.reshape(B, N)
    w = w8.reshape(B, N)

    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    w_s = jnp.take_along_axis(w, order, axis=1)
    pidx = order % P  # corner-major layout: entry n belongs to point n % P
    g_s = jnp.take_along_axis(
        gc.astype(jnp.float32), pidx[..., None], axis=1
    )
    u = g_s * w_s[..., None]                                  # (B, N, C) f32
    csum = jnp.cumsum(u, axis=1)
    csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=1)

    V = D * H * W
    bounds = jax.vmap(
        lambda a: jnp.searchsorted(a, jnp.arange(V + 1, dtype=jnp.int32))
    )(ids_s).astype(jnp.int32)                                # (B, V+1)
    lo = jnp.take_along_axis(csum, bounds[:, :-1, None], axis=1)
    hi = jnp.take_along_axis(csum, bounds[:, 1:, None], axis=1)
    dfeat = (hi - lo).reshape(B, D, H, W, C)[:, :D0, :H0, :W0]
    return dfeat.astype(feat_dtype)


@jax.custom_vjp
def grid_sample_3d(feat, grid):
    return _grid_sample_3d_impl(feat, grid)


grid_sample_3d.__doc__ = _grid_sample_3d_impl.__doc__


def _gs3d_fwd(feat, grid):
    return _grid_sample_3d_impl(feat, grid), (feat, grid)


def _gs3d_bwd(res, g_out):
    feat, grid = res
    dfeat = _gs3d_dfeat(grid, g_out, feat.shape, feat.dtype)
    # coordinate gradient via autodiff with feat held constant: the pullback
    # w.r.t. grid only touches the (elementwise) hat weights and the gathered
    # corner blocks — gathers, never scatters
    _, pull = jax.vjp(lambda gr: _grid_sample_3d_impl(feat, gr), grid)
    (dgrid,) = pull(g_out)
    return dfeat, dgrid


grid_sample_3d.defvjp(_gs3d_fwd, _gs3d_bwd)
