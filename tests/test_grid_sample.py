"""grid_sample parity vs torch.nn.functional.grid_sample (CPU golden)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from morphablediffusion_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d  # noqa: E402


@pytest.mark.parametrize("shape,grid_shape", [((2, 7, 9, 3), (2, 5, 4, 2)), ((1, 32, 32, 16), (1, 11, 2))])
def test_grid_sample_2d_parity(rng, shape, grid_shape):
    B, H, W, C = shape
    feat = rng.normal(size=shape).astype(np.float32)
    # include in-range, boundary and out-of-range coords
    grid = rng.uniform(-1.4, 1.4, size=grid_shape).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid.reshape(B, 1, -1, 2))
    ref = torch.nn.functional.grid_sample(
        t_feat, t_grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # (B, C, 1, P)
    ref = ref[:, :, 0].permute(0, 2, 1).numpy().reshape(ours.shape)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_parity(rng):
    B, D, H, W, C = 2, 6, 5, 7, 4
    feat = rng.normal(size=(B, D, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(B, 3, 4, 5, 3)).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.asarray(feat), jnp.asarray(grid)))

    t_feat = torch.from_numpy(feat).permute(0, 4, 1, 2, 3)  # NCDHW
    t_grid = torch.from_numpy(grid)
    ref = torch.nn.functional.grid_sample(
        t_feat, t_grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # (B, C, 3, 4, 5)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_exact_corners(rng):
    feat = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    grid = np.asarray([[[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]], dtype=np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))
    np.testing.assert_allclose(out[0, 0], feat[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 1], feat[0, 3, 3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], feat[0, 3, 0], rtol=1e-6)


def test_grid_sample_3d_block_path_matches_torch(rng):
    """Force the block-gather path (8P < D*H*W) and check PyTorch
    grid_sample parity including out-of-range points."""
    import torch
    import torch.nn.functional as F

    from morphablediffusion_tpu.ops.grid_sample import grid_sample_3d

    B, D, H, W, C = 2, 8, 9, 10, 3
    P = D * H * W - 1  # below the overlap-table threshold
    feat = rng.normal(size=(B, D, H, W, C)).astype(np.float32)
    grid = (rng.random((B, P, 3)) * 2.6 - 1.3).astype(np.float32)

    out = np.asarray(grid_sample_3d(jnp.asarray(feat), jnp.asarray(grid)))

    tfeat = torch.from_numpy(feat).permute(0, 4, 1, 2, 3)  # NCDHW
    tgrid = torch.from_numpy(grid).reshape(B, P, 1, 1, 3)
    ref = F.grid_sample(tfeat, tgrid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    ref = ref[:, :, :, 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_overlap_path_matches_torch(rng):
    """Force the overlapped-table gather path (8P >= D*H*W) and check
    PyTorch grid_sample parity including out-of-range points."""
    import torch
    import torch.nn.functional as F

    from morphablediffusion_tpu.ops.grid_sample import grid_sample_3d

    B, D, H, W, C = 2, 4, 5, 6, 3
    P = 2 * D * H * W  # trigger the overlap path
    feat = rng.normal(size=(B, D, H, W, C)).astype(np.float32)
    grid = (rng.random((B, P, 3)) * 2.6 - 1.3).astype(np.float32)  # some OOB

    out = np.asarray(grid_sample_3d(jnp.asarray(feat), jnp.asarray(grid)))

    tfeat = torch.from_numpy(feat).permute(0, 4, 1, 2, 3)  # NCDHW
    tgrid = torch.from_numpy(grid).reshape(B, P, 1, 1, 3)
    ref = F.grid_sample(tfeat, tgrid, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    ref = ref[:, :, :, 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_custom_vjp_matches_autodiff(rng):
    """The sort+prefix-sum feature gradient (scatter-free, PERF.md round-4)
    must equal autodiff of the raw implementation, including out-of-range
    points (zero contribution) and duplicate/colliding coordinates."""
    import jax

    from morphablediffusion_tpu.ops.grid_sample import (
        _grid_sample_3d_impl,
        grid_sample_3d,
    )

    B, D, H, W, C, P = 2, 5, 4, 6, 3, 50
    feat = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    pts = rng.uniform(-1.3, 1.3, size=(B, P, 3)).astype(np.float32)
    pts[0, :7] = pts[0, 7:14]  # exact collisions exercise the segment sums
    grid = jnp.asarray(pts)
    cot = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)

    def loss(f, g, fn):
        return jnp.sum(fn(f, g) * cot)

    df_ref, dg_ref = jax.grad(
        lambda f, g: loss(f, g, _grid_sample_3d_impl), argnums=(0, 1)
    )(feat, grid)
    df, dg = jax.grad(
        lambda f, g: loss(f, g, grid_sample_3d), argnums=(0, 1)
    )(feat, grid)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dg), np.asarray(dg_ref),
                               rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_custom_vjp_degenerate_dim(rng):
    import jax

    from morphablediffusion_tpu.ops.grid_sample import (
        _grid_sample_3d_impl,
        grid_sample_3d,
    )

    B, D, H, W, C, P = 1, 1, 4, 4, 2, 20
    feat = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1, 1, size=(B, P, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, P, C)), jnp.float32)
    df_ref = jax.grad(
        lambda f: jnp.sum(_grid_sample_3d_impl(f, grid) * cot))(feat)
    df = jax.grad(lambda f: jnp.sum(grid_sample_3d(f, grid) * cot))(feat)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-5, atol=1e-5)
