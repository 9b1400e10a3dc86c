"""SpatialVolumeNet orchestrator tests.

The production `construct_spatial_volume` hoists the view mean BEFORE the
vertex gather (trilinear sampling and the extractor linear both commute with
the mean — see spatial_volume.py for the measured rationale). This verifies
it is numerically identical to the straightforward formulation the reference
uses (morphable_diffusion.py:227-231): per-view 3D gathers at the vertices,
per-view extractor, mean across views.
"""

import jax
import jax.numpy as jnp
import numpy as np

from morphablediffusion_tpu.models.spatial_volume import (
    SpatialVolumeNet,
    spatial_grid_xyz,
)
from morphablediffusion_tpu.ops import geometry
from morphablediffusion_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d

import pytest

pytestmark = pytest.mark.slow



def _cameras(B, N, S):
    poses = []
    for i in range(N):
        a = 0.3 * i
        R = np.asarray([[np.cos(a), 0, -np.sin(a)], [0, 1, 0],
                        [np.sin(a), 0, np.cos(a)]], np.float32)
        t = np.asarray([0.0, 0.0, 2.0], np.float32)
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    RTs = np.broadcast_to(np.stack(poses), (B, N, 3, 4)).copy()
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = np.asarray([[S * 1.2, 0, S / 2], [0, S * 1.2, S / 2], [0, 0, 1]])
    Ks = np.broadcast_to(K, (B, N, 4, 4)).copy()
    return jnp.asarray(Ks), jnp.asarray(RTs)


def test_vertex_pipeline_matches_naive_formulation(rng):
    B, N, S, V, Nv = 2, 4, 64, 8, 40
    sv = SpatialVolumeNet(
        view_num=N, input_image_size=S, spatial_volume_size=V,
        frustum_volume_depth=8, voxel_grid_shape=(16, 16, 16),
        volume_dims=(8, 16, 32, 64), dtype=jnp.float32,
    )
    h = S // 8
    x = jnp.asarray(rng.normal(size=(B, N, h, h, 4)), jnp.float32)
    t_embed = jnp.asarray(rng.normal(size=(B, 256)), jnp.float32)
    v_embed = jnp.asarray(rng.normal(size=(B, N, 4)), jnp.float32)
    Ks, RTs = _cameras(B, N, S)
    verts = jnp.asarray(rng.uniform(-0.3, 0.3, (B, Nv, 3)), jnp.float32)
    vmask = jnp.ones((B, Nv), jnp.float32)

    params = sv.init(
        jax.random.key(0), x, t_embed, v_embed, Ks, RTs, verts, vmask,
        method="construct_spatial_volume",
    )
    bound = sv.bind(params)
    got = bound.construct_spatial_volume(
        x, t_embed, v_embed, Ks, RTs, verts, vmask
    )

    # ---- naive reference formulation with the SAME parameters ----
    L = sv.spatial_volume_length
    x_flat = x.reshape(B * N, h, h, 4)
    t_flat = jnp.broadcast_to(t_embed[:, None], (B, N, 256)).reshape(B * N, 256)
    v_flat = v_embed.reshape(B * N, 4)
    feats = bound.target_encoder(x_flat, t_flat, v_flat)
    grid_xyz = spatial_grid_xyz(V, L)
    grid_b = jnp.broadcast_to(grid_xyz[None], (B * N, V, V, V, 3))
    coords = geometry.get_warp_coordinates(
        grid_b, feats.shape[1], S, Ks.reshape(B * N, 4, 4),
        RTs.reshape(B * N, 3, 4), "perspective",
    )
    unproj = grid_sample_2d(feats, coords).reshape(B, N, V, V, V, -1)

    # per-view vertex gathers, per-view extractor, mean across views
    vert_grid = verts / L
    per_view = jnp.stack(
        [grid_sample_3d(unproj[:, n], vert_grid) for n in range(N)], axis=1
    )  # (B, N, Nv, 16)
    smpl_naive = bound.smpl_feature_extractor(per_view, pooled=False)

    vert_dhw = verts[..., ::-1]
    min_dhw = jnp.min(vert_dhw, axis=1)
    query_dhw = jnp.broadcast_to(grid_xyz[None, ..., ::-1], (B, V, V, V, 3))
    want = bound.mesh_voxel(smpl_naive, vert_dhw, min_dhw, vmask, query_dhw)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
