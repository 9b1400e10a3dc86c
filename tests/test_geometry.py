"""Geometry parity vs an independent numpy transcription of the reference
formulas (ldm/models/diffusion/utils.py) in the reference's own (B, 3, N)
layout — validates our channels-last reformulation."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from morphablediffusion_tpu.ops import geometry


def rand_pose(rng):
    R = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=(3, 1)) * 0.3 + np.asarray([[0], [0], [4.0]])
    return np.concatenate([R, t], axis=1).astype(np.float32)


def rand_K(rng, size=256):
    f = 300 + rng.uniform(-20, 20)
    K = np.asarray(
        [[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], dtype=np.float32
    )
    return K


def ref_project_perspective(points_b3n, K, pose, length, ratio):
    """Reference formula, (B,3,N) layout: scale @ K @ pose, divide, normalize."""
    scale = np.diag([ratio, ratio, 1.0]).astype(np.float64)
    prj = scale @ K @ pose  # 3x4
    src = prj[:3, :3] @ points_b3n + prj[:3, 3:]
    div = np.maximum(src[2:3], 1e-4)
    xy = src[:2] / div
    return (xy / ((length - 1) / 2.0) - 1.0).T  # (N, 2)


def test_project_perspective_parity(rng):
    B, N = 3, 17
    size, warp = 256, 32
    poses = np.stack([rand_pose(rng) for _ in range(B)])
    Ks = np.stack([rand_K(rng) for _ in range(B)])
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4

    proj = geometry.construct_project_matrix(
        warp / size, warp / size, jnp.asarray(Ks), jnp.asarray(poses)
    )
    ours = np.asarray(
        geometry.project_and_normalize(jnp.asarray(pts), proj, warp)
    )
    for b in range(B):
        expect = ref_project_perspective(
            pts[b].T.astype(np.float64), Ks[b], poses[b], warp, warp / size
        )
        np.testing.assert_allclose(ours[b], expect, rtol=1e-3, atol=1e-4)


def test_project_orthographic_parity(rng):
    B, N = 2, 11
    poses = np.stack([rand_pose(rng) for _ in range(B)])
    # orthographic K maps directly to [-1,1]; 4x4 as in thuman meta
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = 1.0 / 0.6
    Ks = np.stack([K4] * B)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.4

    proj = geometry.construct_project_matrix(
        1.0, 1.0, jnp.asarray(Ks), jnp.asarray(poses), "orthographic"
    )
    ours = np.asarray(
        geometry.project_and_normalize(jnp.asarray(pts), proj, 32, "orthographic")
    )
    for b in range(B):
        pose44 = np.concatenate([poses[b], [[0, 0, 0, 1]]], axis=0)
        prj = Ks[b] @ pose44
        src = prj[:3, :3] @ pts[b].T.astype(np.float64) + prj[:3, 3:]
        np.testing.assert_allclose(ours[b], src[:2].T, rtol=1e-4, atol=1e-5)


def test_near_far_unit_sphere(rng):
    # camera at distance 4 looking at origin: near=3, far=5
    poses = np.stack([rand_pose(rng) for _ in range(4)])
    # construct look-at-origin poses: t = -R @ C with C = 4 * unit dir
    for i in range(4):
        R = poses[i, :3, :3]
        C = R.T @ np.asarray([0, 0, -4.0])  # camera center 4 units "behind" z
        poses[i, :3, 3] = -R @ C
    near, far = geometry.near_far_from_unit_sphere(jnp.asarray(poses))
    np.testing.assert_allclose(np.asarray(near)[:, 0], 3.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(far)[:, 0], 5.0, rtol=1e-4)


def test_camera_positions(rng):
    pose = rand_pose(rng)
    C = np.asarray(geometry.camera_positions(jnp.asarray(pose[None])))[0]
    # reproject: R @ C + t == 0
    np.testing.assert_allclose(
        pose[:3, :3] @ C + pose[:3, 3], 0.0, atol=1e-5
    )


def test_create_target_volume_perspective_roundtrip(rng):
    """Each generated world point must project back to its own pixel & depth."""
    B, D, S, size = 2, 5, 8, 256
    poses = np.stack([rand_pose(rng) for _ in range(B)])
    Ks = np.stack([rand_K(rng) for _ in range(B)])
    near = np.full((B,), 3.0, np.float32)
    far = np.full((B,), 5.0, np.float32)

    xyz, depth = geometry.create_target_volume(
        D, S, size, jnp.asarray(poses), jnp.asarray(Ks), jnp.asarray(near), jnp.asarray(far)
    )
    xyz = np.asarray(xyz)  # (B, D, S, S, 3)
    depth = np.asarray(depth)
    ratio = S / size
    for b in range(B):
        prj = np.diag([ratio, ratio, 1.0]) @ Ks[b] @ poses[b]
        for d in [0, D - 1]:
            for y in [0, S - 1]:
                for x in [0, S // 2]:
                    p = prj[:3, :3] @ xyz[b, d, y, x] + prj[:3, 3]
                    np.testing.assert_allclose(p[2], depth[b, d, y, x], rtol=1e-3)
                    np.testing.assert_allclose(p[:2] / p[2], [x, y], atol=1e-2)


def test_create_target_volume_orthographic_roundtrip(rng):
    B, D, S = 1, 4, 8
    poses = np.stack([rand_pose(rng) for _ in range(B)])
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = 1.0 / 0.6
    near = np.full((B,), 0.6, np.float32)
    far = np.full((B,), 2.4, np.float32)
    xyz, depth = geometry.create_target_volume(
        D, S, 256, jnp.asarray(poses), jnp.asarray(K4[None]), jnp.asarray(near),
        jnp.asarray(far), "orthographic"
    )
    xyz, depth = np.asarray(xyz), np.asarray(depth)
    for y in [0, S - 1]:
        for x in [0, S - 1]:
            for d in [0, D - 1]:
                cam = poses[0, :3, :3] @ xyz[0, d, y, x] + poses[0, :3, 3]
                np.testing.assert_allclose(cam[2], depth[0, d, y, x], rtol=1e-4)
                ndc = K4[:3, :3] @ cam
                np.testing.assert_allclose(
                    ndc[:2], [2 * x / (S - 1) - 1, 2 * y / (S - 1) - 1], atol=1e-4
                )
