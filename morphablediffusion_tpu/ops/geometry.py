"""Projective / orthographic camera geometry (pure functions, channels-last).

Parity targets (formulas, not layout) — ldm/models/diffusion/utils.py:
  * construct_project_matrix  :46-69
  * project_and_normalize     :20-43
  * get_warp_coordinates      :71-76
  * create_target_volume      :79-153
  * near_far_from_unit_sphere_using_camera_poses :155-172

Layout is TPU-native: point sets are (..., N, 3) with xyz last, pixel/grid
coordinates are (..., 2) with (x, y) last, matching the lane dimension.
The reference keeps (B, 3, N); formulas are identical.

Normalized image coordinates follow the align_corners=True convention
(coord * (L-1)/2 maps -1 -> pixel 0 and +1 -> pixel L-1), matching the
reference's use of F.grid_sample(..., align_corners=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PERSPECTIVE = "perspective"
ORTHOGRAPHIC = "orthographic"

# Camera matrices are tiny (4x4); force full fp32 on the MXU so projective
# round-trips stay exact (TPU matmul defaults would use bf16 inputs).
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def construct_project_matrix(x_ratio, y_ratio, Ks, poses, projection=PERSPECTIVE):
    """Full 4x4 projection matrix from intrinsics and world-to-cam pose.

    Ks: (B, 3, 3) for perspective, (B, 4, 4) for orthographic.
    poses: (B, 3, 4) world-to-camera [R|t].
    Returns (B, 4, 4).
    """
    B = poses.shape[0]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], poses.dtype), (B, 1, 4)
    )
    if projection == PERSPECTIVE:
        scale = jnp.diag(jnp.asarray([x_ratio, y_ratio, 1.0], dtype=poses.dtype))
        prj = _mm(_mm(scale[None], Ks[:, :3, :3]), poses)  # (B, 3, 4)
        return jnp.concatenate([prj, bottom], axis=1)
    elif projection == ORTHOGRAPHIC:
        pose44 = jnp.concatenate([poses, bottom], axis=1)
        return _mm(Ks, pose44)
    raise NotImplementedError(projection)


def project_and_normalize(points, proj, length, projection=PERSPECTIVE):
    """Project world points to normalized [-1, 1] image coordinates.

    points: (B, N, 3); proj: (B, 4, 4); length: image side in pixels.
    Returns (B, N, 2) with (x, y) last.
    """
    # world -> homogeneous image coords: p_img = R p + t, row-vector form.
    p = _mm(points, jnp.swapaxes(proj[:, :3, :3], -1, -2)) + proj[:, None, :3, 3]
    if projection == PERSPECTIVE:
        div = jnp.maximum(p[..., 2:3], 1e-4)
        xy = p[..., :2] / div
        return xy / ((length - 1) / 2.0) - 1.0
    elif projection == ORTHOGRAPHIC:
        return p[..., :2]
    raise NotImplementedError(projection)


def get_warp_coordinates(
    volume_xyz, warp_size, input_size, Ks, pose, projection=PERSPECTIVE
):
    """Normalized sample coords of 3D grid points in a camera's feature map.

    volume_xyz: (B, D, H, W, 3) world points; returns (B, D, H, W, 2).
    """
    B, D, H, W, _ = volume_xyz.shape
    ratio = warp_size / input_size
    proj = construct_project_matrix(ratio, ratio, Ks, pose, projection)
    coords = project_and_normalize(
        volume_xyz.reshape(B, D * H * W, 3), proj, warp_size, projection
    )
    return coords.reshape(B, D, H, W, 2)


def near_far_from_unit_sphere(poses):
    """near/far of the unit sphere along each camera's optical axis.

    poses: (B, 3, 4) world-to-cam. Returns (near, far) each (B, 1).
    """
    R = poses[..., :3, :3]
    t = poses[..., :3, 3:]
    origin = (-_mm(jnp.swapaxes(R, -1, -2), t))[..., 0]  # (B, 3)
    orient = jnp.swapaxes(R, -1, -2)[..., :3, 2]  # (B, 3) camera z in world
    a = jnp.sum(orient**2, axis=-1, keepdims=True)
    b = -jnp.sum(orient * origin, axis=-1, keepdims=True)
    mid = b / a
    return mid - 1.0, mid + 1.0


def camera_positions(poses):
    """World-space camera centers from world-to-cam [R|t]. (B..., 3, 4) -> (B..., 3)."""
    R = poses[..., :3, :3]
    t = poses[..., :3, 3:]
    return (-_mm(jnp.swapaxes(R, -1, -2), t))[..., 0]


def create_target_volume(
    depth_size,
    volume_size,
    input_image_size,
    poses,
    Ks,
    near=None,
    far=None,
    projection=PERSPECTIVE,
):
    """Back-project a per-pixel depth ramp into world space.

    poses: (B, 3, 4); Ks: (B, 3, 3)/(B, 4, 4) per projection.
    near/far: (B,) or (B, H, W) metric depths; None -> unit-sphere bounds.
    Returns (xyz, depth): (B, D, H, W, 3) world points and (B, D, H, W)
    depth values.
    """
    D, H, W = depth_size, volume_size, volume_size
    B = poses.shape[0]
    dtype = poses.dtype

    if near is None or far is None:
        near, far = near_far_from_unit_sphere(poses)  # (B,1)
        near, far = near[:, 0], far[:, 0]
    near = jnp.broadcast_to(jnp.reshape(near, (B, 1, 1, 1) if jnp.ndim(near) == 1 else (B, 1, H, W)), (B, 1, H, W))
    far = jnp.broadcast_to(jnp.reshape(far, (B, 1, 1, 1) if jnp.ndim(far) == 1 else (B, 1, H, W)), (B, 1, H, W))
    ramp = jnp.linspace(0.0, 1.0, D, dtype=dtype).reshape(1, D, 1, 1)
    depth = ramp * (far - near) + near  # (B, D, H, W)

    # pixel grid, (x, y) last
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    ratio = volume_size / input_image_size

    if projection == PERSPECTIVE:
        pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
        # scale homogeneous pixel coords by depth: (B, D, H, W, 3)
        grid = pix[None, None] * depth[..., None]
        proj = construct_project_matrix(ratio, ratio, Ks, poses, projection)
        inv = jnp.linalg.inv(proj)
        xyz = _mm(grid.reshape(B, D * H * W, 3), jnp.swapaxes(inv[:, :3, :3], -1, -2)) + inv[:, None, :3, 3]
    elif projection == ORTHOGRAPHIC:
        ndc = jnp.stack(
            [2 * xs / (H - 1) - 1, 2 * ys / (H - 1) - 1, jnp.ones_like(xs)], axis=-1
        )  # (H, W, 3)
        K_inv = jnp.linalg.inv(Ks)
        cam = _mm(ndc.reshape(1, H * W, 3), jnp.swapaxes(K_inv[:, :3, :3], -1, -2))
        cam = jnp.broadcast_to(cam[:, None], (B, D, H * W, 3))
        cam = cam.at[..., 2].set(depth.reshape(B, D, H * W))
        eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 4, 4))
        RT = construct_project_matrix(1, 1, eye, poses, projection)
        inv = jnp.linalg.inv(RT)
        xyz = _mm(cam.reshape(B, D * H * W, 3), jnp.swapaxes(inv[:, :3, :3], -1, -2)) + inv[:, None, :3, 3]
    else:
        raise NotImplementedError(projection)

    return xyz.reshape(B, D, H, W, 3), depth
