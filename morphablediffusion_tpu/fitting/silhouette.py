"""Silhouette term for the FLAME fitter (VERDICT r4 item 5).

The reference's in-the-wild quality rests on metrical-tracker's photometric
stage (/root/reference/third_party/metrical-tracker/tracker.py:117-144 — a
~1000-step Adam loop through a pytorch3d rasterizer). This repo has no
appearance model to rasterize (the licensed FLAME texture space cannot
ship), but the *shape-constraining* part of that stage — "the rendered head
must cover exactly the photographed head" — is a silhouette consistency
term, and that needs only a subject matte, which `preprocessing/matting.py`
already produces for any photo.

Formulation (classic distance-transform silhouette coupling, kept
LM-friendly so it drops into `fit.py`'s damped normal-equations stages):

* **inside term** — every *visible* projected vertex samples the Euclidean
  distance transform of the region OUTSIDE the target mask (bilinear, so
  it is differentiable w.r.t. the projection); vertices inside the mask
  read exactly 0, vertices poking out are pulled back with gradient along
  the DT's descent direction.
* **coverage term** — N points subsampled from the mask's contour each
  penalize the distance to their nearest visible projected vertex; this
  stops the degenerate shrink-inside-the-mask solution the inside term
  alone admits.
* **visibility** — per-vertex occlusion is computed with the repo's native
  C++ z-buffer rasterizer (native/rasterizer.cpp via preprocessing/raster)
  from the *current* fit, outside the jitted stage, and held fixed during
  the stage (EM-style alternation; the tracker re-renders per step, but
  visibility flips are rare once the rigid stage has converged).

Everything here is host-side numpy except `sample_dt`/`silhouette
residuals`, which are jnp and traced into the LM stage's Jacobian.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from morphablediffusion_tpu.fitting.flame import FlameModel, flame_forward


# --------------------------------------------------------------------- #
# host-side: masks, distance transforms, contours, visibility


def _hw(image_size) -> tuple:
    """int S -> (S, S); (h, w) tuple passes through (non-square photos)."""
    if isinstance(image_size, (tuple, list)):
        return int(image_size[0]), int(image_size[1])
    return int(image_size), int(image_size)


def render_silhouette(
    model: FlameModel, params: dict, K: np.ndarray, image_size
) -> np.ndarray:
    """Rasterize the posed FLAME mesh into an (h, w) bool mask with the
    native z-buffer rasterizer (numpy fallback inside raster.py)."""
    depth = _render_depth(model, params, K, image_size)
    return depth > 0.0


def _verts_px(model: FlameModel, params: dict, K: np.ndarray) -> np.ndarray:
    """(V, 3) [x_px, y_px, z_cam] of the posed mesh under the fit camera."""
    from scipy.spatial.transform import Rotation

    v = np.asarray(flame_forward(
        model, jnp.asarray(params["shape"]), jnp.asarray(params["exp"]),
        jnp.asarray(params["pose"]),
    ))
    R = Rotation.from_rotvec(np.asarray(params["cam_r"])).as_matrix()
    cam = v @ R.T + np.asarray(params["cam_t"])
    z = np.maximum(cam[:, 2], 1e-6)
    K = np.asarray(K, np.float32)
    x = cam[:, 0] / z * K[0, 0] + K[0, 2]
    y = cam[:, 1] / z * K[1, 1] + K[1, 2]
    return np.stack([x, y, z], axis=1).astype(np.float32)


def _render_depth(
    model: FlameModel, params: dict, K: np.ndarray, image_size
) -> np.ndarray:
    from morphablediffusion_tpu.preprocessing.raster import rasterize_depth_px

    h, w = _hw(image_size)
    vpx = _verts_px(model, params, K)
    return rasterize_depth_px(vpx, np.asarray(model.faces, np.int32), h, w)


def vertex_visibility(
    model: FlameModel, params: dict, K: np.ndarray, image_size,
    rel_eps: float = 0.02,
) -> np.ndarray:
    """(V,) float 1.0 where the vertex wins (or nearly wins) the z-buffer.

    A vertex is visible when its camera depth is within ``rel_eps`` (relative)
    of the rasterized depth at its pixel. Off-screen vertices are invisible.
    """
    h, w = _hw(image_size)
    vpx = _verts_px(model, params, K)
    depth = _render_depth(model, params, K, image_size)
    xi = np.clip(np.round(vpx[:, 0]).astype(int), 0, w - 1)
    yi = np.clip(np.round(vpx[:, 1]).astype(int), 0, h - 1)
    on = (
        (vpx[:, 0] >= 0) & (vpx[:, 0] <= w - 1)
        & (vpx[:, 1] >= 0) & (vpx[:, 1] <= h - 1)
    )
    zbuf = depth[yi, xi]
    vis = on & (zbuf > 0) & (vpx[:, 2] <= zbuf * (1.0 + rel_eps))
    return vis.astype(np.float32)


def mask_to_dt(mask: np.ndarray) -> np.ndarray:
    """(H, W) bool subject mask -> float32 px distance to the mask for
    points outside it (exactly 0 everywhere inside)."""
    from scipy import ndimage

    return ndimage.distance_transform_edt(~mask.astype(bool)).astype(np.float32)


def mask_contour(mask: np.ndarray, n: int = 96) -> np.ndarray:
    """(n, 2) float32 (x, y) pixel coords subsampled from the mask boundary
    (mask pixels with at least one non-mask 4-neighbour)."""
    m = mask.astype(bool)
    pad = np.pad(m, 1)
    boundary = m & ~(
        pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:]
    )
    ys, xs = np.nonzero(boundary)
    if len(xs) == 0:
        return np.zeros((0, 2), np.float32)
    idx = np.linspace(0, len(xs) - 1, min(n, len(xs))).astype(int)
    return np.stack([xs[idx], ys[idx]], axis=1).astype(np.float32)


# --------------------------------------------------------------------- #
# traced: differentiable residuals


def sample_dt(dt: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of an (H, W) map at (N, 2) pixel coords (x, y),
    clamped to the border (the DT keeps growing outward, so clamping keeps
    a useful inward gradient for far-out vertices)."""
    H, W = dt.shape
    x = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    y = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    d00 = dt[y0, x0]
    d01 = dt[y0, x0 + 1]
    d10 = dt[y0 + 1, x0]
    d11 = dt[y0 + 1, x0 + 1]
    return (
        d00 * (1 - fx) * (1 - fy) + d01 * fx * (1 - fy)
        + d10 * (1 - fx) * fy + d11 * fx * fy
    )


def silhouette_residuals(
    verts2d: jnp.ndarray,      # (V, 2) projected vertices, pixels
    vis: jnp.ndarray,          # (V,) 1.0 = visible under the current fit
    dt_out: jnp.ndarray,       # (H, W) outside-distance transform
    corr_vids: jnp.ndarray,    # (C,) int32 vertex id matched to each contour
    corr_pts: jnp.ndarray,     # (C, 2) matched target-contour pixels
    corr_normals: jnp.ndarray,  # (C, 2) outward contour normals
    corr_w: jnp.ndarray,       # (C,) 0/1 validity of each correspondence
    px_scale: float,           # residual px -> reference-px scale (300 / fx)
    w_inside: float,
    w_cover: float,
    deadband_px: float = 0.0,  # hinge: the inside term acts only beyond this
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LM residual blocks (inside, contour ICP); cost = 0.5 * sum(r**2).

    * inside: hinged DT pull-in of visible vertices. The hinge at the
      projected inter-vertex spacing matters — a mesh whose silhouette is
      within one vertex spacing of the target is as consistent as a
      discrete vertex set can certify, and penalizing inside that band
      injects the sampling-density bias of the sparse mesh (measured: an
      unhinged term DOUBLES vertex RMS at sigma=0).
    * contour: point-to-point ICP residuals against correspondences fixed
      per round by `contour_correspondences` (host side, from the rendered
      mesh silhouette). A min-over-vertices term inside autodiff was
      measured WORSE than landmark-only at every noise level — under a
      distorted initial fit the nearest vertex is often semantically wrong
      (a nose vertex dragged to the jaw contour) and the min re-picks
      targets every iteration; fixed per-round correspondences make the
      block a plain well-conditioned least squares.
    """
    d_in = jnp.maximum(sample_dt(dt_out, verts2d) - deadband_px, 0.0)
    r_in = jnp.sqrt(w_inside) * px_scale * d_in * vis
    if corr_vids.shape[0]:
        # point-to-PLANE: only the component along the contour normal
        # counts. The tangential component is pure vertex-discretization
        # (the matched vertex sits ~1 spacing along the silhouette from the
        # sample) — penalizing it was measured to DRAG the fit: ~1.5 px of
        # irreducible point-to-point error across 96 correspondences
        # out-weighed the 136 landmark residuals.
        diff = verts2d[corr_vids] - corr_pts
        d_n = jnp.sum(diff * corr_normals, axis=-1) * corr_w
        r_cov = jnp.sqrt(w_cover) * px_scale * d_n
    else:
        r_cov = jnp.zeros((0,), verts2d.dtype)
    return r_in, r_cov


def contour_correspondences(
    target_contour: np.ndarray,   # (C, 2) px samples of the PHOTO silhouette
    mesh_mask: np.ndarray,        # (S, S) rendered mask of the CURRENT fit
    verts2d: np.ndarray,          # (V, 2) current projected vertices
    vis: np.ndarray,              # (V,) current visibility
    max_px: float,                # reject matches farther than this
    target_mask: np.ndarray = None,  # (S, S) photo mask, for the normals
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """ICP correspondence: target contour sample -> nearest pixel of the
    rendered mesh contour -> nearest visible vertex to that pixel. Returns
    (vertex_ids, target_pts, normals, weights) with weight 0 for matches
    beyond ``max_px`` (outliers / occluded stretches of the photo contour).
    Normals are outward unit gradients of the target mask's signed distance
    field at the contour samples (order-free — the subsampled contour is
    not a traced curve)."""
    C = len(target_contour)

    def empty():
        z = np.zeros((0,), np.int32)
        zp = np.zeros((0, 2), np.float32)
        return z, zp, zp, np.zeros((0,), np.float32)

    if C == 0:
        return empty()
    mesh_c = mask_contour(mesh_mask, n=4 * C)
    pts = np.asarray(verts2d, np.float32)
    vi = np.asarray(vis) > 0.5
    if len(mesh_c) == 0 or vi.sum() < 3:
        return empty()
    d_tm = np.linalg.norm(
        target_contour[:, None, :] - mesh_c[None, :, :], axis=-1
    )
    j = d_tm.argmin(axis=1)                       # nearest mesh-contour px
    w = (d_tm[np.arange(C), j] <= max_px).astype(np.float32)
    vid_pool = np.nonzero(vi)[0]
    d_mv = np.linalg.norm(
        mesh_c[j][:, None, :] - pts[vid_pool][None, :, :], axis=-1
    )
    vids = vid_pool[d_mv.argmin(axis=1)].astype(np.int32)
    normals = contour_normals(target_mask, target_contour)
    return vids, target_contour.astype(np.float32), normals, w


def contour_normals(mask: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(C, 2) outward unit normals of the mask boundary at pixel points,
    from the gradient of the signed distance field (dt_out - dt_in)."""
    from scipy import ndimage

    m = mask.astype(bool)
    sdf = (
        ndimage.distance_transform_edt(~m) - ndimage.distance_transform_edt(m)
    ).astype(np.float32)
    gy, gx = np.gradient(sdf)
    xi = np.clip(np.round(pts[:, 0]).astype(int), 0, m.shape[1] - 1)
    yi = np.clip(np.round(pts[:, 1]).astype(int), 0, m.shape[0] - 1)
    n = np.stack([gx[yi, xi], gy[yi, xi]], axis=1)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.maximum(norm, 1e-6)).astype(np.float32)


def vertex_spacing_px(verts2d: np.ndarray, vis: np.ndarray) -> float:
    """Median nearest-neighbour distance of the visible projected vertices —
    the natural deadband for the hinged silhouette residuals."""
    pts = np.asarray(verts2d)[np.asarray(vis) > 0.5]
    if len(pts) < 2:
        return 2.0
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return float(np.median(np.sqrt(d2.min(axis=1))))
