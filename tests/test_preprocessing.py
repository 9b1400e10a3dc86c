"""Preprocessing: rasterizer (native vs numpy parity), color calibration,
camera angle math, and mesh IO with faces."""

import json

import numpy as np
import pytest
from PIL import Image

from morphablediffusion_tpu.preprocessing import raster
from morphablediffusion_tpu.preprocessing.color_calib import (
    _fit_affine_correction,
    calibrate_colors,
)
from morphablediffusion_tpu.preprocessing.facescape_process import (
    camera_angles,
    homogeneous,
    invert_rt,
    side_aware_crop,
)
from morphablediffusion_tpu.utils.mesh_io import load_obj, load_ply


def _square_mesh(z=2.0, half=0.5):
    verts = np.asarray(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]]
    )
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_rasterizer_depth_square():
    verts, faces = _square_mesh()
    K = np.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    Rt = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    depth = raster.render_depth_cv(verts, faces, K, Rt, (32, 32))
    assert depth.shape == (32, 32)
    # center pixel hits the plane at z=2, corners are background
    assert abs(depth[16, 16] - 2.0) < 1e-4
    assert depth[0, 0] == 0 and depth[31, 31] == 0
    # coverage ~ (16 px)^2 square
    assert 200 < (depth > 0).sum() < 320


def test_rasterizer_native_matches_numpy():
    rng = np.random.default_rng(0)
    verts = rng.uniform(-1, 1, (30, 3))
    verts[:, 2] += 3.0
    faces = rng.integers(0, 30, (40, 3)).astype(np.int32)
    K = np.asarray([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]])
    Rt = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    cam = verts  # identity extrinsics
    uv = cam @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    verts_px = np.concatenate([uv, cam[:, 2:3]], axis=-1)

    ref = raster._rasterize_depth_numpy(
        verts_px.astype(np.float32), faces, 64, 64
    )
    lib = raster._load_lib()
    if lib is None:
        pytest.skip("native rasterizer not built")
    native = raster.rasterize_depth_px(verts_px, faces, 64, 64)
    np.testing.assert_allclose(native, ref, atol=1e-4)


def test_zbuffer_orders_triangles():
    # two stacked squares: nearer one must win
    v1, f1 = _square_mesh(z=2.0)
    v2, f2 = _square_mesh(z=1.0, half=0.2)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    K = np.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    Rt = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    depth = raster.render_depth_cv(verts, faces, K, Rt, (32, 32))
    assert abs(depth[16, 16] - 1.0) < 1e-4  # nearer square
    # small square projects to u in [9.6, 22.4], big square to [8, 24]
    assert abs(depth[16, 23] - 2.0) < 1e-4  # big square only


def test_camera_angle_signs():
    # camera looking straight down -y (frontal): azimuth 180 or -180
    Rt = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    Rt[2, :3] = [0, 1, 0]  # view dir +y
    a = camera_angles(Rt)
    assert abs(a["azimuth"]) < 1e-6 and abs(a["elevation"]) < 1e-6


def test_invert_rt_roundtrip():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(A)
    rt = homogeneous(np.concatenate([q, rng.normal(size=(3, 1))], 1)[None])
    eye = invert_rt(invert_rt(rt))
    np.testing.assert_allclose(eye, rt, atol=1e-10)


def test_side_aware_crop_square():
    mask = np.zeros((100, 120), bool)
    mask[30:70, 40:90] = True
    pose = np.eye(4)
    pose[0, 3] = -1.0  # camera right of head
    t, b, l, r = side_aware_crop(mask, pose, 100, 120)
    assert b - t == r - l == 100  # square of size min(h, w)
    assert 0 <= t and b <= 100 and 0 <= l and r <= 120


def test_affine_color_fit_recovers_transform():
    rng = np.random.default_rng(2)
    colors = rng.uniform(0.1, 0.9, (500, 3))
    A_true = np.asarray(
        [[1.1, 0, 0, 0.02], [0, 0.9, 0.05, 0], [0, 0, 1.0, -0.03]]
    )
    target = np.concatenate([colors, np.ones((500, 1))], -1) @ A_true.T
    A = _fit_affine_correction(colors, target)
    np.testing.assert_allclose(A, A_true, atol=1e-5)


def _grid_mesh(n=8, z=2.0, half=0.45):
    """n x n vertex grid on a plane, triangulated."""
    lin = np.linspace(-half, half, n)
    xx, yy = np.meshgrid(lin, lin)
    verts = np.stack([xx, yy, np.full_like(xx, z)], -1).reshape(-1, 3)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts, np.asarray(faces, np.int32)


def test_calibrate_colors_end_to_end(tmp_path):
    """Two views of a colored square; one view has a color cast that
    calibration must remove."""
    verts, faces = _grid_mesh()
    K = [[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]]
    Rt = [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]
    scan = tmp_path / "scan"
    base = np.full((32, 32, 4), 255, np.uint8)
    base[..., :3] = (128, 100, 80)
    cast = base.copy()
    cast[..., 0] = np.clip(cast[..., 0].astype(int) + 40, 0, 255)  # red cast
    cams = {}
    for i, img in [(0, base), (1, cast)]:
        d = scan / f"view_{i:05d}"
        d.mkdir(parents=True)
        Image.fromarray(img, "RGBA").save(d / "rgba.png")
        cams[str(i)] = dict(intrinsics=K, extrinsics=Rt, angles={})
    (scan / "cameras.json").write_text(json.dumps(cams))

    calibrate_colors(scan, verts, faces)
    out0 = np.asarray(Image.open(scan / "view_00000" / "rgba_colorcalib.png"))
    out1 = np.asarray(Image.open(scan / "view_00001" / "rgba_colorcalib.png"))
    # the two calibrated views should now agree far better than 40/255
    diff = np.abs(out0[..., :3].astype(int) - out1[..., :3].astype(int)).mean()
    assert diff < 10, diff


def test_load_obj_ply_faces(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, f = load_obj(obj)
    assert v.shape == (4, 3) and f.shape == (2, 3)  # quad fan-triangulated

    ply = tmp_path / "m.ply"
    ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    v, f = load_ply(ply)
    assert v.shape == (3, 3) and f.shape == (1, 3)


def test_matting_synthetic_composite(tmp_path):
    """Native matting must recover a centered subject on a uniform-ish
    background (the in-pipeline carvekit replacement,
    reference generate_face.py:47-69)."""
    from morphablediffusion_tpu.preprocessing.matting import matte

    img = np.full((128, 128, 3), 200, np.uint8)
    yy, xx = np.mgrid[0:128, 0:128]
    blob = ((yy - 64) ** 2 + (xx - 64) ** 2) < 40**2
    img[blob] = np.stack(
        [80 + (yy[blob] % 17), 40 + (xx[blob] % 11),
         np.full(int(blob.sum()), 60)], -1,
    )
    rgba = matte(img, backend="native")
    assert rgba.shape == (128, 128, 4) and rgba.dtype == np.uint8
    alpha = rgba[..., 3] > 127
    iou = (alpha & blob).sum() / (alpha | blob).sum()
    assert iou > 0.75, iou

    # the generate_face input path: a plain JPEG gets matted + composited
    from morphablediffusion_tpu.apps.generate_face import load_input_image

    p = tmp_path / "plain.jpg"
    Image.fromarray(img).save(p)
    out = load_input_image(str(p), image_size=64, matting="native")
    assert out.shape == (64, 64, 3)
    # background corners must be near white after compositing
    assert out[:4, :4].mean() > 0.8 and out[-4:, -4:].mean() > 0.8


def test_box_blur_matches_naive():
    """_box_blur must equal a naive edge-padded box filter (ADVICE r3: the
    cumsum window used to add the constant first padded element instead of
    the per-index one, biasing every guided-filter statistic)."""
    from morphablediffusion_tpu.preprocessing.matting import _box_blur

    rng = np.random.default_rng(0)
    x = rng.normal(size=(13, 17)).astype(np.float32)
    r = 3
    xp = np.pad(x, ((r, r), (r, r)), mode="edge")
    naive = np.zeros_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            naive[i, j] = xp[i : i + 2 * r + 1, j : j + 2 * r + 1].mean()
    np.testing.assert_allclose(_box_blur(x, r), naive, atol=1e-5)
