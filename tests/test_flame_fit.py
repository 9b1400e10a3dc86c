"""FLAME model + landmark fitting: forward correctness and recovery.

The reference has no tests for its vendored fitting stack (MICA +
metrical-tracker); here the in-tree replacement is verified end-to-end on a
synthetic morphable model: render ground-truth landmarks from known
parameters, fit from scratch, and require the recovered landmarks (and the
final mesh) to match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphablediffusion_tpu.fitting import (
    FitConfig,
    fit_landmarks,
    fit_two_photos,
    flame_forward,
    flame_landmarks,
    random_model,
    rodrigues,
)
from morphablediffusion_tpu.fitting.flame import project_points


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    rvecs = rng.normal(size=(10, 3)).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvecs)))
    R_ref = Rotation.from_rotvec(rvecs).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # differentiable at zero
    g = jax.jacobian(lambda r: rodrigues(r))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_forward_zero_params_is_template(rng):
    model = random_model(rng)
    v = flame_forward(
        model, jnp.zeros(model.n_shape), jnp.zeros(model.n_exp),
        jnp.zeros(model.num_joints * 3),
    )
    np.testing.assert_allclose(np.asarray(v), np.asarray(model.v_template),
                               atol=1e-6)


def test_forward_global_rotation_is_rigid(rng):
    """Rotating only the root joint must rigidly rotate the whole mesh."""
    model = random_model(rng)
    rvec = jnp.asarray([0.2, -0.3, 0.1])
    pose = jnp.zeros(model.num_joints * 3).at[:3].set(rvec)
    shape = jnp.asarray(rng.normal(size=model.n_shape).astype(np.float32))
    exp = jnp.zeros(model.n_exp)
    v0 = flame_forward(model, shape, exp, jnp.zeros(model.num_joints * 3))
    v1 = flame_forward(model, shape, exp, pose)
    # root rotation pivots about the root joint location
    j0 = (model.j_regressor @ v0)[0]
    R = rodrigues(rvec)
    np.testing.assert_allclose(
        np.asarray(v1), np.asarray((v0 - j0) @ R.T + j0), atol=1e-5
    )


def test_landmarks_shape_and_bary(rng):
    model = random_model(rng, n_landmarks=17)
    v = flame_forward(
        model, jnp.zeros(model.n_shape), jnp.zeros(model.n_exp),
        jnp.zeros(model.num_joints * 3),
    )
    l3d = flame_landmarks(model, v, jnp.zeros(model.num_joints * 3))
    assert l3d.shape == (17, 3)
    # each landmark lies in its triangle's convex hull (bary coords sum to 1)
    tri = np.asarray(v)[np.asarray(model.lmk_faces)]
    assert np.all(np.linalg.norm(np.asarray(l3d) - tri.mean(1), axis=-1)
                  <= np.ptp(tri, axis=1).max() + 1e-5)


@pytest.mark.slow
def test_fit_recovers_landmarks(rng):
    """Fit from scratch against landmarks rendered from known parameters;
    the reprojection must converge to a fraction of the face extent."""
    model = random_model(rng, n_landmarks=24)
    J = model.num_joints
    true = {
        "shape": jnp.asarray(rng.normal(size=model.n_shape) * 0.5, jnp.float32),
        "exp": jnp.asarray(rng.normal(size=model.n_exp) * 0.5, jnp.float32),
        "pose": jnp.zeros(J * 3).at[:3].set(jnp.asarray([0.1, 0.2, -0.05])),
        "cam_r": jnp.asarray([0.0, 0.05, 0.0]),
        "cam_t": jnp.asarray([0.01, -0.02, 0.9]),
    }
    K = np.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)
    verts = flame_forward(model, true["shape"], true["exp"], true["pose"])
    lmk2d = project_points(
        flame_landmarks(model, verts, true["pose"]),
        true["cam_r"], true["cam_t"], jnp.asarray(K),
    )
    params, info = fit_landmarks(
        model, np.asarray(lmk2d), K, FitConfig(steps_per_stage=60)
    )
    # the face spans ~0.2 units at z~0.9 with f=300 => ~65 px; require the
    # fit to land within a couple px per landmark
    assert info["mean_px_err"] < 2.5, info


@pytest.mark.slow
def test_fit_two_photos_retargets_identity(rng):
    """Identity must come from photo A, expression from photo B.

    Same-identity pair with enough landmarks that the problem is determined
    (80 constraints vs ~33 free parameters per photo): the LM fit must then
    recover the retargeted mesh nearly exactly. Cross-identity pairs on a
    RANDOM-basis model are unidentifiable by construction — the exp codes
    absorb the identity difference (the reference's tracker-with-injected-
    MICA-identity leaks identically; see docs/FITTING.md) — so the
    quantitative bar is only meaningful on the same-identity protocol.
    """
    model = random_model(rng, n_landmarks=40)
    J = model.num_joints
    K = np.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]], np.float32)

    shape_a = jnp.asarray(rng.normal(size=model.n_shape) * 0.5, jnp.float32)
    exp_b = jnp.asarray(rng.normal(size=model.n_exp) * 0.5, jnp.float32)
    pose0 = jnp.zeros(J * 3)
    cam = dict(cam_r=jnp.zeros(3), cam_t=jnp.asarray([0.0, 0.0, 0.9]))

    def render(shape, exp, pose):
        v = flame_forward(model, shape, exp, pose)
        return np.asarray(project_points(
            flame_landmarks(model, v, pose), cam["cam_r"], cam["cam_t"],
            jnp.asarray(K),
        ))

    lmk_a = render(shape_a, jnp.zeros(model.n_exp), pose0)   # neutral identity
    lmk_b = render(shape_a, exp_b, pose0)                    # same id + exp
    verts, info = fit_two_photos(model, lmk_a, lmk_b, K,
                                 FitConfig(steps_per_stage=60))
    target = flame_forward(model, shape_a, exp_b, pose0)
    err = np.linalg.norm(verts - np.asarray(target), axis=-1).mean()
    extent = float(np.ptp(np.asarray(target), axis=0).max())
    assert err < 0.05 * extent, (err, extent, info)
    # and the expression must actually transfer: much closer to the target
    # than leaving the input photo's neutral expression in place
    neutral = flame_forward(model, shape_a, jnp.zeros(model.n_exp), pose0)
    err_nothing = np.linalg.norm(
        np.asarray(neutral) - np.asarray(target), axis=-1).mean()
    assert err < 0.5 * err_nothing, (err, err_nothing)


def test_synthetic_flame_assets_roundtrip(tmp_path):
    """tools/make_synthetic_flame.py writes FLAME2020-format files that
    load_model consumes: contour-first ibug-68 landmark layout, finite
    forward (the zero-egress stand-in for the licensed download that
    generate_face.sh stages 1-2 fit against)."""
    import subprocess
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    repo = Path(__file__).resolve().parents[1]
    subprocess.run(
        [sys.executable, str(repo / "tools/make_synthetic_flame.py"),
         "--out", str(tmp_path), "--vertices", "128", "--faces", "64"],
        check=True,
    )
    from morphablediffusion_tpu.fitting.flame import (
        flame_forward,
        flame_landmarks,
        load_model,
    )

    m = load_model(str(tmp_path / "generic_model.pkl"),
                   str(tmp_path / "landmark_embedding.npy"))
    assert m.has_dynamic_contour
    v = flame_forward(m, jnp.zeros(m.n_shape), jnp.zeros(m.n_exp),
                      jnp.zeros(m.num_joints * 3))
    lm = flame_landmarks(m, v, jnp.zeros(m.num_joints * 3))
    assert v.shape == (128, 3) and lm.shape == (68, 3)
    assert bool(jnp.isfinite(v).all()) and bool(jnp.isfinite(lm).all())


def test_dyn_contour_bucket_matches_reference():
    """_dyn_contour_index must reproduce the reference's yaw-bucket mapping
    (metrical-tracker flame/lbs.py:58-122): R = global @ neck composed over
    the neck kinematic chain, angle = atan2(+R[2,0], sy) in degrees, buckets
    0..39 for yaw >= 0 and 39 - yaw for yaw < 0 (ADVICE r3: the sign was
    flipped and the neck joint ignored)."""
    from morphablediffusion_tpu.fitting.flame import _dyn_contour_index

    def reference_bucket(global_aa, neck_aa):
        from scipy.spatial.transform import Rotation

        R = (Rotation.from_rotvec(global_aa).as_matrix()
             @ Rotation.from_rotvec(neck_aa).as_matrix())
        sy = np.hypot(R[0, 0], R[1, 0])
        # reference: y = round(clamp(-rot_mat_to_euler(R) deg, max=39));
        # y < -39 -> 78, -39 <= y < 0 -> 39 - y, else y
        y = round(min(np.degrees(np.arctan2(R[2, 0], sy)), 39.0))
        if y < -39:
            return 78
        return 39 - y if y < 0 else y

    J = 5
    for gdeg, ndeg in [(0, 0), (10, 0), (-10, 0), (25, 10), (-25, -10),
                       (39, 5), (-50, 0), (0, -20), (17, -30)]:
        g = np.array([0.0, np.radians(gdeg), 0.0], np.float32)
        n = np.array([0.0, np.radians(ndeg), 0.0], np.float32)
        pose = np.zeros(J * 3, np.float32)
        pose[:3], pose[3:6] = g, n
        got = int(_dyn_contour_index(jnp.asarray(pose)))
        want = reference_bucket(g, n)
        assert got == want, (gdeg, ndeg, got, want)


@pytest.mark.slow
def test_fit_face_cli_with_overlay(tmp_path):
    """fit_face end to end on synthetic FLAME assets: precomputed landmarks
    in, fitted .ply + QA overlay PNG out (the real-photo artifact path)."""
    import json
    import subprocess
    import sys

    from PIL import Image

    # synthetic FLAME assets
    subprocess.run(
        [sys.executable, "tools/make_synthetic_flame.py",
         "--out", str(tmp_path / "flame"), "--vertices", "256",
         "--faces", "512"],
        check=True, cwd="/root/repo",
    )
    from morphablediffusion_tpu.fitting.flame import (
        flame_forward, flame_landmarks, load_model, project_points,
    )

    model = load_model(str(tmp_path / "flame" / "generic_model.pkl"),
                       str(tmp_path / "flame" / "landmark_embedding.npy"))
    rng = np.random.default_rng(0)
    shape = jnp.asarray(rng.normal(size=model.n_shape) * 0.5, jnp.float32)
    pose = jnp.zeros(model.num_joints * 3)
    K = np.asarray([[307.2, 0, 128], [0, 307.2, 128], [0, 0, 1]], np.float32)
    v = flame_forward(model, shape, jnp.zeros(model.n_exp), pose)
    lmk = np.asarray(project_points(
        flame_landmarks(model, v, pose), jnp.zeros(3),
        jnp.asarray([0.0, 0.0, 0.6]), jnp.asarray(K)))
    (tmp_path / "lmk.json").write_text(json.dumps(lmk.tolist()))
    Image.fromarray(
        np.full((256, 256, 3), 180, np.uint8)
    ).save(tmp_path / "photo.png")

    from morphablediffusion_tpu.apps.fit_face import main as fit_main

    fit_main([
        "--input_img", str(tmp_path / "photo.png"),
        "--flame", str(tmp_path / "flame" / "generic_model.pkl"),
        "--lmk_embedding", str(tmp_path / "flame" / "landmark_embedding.npy"),
        "--input_landmarks", str(tmp_path / "lmk.json"),
        "--exp_landmarks", str(tmp_path / "lmk.json"),
        "--out", str(tmp_path / "mesh.ply"),
        "--overlay", str(tmp_path / "overlay.png"),
        "--steps", "25",
    ])
    assert (tmp_path / "mesh.ply").is_file()
    arr = np.asarray(Image.open(tmp_path / "overlay.png"))
    assert arr.shape == (256, 256, 3)
    # detected landmarks painted green somewhere
    assert ((arr[..., 1] == 255) & (arr[..., 0] == 0)).any()


# ------------------------------------------------------------------ #
# silhouette stage (fitting/silhouette.py)


def test_silhouette_residuals_vanish_at_ground_truth(rng):
    """At GT parameters the hinged DT term reads ~0 for visible vertices and
    point-to-plane contour residuals sit within the vertex-spacing floor."""
    from morphablediffusion_tpu.fitting import silhouette as sil

    model = random_model(rng, n_verts=256)
    S = 128
    K = np.asarray([[1.2 * S, 0, S / 2], [0, 1.2 * S, S / 2], [0, 0, 1]],
                   np.float32)
    gt = {
        "shape": rng.normal(size=model.n_shape).astype(np.float32),
        "exp": rng.normal(size=model.n_exp).astype(np.float32),
        "pose": np.zeros(model.num_joints * 3, np.float32),
        "cam_r": np.zeros(3, np.float32),
        "cam_t": np.asarray([0, 0, 0.9], np.float32),
    }
    mask = sil.render_silhouette(model, gt, K, S)
    assert 0.02 < mask.mean() < 0.9, "mesh must land in frame"
    vis = sil.vertex_visibility(model, gt, K, S)
    assert 0.1 < vis.mean() <= 1.0
    vpx = sil._verts_px(model, gt, K)[:, :2]
    dt = sil.mask_to_dt(mask)
    dval = np.asarray(sil.sample_dt(jnp.asarray(dt), jnp.asarray(vpx)))
    assert (dval * vis).max() < 2.0, "visible GT vertices sit in the mask"
    contour = sil.mask_contour(mask, 48)
    vids, pts, normals, w = sil.contour_correspondences(
        contour, mask, vpx, vis, max_px=0.15 * S, target_mask=mask
    )
    assert w.sum() > 24
    spacing = sil.vertex_spacing_px(vpx, vis)
    normal_err = np.abs(((vpx[vids] - pts) * normals).sum(1)) * w
    assert np.median(normal_err[w > 0]) < max(2.0, spacing), normal_err.max()


def test_silhouette_only_rigid_recovery(rng):
    """With ALL landmarks unobserved (conf=0) the silhouette stage alone must
    recover 2D silhouette alignment from a rigid perturbation — machinery
    check for the ICP + hinged-DT + visibility loop (docs/FITTING.md: on
    synthetic assets the stage is 2D-informative but cannot reduce 3D vRMS)."""
    from morphablediffusion_tpu.fitting import silhouette as sil
    from morphablediffusion_tpu.fitting.fit import init_params

    model = random_model(rng, n_verts=256, n_landmarks=24)
    S = 128
    K = np.asarray([[1.2 * S, 0, S / 2], [0, 1.2 * S, S / 2], [0, 0, 1]],
                   np.float32)
    gt = {
        "shape": rng.normal(size=model.n_shape).astype(np.float32),
        "exp": rng.normal(size=model.n_exp).astype(np.float32),
        "pose": np.zeros(model.num_joints * 3, np.float32),
        "cam_r": np.zeros(3, np.float32),
        "cam_t": np.asarray([0, 0, 0.9], np.float32),
    }
    mask = sil.render_silhouette(model, gt, K, S)

    init = init_params(model, S)
    init["shape"] = jnp.asarray(gt["shape"])
    init["exp"] = jnp.asarray(gt["exp"])
    init["cam_r"] = jnp.asarray([0.04, -0.03, 0.02])
    init["cam_t"] = jnp.asarray(gt["cam_t"] + np.asarray([0.025, -0.02, 0.0],
                                                         np.float32))

    def iou(p):
        m = sil.render_silhouette(model, p, K, S)
        return (m & mask).sum() / (m | mask).sum()

    before = iou({k: np.asarray(v) for k, v in init.items()})
    params, _ = fit_landmarks(
        model, np.zeros((24, 2), np.float32), K,
        FitConfig(steps_per_stage=25, sil_rounds=3),
        init=init, lmk_conf=np.zeros(24, np.float32), mask=mask, image_size=S,
    )
    after = iou(params)
    # convergence floor is the ~2 px contour discretization; on this tiny
    # (~28 px) head that is IoU ~0.7 (at 92 px heads the same machinery
    # reaches 0.95 — docs/FITTING.md)
    assert after > before + 0.08, (before, after)
