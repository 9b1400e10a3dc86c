"""Staged FLAME landmark fitting as one jitted optimization per stage.

Replaces the reference's two vendored fitting stages
(/root/reference/third_party/MICA/demo.py — identity from a photo — and
/root/reference/third_party/metrical-tracker/tracker.py — a ~1000-step
torch Adam photometric+landmark fit with a pytorch3d rasterizer) with a
landmark-only fit that needs nothing outside this repo: detected 2D
landmarks in, FLAME parameters + mesh out.

Design: parameters live in one flat vector; each stage is a
Levenberg-Marquardt loop (full Jacobian + damped normal-equations solve —
the problem is ~300 residuals x ~170 parameters, so one tiny (P, P) solve
per iteration beats hundreds of first-order steps; round 3's Adam loop
plateaued ~8 px on known-parameter ground truth) inside ONE jitted
`lax.scan` with branchless lambda accept/reject. Per-stage trainable masks
zero Jacobian columns (the reference freezes groups by rebuilding torch
optimizers; a mask keeps a single compiled graph per stage). Stages follow
the tracker's curriculum: rigid camera alignment first, then
expression+jaw, then everything.

Identity retargeting (the reference patches the tracker to inject MICA's
identity codes; third_party/retarget_identity.py does it for the external
path): `fit_two_photos` solves ONE joint bundle fit over both photos with a
shared identity code — same contract, zero external code, and the shared
shape resolves the single-photo shape/exp ambiguity that MICA's learned
prior exists to break.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from morphablediffusion_tpu.fitting.flame import (
    FlameModel,
    flame_forward,
    flame_landmarks,
    project_points,
)


@dataclasses.dataclass
class FitConfig:
    steps_per_stage: int = 40  # LM iterations per stage (each = one solve)
    # regularizer weights (squared-L2 on the codes, like the tracker's
    # priors). The data residuals are in REFERENCE PIXELS (see _residuals),
    # so with codes ~ N(0, 1) these defaults bias the fit by well under a
    # pixel for well-constrained directions while damping the noise
    # amplification of low-variance tail components (w = sigma_noise^2 /
    # sigma_prior^2 is the MAP weighting; 0.3 assumes ~0.5 px detector
    # noise on unit-variance codes — measured sweep in docs/FITTING.md).
    w_shape: float = 0.3
    w_exp: float = 0.3
    w_pose: float = 1e-3   # non-global joints (neck/jaw/eyes) stay small
    # landmark weighting: the 17 jaw-contour points slide on the mesh, so
    # they get a lower weight than the 51 inner points (only applied to
    # 68-point sets)
    w_contour: float = 0.4
    # silhouette stage (runs only when fit_landmarks gets a subject mask):
    # weights for the two residual blocks (fitting/silhouette.py) and the
    # number of visibility-refresh rounds (visibility is rasterized with the
    # native z-buffer OUTSIDE the jitted stage, then held fixed within it)
    w_sil_inside: float = 0.05
    w_sil_cover: float = 0.2
    sil_rounds: int = 2
    sil_contour_n: int = 96
    # which parameters the silhouette stage may move: "rigid" (camera +
    # global rotation — the default; measured on synthetic ground truth,
    # letting the morphable codes chase the silhouette only walks the
    # prior's null space, see docs/FITTING.md) or "full"
    sil_trainable: str = "rigid"


def init_params(model: FlameModel, image_size: int) -> Dict[str, jnp.ndarray]:
    J = model.num_joints
    return {
        "shape": jnp.zeros((model.n_shape,)),
        "exp": jnp.zeros((model.n_exp,)),
        "pose": jnp.zeros((J * 3,)),
        "cam_r": jnp.zeros((3,)),
        # start the head a few face-heights in front of the camera; the
        # rigid stage corrects it
        "cam_t": jnp.array([0.0, 0.0, 1.0]),
    }


def _stage_masks(params, freeze_shape: bool = False) -> Dict[str, Dict[str, float]]:
    """Which entries train in each stage (1.0 = train).

    With ``freeze_shape`` the identity code never trains in ANY stage —
    used by `fit_two_photos` so the expression fit cannot drift the shape
    it was initialized with (the recombined mesh stays self-consistent).
    """
    zeros = jax.tree.map(lambda x: jnp.zeros_like(x), params)

    def only(keys, extra=None):
        m = dict(zeros)
        for k in keys:
            m[k] = jnp.ones_like(params[k])
        if extra:
            for k, v in extra.items():
                m[k] = v
        return m

    # global rotation lives in pose[0:3]
    global_rot = jnp.zeros_like(params["pose"]).at[:3].set(1.0)
    rigid = only(["cam_r", "cam_t"], extra={"pose": global_rot})
    expr = only(["exp", "cam_t"], extra={"pose": jnp.ones_like(params["pose"])})
    full = jax.tree.map(lambda x: jnp.ones_like(x), params)
    if freeze_shape:
        full = dict(full)
        full["shape"] = jnp.zeros_like(params["shape"])
    return {"rigid": rigid, "expression": expr, "full": full}


def _residuals(
    params, model: FlameModel, lmk2d: jnp.ndarray, K: jnp.ndarray,
    cfg: FitConfig, lmk_weight: jnp.ndarray,
):
    """Weighted least-squares residual vector: landmark reprojection in
    REFERENCE PIXELS (error scaled to a 300 px-focal camera, so regularizer
    weights act at sub-pixel scale regardless of image size) followed by the
    code priors. cost = 0.5 * sum(residuals**2)."""
    verts = flame_forward(model, params["shape"], params["exp"], params["pose"])
    l3d = flame_landmarks(model, verts, params["pose"])
    uv = project_points(l3d, params["cam_r"], params["cam_t"], K)
    r_data = (uv - lmk2d) * (300.0 / K[0, 0]) * jnp.sqrt(lmk_weight)[:, None]
    return jnp.concatenate([
        r_data.reshape(-1),
        jnp.sqrt(cfg.w_shape) * params["shape"],
        jnp.sqrt(cfg.w_exp) * params["exp"],
        jnp.sqrt(cfg.w_pose) * params["pose"][3:],
    ])


def _loss_fn(params, model, lmk2d, K, cfg, lmk_weight):
    r = _residuals(params, model, lmk2d, K, cfg, lmk_weight)
    return 0.5 * jnp.sum(r * r)


def _lm_stage_runner(res_fn, P: int):
    """One Levenberg-Marquardt stage as a jitted `lax.scan`.

    res_fn: flat (P,) params -> (R,) residual vector. Each iteration forms
    the full Jacobian (jacfwd — R and P are both tiny), solves the damped
    normal equations, and accepts/rejects branchlessly; `mask_flat` zeroes
    the Jacobian columns (and updates) of frozen parameters. Returns
    (flat_params, final_cost).
    """

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(flat, mask_flat, steps: int):
        def body(carry, _):
            p, lam, cost = carry
            r = res_fn(p)
            J = jax.jacfwd(res_fn)(p) * mask_flat[None, :]
            A = J.T @ J + lam * jnp.eye(P, dtype=p.dtype)
            delta = -jnp.linalg.solve(A, J.T @ r) * mask_flat
            p_new = p + delta
            r_new = res_fn(p_new)
            c_new = 0.5 * jnp.sum(r_new * r_new)
            ok = c_new < cost
            p = jnp.where(ok, p_new, p)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e8)
            cost = jnp.where(ok, c_new, cost)
            return (p, lam, cost), None

        r0 = res_fn(flat)
        c0 = 0.5 * jnp.sum(r0 * r0)
        (flat, _, cost), _ = jax.lax.scan(
            body, (flat, jnp.float32(1e-2), c0), None, length=steps
        )
        return flat, cost

    return run


def canonicalize_global(model: FlameModel, params: Dict[str, np.ndarray]):
    """Fold the fitted global rotation into the camera (gauge fix).

    Landmarks only observe cam_R @ R_global, so the optimizer splits the
    head rotation arbitrarily between pose[:3] and cam_r — but the pipeline
    contract (apps/generate_face.py consumes MICA/tracker-style meshes) is a
    CANONICAL mesh with the rigid transform in the camera. The fold is
    exact: with G the global rotation about the root joint j0,
    v(G) = G (v(I) - j0) + j0, hence
      cam_R' = cam_R @ G,  cam_t' = cam_t + cam_R @ (I - G) @ j0,
    and pose[:3] = 0 reproduces identical projections.
    """
    from scipy.spatial.transform import Rotation

    p = {k: np.asarray(v).copy() for k, v in params.items()}
    g = p["pose"][:3]
    if float(np.abs(g).max()) == 0.0:
        return p
    G = Rotation.from_rotvec(g).as_matrix()
    betas = jnp.concatenate([jnp.asarray(p["shape"]), jnp.asarray(p["exp"])])
    v_shaped = model.v_template + jnp.einsum("vks,s->vk", model.shapedirs, betas)
    j0 = np.asarray(model.j_regressor @ v_shaped)[0]
    Rc = Rotation.from_rotvec(np.asarray(p["cam_r"])).as_matrix()
    p["cam_r"] = Rotation.from_matrix(Rc @ G).as_rotvec().astype(np.float32)
    p["cam_t"] = (np.asarray(p["cam_t"]) + Rc @ (j0 - G @ j0)).astype(np.float32)
    p["pose"][:3] = 0.0
    return p


def fit_landmarks(
    model: FlameModel,
    lmk2d: np.ndarray,            # (L, 2) pixel coords, ibug-68 order when L=68
    K: np.ndarray,                # (3, 3) or (4, 4) intrinsics
    cfg: Optional[FitConfig] = None,
    init: Optional[Dict[str, jnp.ndarray]] = None,
    image_size: int = 256,
    freeze_shape: bool = False,
    mask: Optional[np.ndarray] = None,  # (S, S) subject matte -> +silhouette
    lmk_conf: Optional[np.ndarray] = None,  # (L,) per-landmark confidence
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Fit FLAME parameters to one photo's 2D landmarks.

    Solver: staged Levenberg-Marquardt, each stage ONE jitted `lax.scan`.
    The problem is a tiny nonlinear least squares (~300 residuals, ~170
    parameters): the full Jacobian fits trivially on chip, one (P, P) solve
    per iteration beats hundreds of first-order steps (the round-3 Adam loop
    plateaued ~8 px on known-parameter ground truth; LM reaches the noise
    floor in ~40 iterations — tools/eval_flame_fit.py). Lambda adapts by
    branchless accept/reject so the scan body is compilable. Stage masks
    zero the Jacobian columns of frozen parameters (the reference rebuilds
    torch optimizers per stage, tracker.py:117-144).

    Returns (params, info): per-stage final costs + mean px reprojection err.
    """
    cfg = cfg or FitConfig()
    K = jnp.asarray(np.asarray(K, np.float32)[:3, :3])
    lmk2d = jnp.asarray(np.asarray(lmk2d, np.float32))
    L = lmk2d.shape[0]
    weight = np.ones((L,), np.float32)
    if L == 68:  # contour-first ibug layout (flame_landmarks's output order)
        weight[:17] = cfg.w_contour
    if lmk_conf is not None:
        # detector confidence (0 = unobserved: occlusion, profile view);
        # weights multiply the squared residual, so confidences act as
        # per-landmark inverse noise variances
        weight = weight * np.asarray(lmk_conf, np.float32)
    weight = jnp.asarray(weight)

    params = init or init_params(model, image_size)
    masks = _stage_masks(params, freeze_shape=freeze_shape)
    flat0, unravel = jax.flatten_util.ravel_pytree(
        {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    )
    P = flat0.shape[0]

    run = _lm_stage_runner(
        lambda f: _residuals(unravel(f), model, lmk2d, K, cfg, weight), P
    )
    info = {}
    flat = flat0
    # with NO observed landmarks (a pure-silhouette fit) the landmark
    # stages would minimize the priors alone — shrinking whatever codes the
    # caller initialized toward zero for no data reason; skip them
    stages = () if float(np.asarray(weight).max()) == 0 else (
        "rigid", "expression", "full")
    for name in stages:
        mask_flat, _ = jax.flatten_util.ravel_pytree(
            {k: jnp.asarray(masks[name][k], jnp.float32) for k in params}
        )
        flat, cost = run(flat, mask_flat, cfg.steps_per_stage)
        info[f"loss_{name}"] = float(cost)

    if mask is not None and (cfg.w_sil_inside > 0 or cfg.w_sil_cover > 0):
        # 4th stage: landmark + silhouette coupling (the shape-constraining
        # half of the tracker's photometric stage — see fitting/silhouette.py)
        from morphablediffusion_tpu.fitting import silhouette as sil

        mask_np = np.asarray(mask).astype(bool)
        S = mask_np.shape  # (h, w) — photos need not be square
        dt_out = jnp.asarray(sil.mask_to_dt(mask_np))
        contour = jnp.asarray(sil.mask_contour(mask_np, cfg.sil_contour_n))
        px_scale = float(300.0 / np.asarray(K)[0, 0])
        sil_stage = "rigid" if cfg.sil_trainable == "rigid" else "full"
        full_mask_flat, _ = jax.flatten_util.ravel_pytree(
            {k: jnp.asarray(masks[sil_stage][k], jnp.float32) for k in params}
        )

        def sil_res_fn(f, vis, deadband, corr):
            p = unravel(f)
            verts = flame_forward(model, p["shape"], p["exp"], p["pose"])
            uv = project_points(verts, p["cam_r"], p["cam_t"], K)
            r_in, r_cov = sil.silhouette_residuals(
                uv, vis, dt_out, *corr, px_scale,
                cfg.w_sil_inside, cfg.w_sil_cover, deadband_px=deadband,
            )
            return jnp.concatenate(
                [_residuals(p, model, lmk2d, K, cfg, weight), r_in, r_cov]
            )

        contour_np = np.asarray(contour)
        for _ in range(cfg.sil_rounds):
            p_np = {k: np.asarray(v) for k, v in unravel(flat).items()}
            vis_np = sil.vertex_visibility(model, p_np, np.asarray(K), S)
            vpx = sil._verts_px(model, p_np, np.asarray(K))[:, :2]
            deadband = sil.vertex_spacing_px(vpx, vis_np)
            corr = sil.contour_correspondences(
                contour_np, sil.render_silhouette(model, p_np, np.asarray(K), S),
                vpx, vis_np, max_px=0.15 * min(S), target_mask=mask_np,
            )
            run_sil = _lm_stage_runner(
                functools.partial(
                    sil_res_fn, vis=jnp.asarray(vis_np), deadband=deadband,
                    corr=tuple(jnp.asarray(c) for c in corr),
                ), P
            )
            flat, cost = run_sil(flat, full_mask_flat, cfg.steps_per_stage)
        info["loss_silhouette"] = float(cost)

    params = unravel(flat)

    verts = flame_forward(model, params["shape"], params["exp"], params["pose"])
    uv = project_points(
        flame_landmarks(model, verts, params["pose"]),
        params["cam_r"], params["cam_t"], K,
    )
    obs = (weight > 0).astype(jnp.float32)  # report err on observed lmks only
    info["mean_px_err"] = float(
        jnp.sum(jnp.linalg.norm(uv - lmk2d, axis=-1) * obs) / jnp.sum(obs)
    )
    return canonicalize_global(
        model, {k: np.asarray(v) for k, v in params.items()}
    ), info


def fit_two_photos(
    model: FlameModel,
    lmk_input: np.ndarray,
    lmk_exp: np.ndarray,
    K: np.ndarray,
    cfg: Optional[FitConfig] = None,
    mask_input: Optional[np.ndarray] = None,  # subject mattes -> silhouette
    mask_exp: Optional[np.ndarray] = None,    # stage per photo (see fit_landmarks)
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Identity from the input photo + expression/pose from the expression
    photo -> retargeted vertices (the generate_face.sh stage-1/2 contract:
    reference MICA demo.py identity codes injected into the tracker's fit).

    Sequential, because the expression photo may show a DIFFERENT person
    (the reference retargets a stranger's expression onto the input
    identity, third_party/retarget_identity.py): first fit the input photo
    for identity, then fit the expression photo with that shape FROZEN so
    its exp/pose absorb everything else — exactly the tracker-with-injected-
    MICA-codes behavior. The returned mesh is canonical (global-rotation
    gauge folded into the discarded camera, `canonicalize_global`).
    """
    cfg = cfg or FitConfig()
    p_in, info_in = fit_landmarks(model, lmk_input, K, cfg, mask=mask_input)
    init = init_params(model, 256)
    init["shape"] = jnp.asarray(p_in["shape"])
    p_exp, info_exp = fit_landmarks(
        model, lmk_exp, K, cfg, init=init, freeze_shape=True, mask=mask_exp
    )
    verts = flame_forward(
        model,
        jnp.asarray(p_in["shape"]),      # identity: input photo
        jnp.asarray(p_exp["exp"]),       # expression/pose: expression photo
        jnp.asarray(p_exp["pose"]),      # canonical (global folded out)
    )
    info = {f"input_{k}": v for k, v in info_in.items()}
    info.update({f"exp_{k}": v for k, v in info_exp.items()})
    return np.asarray(verts), info
