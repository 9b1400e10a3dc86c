"""Staged FLAME landmark fitting as one jitted optimization per stage.

Replaces the reference's two vendored fitting stages
(/root/reference/third_party/MICA/demo.py — identity from a photo — and
/root/reference/third_party/metrical-tracker/tracker.py — a ~1000-step
torch Adam photometric+landmark fit with a pytorch3d rasterizer) with a
landmark-only fit that needs nothing outside this repo: detected 2D
landmarks in, FLAME parameters + mesh out.

Design: parameters live in one flat pytree; each stage is an
`optax.adam` loop inside `lax.fori_loop` inside ONE `jax.jit`, with
per-stage trainable masks applied to the gradients (the reference freezes
groups by rebuilding torch optimizers; here a mask multiply keeps a single
compiled graph per stage). Stages follow the tracker's curriculum: rigid
camera alignment first, then expression+jaw, then everything.

Identity retargeting (the reference patches the tracker to inject MICA's
identity codes; third_party/retarget_identity.py does it for the external
path): `fit_two_photos` fits the input photo for identity and the
expression photo for expression/pose, then recombines — same contract,
zero external code.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from morphablediffusion_tpu.fitting.flame import (
    FlameModel,
    flame_forward,
    flame_landmarks,
    project_points,
)


@dataclasses.dataclass
class FitConfig:
    steps_per_stage: int = 300
    lr: float = 1e-2
    # regularizer weights (squared-L2 on the codes, like the tracker's priors)
    w_shape: float = 1e-4
    w_exp: float = 1e-4
    w_pose: float = 1e-2   # non-global joints (neck/jaw/eyes) stay small
    # landmark weighting: the 17 jaw-contour points slide on the mesh, so
    # they get a lower weight than the 51 inner points (only applied to
    # 68-point sets)
    w_contour: float = 0.4


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


def _loss_fn(
    params, model: FlameModel, lmk2d: jnp.ndarray, K: jnp.ndarray,
    cfg: FitConfig, lmk_weight: jnp.ndarray,
):
    verts = flame_forward(model, params["shape"], params["exp"], params["pose"])
    l3d = flame_landmarks(model, verts, params["pose"])
    uv = project_points(l3d, params["cam_r"], params["cam_t"], K)
    # normalize pixel error by focal length so lr is image-size independent
    err = jnp.sum((uv - lmk2d) ** 2, axis=-1) / (K[0, 0] ** 2)
    data = jnp.sum(lmk_weight * err) / jnp.sum(lmk_weight)
    reg = (
        cfg.w_shape * jnp.sum(params["shape"] ** 2)
        + cfg.w_exp * jnp.sum(params["exp"] ** 2)
        + cfg.w_pose * jnp.sum(params["pose"][3:] ** 2)
    )
    return data + reg


def fit_landmarks(
    model: FlameModel,
    lmk2d: np.ndarray,            # (L, 2) pixel coords, ibug-68 order when L=68
    K: np.ndarray,                # (3, 3) or (4, 4) intrinsics
    cfg: Optional[FitConfig] = None,
    init: Optional[Dict[str, jnp.ndarray]] = None,
    image_size: int = 256,
    freeze_shape: bool = False,
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Fit FLAME parameters to one photo's 2D landmarks.

    Returns (params, info) with info carrying the per-stage final losses and
    the mean reprojection error in pixels.
    """
    cfg = cfg or FitConfig()
    K = jnp.asarray(np.asarray(K, np.float32)[:3, :3])
    lmk2d = jnp.asarray(np.asarray(lmk2d, np.float32))
    L = lmk2d.shape[0]
    weight = np.ones((L,), np.float32)
    if L == 68:  # contour-first ibug layout (flame_landmarks's output order)
        weight[:17] = cfg.w_contour
    weight = jnp.asarray(weight)

    params = init or init_params(model, image_size)
    masks = _stage_masks(params, freeze_shape=freeze_shape)
    tx = optax.adam(cfg.lr)

    @jax.jit
    def run_stage(params, mask):
        opt = tx.init(params)

        def body(_, carry):
            p, opt = carry
            grads = jax.grad(_loss_fn)(p, model, lmk2d, K, cfg, weight)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt

        params, _ = jax.lax.fori_loop(0, cfg.steps_per_stage, body, (params, opt))
        return params, _loss_fn(params, model, lmk2d, K, cfg, weight)

    info = {}
    for name in ("rigid", "expression", "full"):
        params, loss = run_stage(params, masks[name])
        info[f"loss_{name}"] = float(loss)

    verts = flame_forward(model, params["shape"], params["exp"], params["pose"])
    uv = project_points(
        flame_landmarks(model, verts, params["pose"]),
        params["cam_r"], params["cam_t"], K,
    )
    info["mean_px_err"] = float(
        jnp.mean(jnp.linalg.norm(uv - lmk2d, axis=-1))
    )
    return {k: np.asarray(v) for k, v in params.items()}, info


def fit_two_photos(
    model: FlameModel,
    lmk_input: np.ndarray,
    lmk_exp: np.ndarray,
    K: np.ndarray,
    cfg: Optional[FitConfig] = None,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """Identity from the input photo + expression/pose from the expression
    photo -> retargeted vertices (the generate_face.sh stage-1/2 contract:
    reference MICA demo.py identity codes injected into the tracker's fit).

    The expression fit reuses the input fit's shape as its initialization
    and keeps it frozen during the expression stage, so the recombined mesh
    is self-consistent.
    """
    cfg = cfg or FitConfig()
    p_in, info_in = fit_landmarks(model, lmk_input, K, cfg)
    init = init_params(model, 256)
    init["shape"] = jnp.asarray(p_in["shape"])
    p_exp, info_exp = fit_landmarks(
        model, lmk_exp, K, cfg, init=init, freeze_shape=True
    )
    verts = flame_forward(
        model,
        jnp.asarray(p_in["shape"]),      # identity: input photo
        jnp.asarray(p_exp["exp"]),       # expression/pose: expression photo
        jnp.asarray(p_exp["pose"]),
    )
    info = {f"input_{k}": v for k, v in info_in.items()}
    info.update({f"exp_{k}": v for k, v in info_exp.items()})
    return np.asarray(verts), info
