"""FLAME 2020 morphable head model as pure JAX functions.

In-tree replacement for the mesh-fitting stack the reference vendors as
third_party checkouts (/root/reference/third_party/MICA/models/flame.py,
/root/reference/third_party/metrical-tracker/flame/FLAME.py + flame/lbs.py,
both torch + pytorch3d + CUDA). Here the whole morphable model — shape/
expression blendshapes, pose-corrective blendshapes, joint regression,
linear blend skinning, and barycentric landmark embedding — is one
jit-friendly pure function over a pytree of constants, so landmark fitting
(fit.py) runs as a single compiled optimization loop on TPU or CPU with no
external frameworks.

Data: the user-downloaded FLAME2020 `generic_model.pkl` and
`landmark_embedding.npy` (download_data.sh), i.e. exactly the assets the
reference's pipeline needs — but none of its vendored torch code. Tests use
`random_model` instead, so the suite never needs the licensed files.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlameModel:
    """Constants of the morphable model (all jnp arrays; J = #joints)."""

    v_template: jnp.ndarray    # (V, 3)
    shapedirs: jnp.ndarray     # (V, 3, n_shape + n_exp)
    posedirs: jnp.ndarray      # ((J-1)*9, V*3) pose-corrective basis
    j_regressor: jnp.ndarray   # (J, V)
    lbs_weights: jnp.ndarray   # (V, J)
    parents: jnp.ndarray       # (J,) int32, parents[0] = -1 encoded as 0
    faces: jnp.ndarray         # (F, 3) int32
    # static 51-landmark embedding (the 17 jaw-contour landmarks are
    # view-dependent; see dynamic tables below)
    lmk_faces: jnp.ndarray     # (L, 3) vertex ids of the landmark triangles
    lmk_bary: jnp.ndarray      # (L, 3)
    # dynamic contour tables indexed by head yaw (79 buckets x 17 landmarks);
    # zeros-shaped placeholders when the embedding file lacks them
    dyn_lmk_faces: jnp.ndarray  # (79, 17, 3)
    dyn_lmk_bary: jnp.ndarray   # (79, 17, 3)
    n_shape: int = dataclasses.field(metadata=dict(static=True), default=100)
    n_exp: int = dataclasses.field(metadata=dict(static=True), default=50)

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]

    @property
    def has_dynamic_contour(self) -> bool:
        return self.dyn_lmk_faces.shape[0] > 1


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Same SO(3) exp map the reference pulls from pytorch3d
    (generate_face.py:18 `so3_exponential_map`); written with a
    jnp.where-guarded angle so it is differentiable at zero.
    """
    # R = I + a*K + b*K^2 with K = skew(rvec) (UNnormalized), a = sin(t)/t,
    # b = (1-cos t)/t^2. Guarding the t->0 limit with Taylor series keeps
    # the gradient finite at exactly zero (a norm/where formulation leaks
    # NaN through the untaken branch under jax.grad).
    sq = jnp.sum(rvec * rvec, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_sq = jnp.where(small, 1.0, sq)
    t = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(t) / t)[..., None]
    b = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(t)) / safe_sq)[..., None]
    x, y, z = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(*rvec.shape[:-1], 3, 3)
    return jnp.eye(3, dtype=rvec.dtype) + a * K + b * (K @ K)


def flame_forward(
    model: FlameModel,
    shape: jnp.ndarray,   # (n_shape,)
    exp: jnp.ndarray,     # (n_exp,)
    pose: jnp.ndarray,    # (J*3,) axis-angle: global, neck, jaw, eyes...
) -> jnp.ndarray:
    """FLAME parameters -> posed vertices (V, 3) in model space.

    Blendshapes + joint regression + kinematic chain + LBS, mirroring the
    standard SMPL-family formulation (the behavior of metrical-tracker's
    flame/lbs.py) as one fused XLA graph: every step is a matmul against a
    model constant, so the whole forward lowers onto the MXU.
    """
    J = model.num_joints
    betas = jnp.concatenate([shape, exp])
    # shape + expression blendshapes
    v_shaped = model.v_template + jnp.einsum("vks,s->vk", model.shapedirs, betas)
    joints = model.j_regressor @ v_shaped  # (J, 3)

    rots = rodrigues(pose.reshape(J, 3))  # (J, 3, 3)
    # pose-corrective blendshapes from the non-root rotations
    pose_feature = (rots[1:] - jnp.eye(3, dtype=rots.dtype)).reshape(-1)
    v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(-1, 3)

    # kinematic chain: accumulate parent-to-child rigid transforms. J is
    # tiny (5) and the chain is a compile-time constant, so a Python loop
    # unrolls into straight-line XLA code (no scan needed).
    parents = np.asarray(jax.device_get(model.parents))
    rel_t = joints - joints[model.parents]  # parents[0] = 0 -> rel_t[0] unused
    world_R = [rots[0]]
    world_t = [joints[0]]
    for j in range(1, J):
        p = int(parents[j])
        world_R.append(world_R[p] @ rots[j])
        world_t.append(world_R[p] @ rel_t[j] + world_t[p])
    world_R = jnp.stack(world_R)  # (J, 3, 3)
    world_t = jnp.stack(world_t)  # (J, 3)

    # skinning transform relative to the rest pose: x -> R x + (t - R j)
    skin_t = world_t - jnp.einsum("jab,jb->ja", world_R, joints)
    W = model.lbs_weights  # (V, J)
    R_v = jnp.einsum("vj,jab->vab", W, world_R)
    t_v = W @ skin_t
    return jnp.einsum("vab,vb->va", R_v, v_posed) + t_v


def _dyn_contour_index(pose: jnp.ndarray) -> jnp.ndarray:
    """Head-yaw bucket (0..78) selecting the jaw-contour embedding row.

    The contour landmarks slide over the mesh as the head turns; the
    published embedding tabulates them per integer yaw degree in
    [-39, 39]. Buckets 0..39 cover yaw 0..39 deg, buckets 40..78 cover
    -1..-39 deg (the table's layout).

    Parity: metrical-tracker flame/lbs.py:58-122 — the head rotation is the
    COMPOSED neck kinematic chain (global @ neck, not global alone), and the
    bucketed angle is `-rot_mat_to_euler(R)` = atan2(+R[2,0], sy) in degrees.
    """
    R = rodrigues(pose[:3]) @ rodrigues(pose[3:6])
    yaw = jnp.degrees(jnp.arctan2(R[2, 0], jnp.hypot(R[0, 0], R[1, 0])))
    y = jnp.clip(jnp.round(yaw), -39, 39).astype(jnp.int32)
    return jnp.where(y >= 0, y, 39 - y)


def flame_landmarks(
    model: FlameModel, verts: jnp.ndarray, pose: jnp.ndarray
) -> jnp.ndarray:
    """Posed vertices -> 3D landmarks via the barycentric embedding.

    Returns (17 + L_static, 3) = the ibug-68 layout (contour first) when the
    dynamic tables are present, else the static set alone.
    """
    static = jnp.einsum("lk,lkc->lc", model.lmk_bary, verts[model.lmk_faces])
    if not model.has_dynamic_contour:
        return static
    idx = _dyn_contour_index(pose)
    faces = model.dyn_lmk_faces[idx]  # (17, 3)
    bary = model.dyn_lmk_bary[idx]    # (17, 3)
    contour = jnp.einsum("lk,lkc->lc", bary, verts[faces])
    return jnp.concatenate([contour, static], axis=0)


def project_points(
    pts: jnp.ndarray, rvec: jnp.ndarray, tvec: jnp.ndarray, K: jnp.ndarray
) -> jnp.ndarray:
    """Perspective projection of (N, 3) world points to (N, 2) pixels."""
    cam = pts @ rodrigues(rvec).T + tvec
    z = jnp.maximum(cam[:, 2:3], 1e-6)
    uv = cam[:, :2] / z
    return uv * jnp.array([K[0, 0], K[1, 1]]) + jnp.array([K[0, 2], K[1, 2]])


# --------------------------------------------------------------------- #
# loading


def load_model(
    pkl_path: str,
    lmk_path: Optional[str] = None,
    n_shape: int = 100,
    n_exp: int = 50,
) -> FlameModel:
    """Load FLAME2020 `generic_model.pkl` (+ `landmark_embedding.npy`).

    The pkl stores shapedirs as (V, 3, 400) with columns [0:300] shape and
    [300:400] expression; we keep the leading n_shape and n_exp of each,
    matching the reference tracker's slicing.
    """
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x, dtype=np.float32):
        if hasattr(x, "todense"):
            x = x.todense()
        return np.asarray(x, dtype=dtype)

    shapedirs = arr(data["shapedirs"])
    shapedirs = np.concatenate(
        [shapedirs[:, :, :n_shape], shapedirs[:, :, 300 : 300 + n_exp]], axis=2
    )
    posedirs = arr(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # ((J-1)*9, V*3)
    parents = arr(data["kintree_table"], np.int64)[0]
    parents[0] = 0  # root's parent is unused; 0 keeps gathers in-bounds
    faces = arr(data["f"], np.int32)

    if lmk_path is not None:
        emb = np.load(lmk_path, allow_pickle=True, encoding="latin1")[()]
        lmk_faces = faces[arr(emb["static_lmk_faces_idx"], np.int32)]
        lmk_bary = arr(emb["static_lmk_bary_coords"])
        dyn_faces = faces[arr(emb["dynamic_lmk_faces_idx"], np.int32)]
        dyn_bary = arr(emb["dynamic_lmk_bary_coords"])
    else:
        lmk_faces = faces[:1]
        lmk_bary = np.full((1, 3), 1.0 / 3, np.float32)
        dyn_faces = np.zeros((1, 17, 3), np.int32)
        dyn_bary = np.zeros((1, 17, 3), np.float32)

    return FlameModel(
        v_template=jnp.asarray(arr(data["v_template"])),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(arr(data["J_regressor"])),
        lbs_weights=jnp.asarray(arr(data["weights"])),
        parents=jnp.asarray(parents.astype(np.int32)),
        faces=jnp.asarray(faces),
        lmk_faces=jnp.asarray(lmk_faces),
        lmk_bary=jnp.asarray(lmk_bary),
        dyn_lmk_faces=jnp.asarray(dyn_faces),
        dyn_lmk_bary=jnp.asarray(dyn_bary),
        n_shape=n_shape,
        n_exp=n_exp,
    )


def random_model(
    rng: np.random.Generator,
    n_verts: int = 128,
    n_shape: int = 8,
    n_exp: int = 4,
    n_landmarks: int = 17,
) -> FlameModel:
    """Small synthetic model with FLAME's structure, for tests (no licensed
    data): a noisy sphere template, random smooth blendshape bases, 5-joint
    chain with distance-based skinning weights."""
    J = 5
    u = rng.normal(size=(n_verts, 3))
    v_template = (u / np.linalg.norm(u, axis=1, keepdims=True)).astype(np.float32)
    v_template *= 0.1
    shapedirs = rng.normal(size=(n_verts, 3, n_shape + n_exp)).astype(np.float32)
    shapedirs *= 0.01
    posedirs = (rng.normal(size=((J - 1) * 9, n_verts * 3)) * 0.001).astype(
        np.float32
    )
    jr = np.abs(rng.normal(size=(J, n_verts))).astype(np.float32)
    jr /= jr.sum(axis=1, keepdims=True)
    joints = jr @ v_template
    d = np.linalg.norm(v_template[:, None] - joints[None], axis=-1)
    w = np.exp(-d / 0.05).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    parents = np.array([0, 0, 1, 1, 1], np.int32)
    n_faces = max(n_landmarks, 4)
    faces = rng.integers(0, n_verts, size=(n_faces, 3)).astype(np.int32)
    bary = rng.uniform(0.1, 1.0, size=(n_landmarks, 3)).astype(np.float32)
    bary /= bary.sum(axis=1, keepdims=True)
    return FlameModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(jr),
        lbs_weights=jnp.asarray(w),
        parents=jnp.asarray(parents),
        faces=jnp.asarray(faces),
        lmk_faces=jnp.asarray(faces[:n_landmarks]),
        lmk_bary=jnp.asarray(bary),
        dyn_lmk_faces=jnp.zeros((1, 17, 3), jnp.int32),
        dyn_lmk_bary=jnp.zeros((1, 17, 3), jnp.float32),
        n_shape=n_shape,
        n_exp=n_exp,
    )
