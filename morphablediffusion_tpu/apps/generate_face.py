"""Face avatar generation CLI.

Parity target: /root/reference/generate_face.py — same flags (:91-106), same
virtual hemisphere trajectory (radius 4.5, y-angle -90..90, f=1545.24, :25-45,
:166-173), same real trajectory pkl format (:137-139,162-164), the same
hard-coded MICA->FaceScape mesh alignment (:203-212), the 17-tile output
strip (:243-253), and the NeuS2 export (transform.json with y/z-flipped c2w
+ white-thresholded RGBA views, :145-192,255-262).

Run:
  python -m morphablediffusion_tpu.apps.generate_face \
      --input_img demo/in.png --exp_img demo/exp.png --mesh mesh.ply \
      --ckpt ckpt/facescape_flame.orbax --output_dir out/

Background removal: an alpha channel is used directly; plain RGB photos are
matted in-pipeline (--matting auto: carvekit/rembg if installed, else the
in-repo color-model matting — preprocessing/matting.py; the reference shells
out to carvekit, a host-side CUDA dep, generate_face.py:47-69).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np
from PIL import Image
from scipy.spatial.transform import Rotation as Rot

# MICA->FaceScape alignment constants (generate_face.py:206-211)
MICA_SCALE = 1.087
MICA_POSE = np.asarray(
    [1.6811e00, -2.6845e-02, -2.8883e-02, 8.5418e-04, -3.4041e-03, 1.0564e-02]
)
CAPSTUDIO_AXES = np.asarray([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])
VIRTUAL_FOCAL = 1545.23757707405


def generate_camera_trajectory(num_cameras=16, radius=4.5):
    """Hemisphere sweep: y-angle -90..90 deg, x-angle -180 (generate_face.py:25-45)."""
    Ks, RTs = [], []
    for y_angle in np.linspace(-90, 90, num_cameras):
        y = np.radians(y_angle)
        position = np.asarray([radius * np.sin(y), 0.0, radius * np.cos(y)])
        R = Rot.from_euler("xyz", (-180.0, y_angle, 0.0), degrees=True).as_matrix()
        RT = np.zeros((3, 4))
        RT[:3, :3] = R
        RT[:3, 3] = (-R @ position.reshape(3, 1)).reshape(3)
        K = np.eye(4)
        K[:3, :3] = np.asarray(
            [[VIRTUAL_FOCAL, 0, 128.0], [0, VIRTUAL_FOCAL, 128.0], [0, 0, 1.0]]
        )
        Ks.append(K)
        RTs.append(RT)
    return np.stack(Ks), np.stack(RTs)


def align_mica_mesh(verts: np.ndarray) -> np.ndarray:
    """Hard-coded SE(3)+scale alignment of MICA/metrical-tracker FLAME meshes
    to the FaceScape training world (generate_face.py:203-212)."""
    v = verts * MICA_SCALE
    R = Rot.from_rotvec(MICA_POSE[:3]).as_matrix()
    v = (R @ v.T).T + MICA_POSE[3:]
    v = v * 2.5
    return (CAPSTUDIO_AXES @ v.T).T


def load_input_image(path, image_size=256, matting="auto"):
    """RGB(A) file -> white-composited [-1,1] float (S, S, 3).

    Non-alpha inputs are matted in-pipeline (reference parity:
    generate_face.py:47-69 runs carvekit inside the CLI) — see
    preprocessing/matting.py for the backend ladder; ``matting='none'``
    reproduces the old --rgba_input_ok behavior.
    """
    from PIL import Image

    from morphablediffusion_tpu.data.common import load_rgba_white

    has_alpha = np.asarray(Image.open(path)).shape[-1] == 4
    if has_alpha or matting == "none":
        return load_rgba_white(path, image_size)

    from morphablediffusion_tpu.preprocessing.matting import matte

    rgb = np.asarray(Image.open(path).convert("RGB"))
    rgba = matte(rgb, backend=matting)
    img = rgba.astype(np.float32) / 255.0
    alpha = img[..., 3:]
    comp = np.uint8((img[..., :3] * alpha + 1.0 - alpha) * 255.0)
    pil = Image.fromarray(comp).resize((image_size,) * 2, Image.BICUBIC)
    return np.asarray(pil).astype(np.float32) / 255.0 * 2.0 - 1.0


def build_inference_batch(input_img, Ks, RTs, vertices, max_vertices):
    from morphablediffusion_tpu.data.common import pad_vertices

    N = Ks.shape[0]
    verts, mask = pad_vertices(vertices.astype(np.float32), max_vertices)
    return {
        "input_image": input_img[None].astype(np.float32),
        "input_elevation": np.zeros((1, 1), np.float32),
        "input_azimuth": np.zeros((1, 1), np.float32),
        "target_elevation": np.zeros((1, N), np.float32),
        "target_azimuth": np.zeros((1, N), np.float32),
        "target_K": Ks[None].astype(np.float32),
        "target_RT": RTs[None].astype(np.float32),
        "vertices": verts[None],
        "vertex_mask": mask[None],
    }


def to_uint8(img):
    return ((np.clip(img, -1, 1) + 1) * 0.5 * 255).astype(np.uint8)


def save_strip(input_img, views, path):
    """17-tile horizontal strip: input | view 0..15 (generate_face.py:243-253)."""
    tiles = [to_uint8(input_img)] + [to_uint8(v) for v in views]
    Image.fromarray(np.concatenate(tiles, axis=1)).save(path)


def export_neus2(root, views, Ks, RTs):
    """NeuS2-format dataset: transform.json + RGBA views with >240-white
    background masked out (generate_face.py:145-192,255-262)."""
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    d = {"w": 256, "h": 256, "aabb_scale": 1.0, "scale": 1.0,
         "offset": [0.5, 0.5, 0.5], "frames": []}
    for idx in range(len(views)):
        E = np.eye(4)
        E[:3, :4] = RTs[idx]
        c2w = np.linalg.inv(E)
        c2w[:, 1] *= -1
        c2w[:, 2] *= -1
        d["frames"].append(
            {
                "file_path": f"images/{str(idx).zfill(2)}.png",
                "transform_matrix": c2w.tolist(),
                "intrinsic_matrix": np.asarray(Ks[idx])[:3, :3].tolist(),
            }
        )
        img = to_uint8(views[idx])
        alpha = (~np.all(img > 240, axis=-1)).astype(np.uint8) * 255
        rgba = np.concatenate([img, alpha[..., None]], axis=-1)
        Image.fromarray(rgba, "RGBA").save(root / "images" / f"{str(idx).zfill(2)}.png")
    (root / "transform.json").write_text(json.dumps(d, indent=4))


def main(argv=None):
    from morphablediffusion_tpu.utils.compile_cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_img", type=str, required=True)
    parser.add_argument("--exp_img", type=str, default="")
    parser.add_argument("--mesh", type=str, required=True)
    parser.add_argument("--cfg", type=str, default="configs/facescape.yaml")
    parser.add_argument("--ckpt", type=str, default="ckpt/facescape_flame.ckpt")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--cfg_scale", type=float, default=2.0)
    # reference default 8 (memory knob on a 2080 Ti); 0 = all 16 views in one
    # batch, the TPU fast path — a v5e chip fits the full serving graph
    parser.add_argument("--batch_view_num", type=int, default=0)
    parser.add_argument("--seed", type=int, default=6033)
    parser.add_argument("--sampler", type=str, default="ddim")
    parser.add_argument("--sample_steps", type=int, default=50)
    parser.add_argument("--eta", type=float, default=1.0,
                        help="DDIM eta (reference uses 1.0; 0 = deterministic)")
    parser.add_argument("--camera_trajectory", type=str, default="virtual",
                        choices=["real", "virtual"])
    parser.add_argument("--trajectory_pkl", type=str,
                        default="./assets/facescape_test_traj.pkl")
    parser.add_argument("--prepare_neus2_data", action="store_true")
    parser.add_argument("--no_mica_alignment", action="store_true",
                        help="skip the hard-coded MICA->FaceScape alignment "
                             "(mesh already in training world coordinates)")
    parser.add_argument("--view_parallel", action="store_true",
                        help="shard the synchronized-view axis across all "
                             "visible TPU chips (multi-chip inference)")
    parser.add_argument("--f32_params", action="store_true",
                        help="keep fp32 weights (default: bf16 serving cast)")
    parser.add_argument("--w8a8", action="store_true",
                        help="serve the UNet's internal convs in W8A8 int8 "
                             "(~2x MXU conv throughput; ops/int8.py). Same "
                             "checkpoints — quantization happens in-graph")
    parser.add_argument("--matting", type=str, default="auto",
                        choices=["auto", "native", "none"],
                        help="background removal for non-alpha inputs: "
                             "auto = carvekit/rembg if installed else the "
                             "in-repo color-model matting; none = treat the "
                             "photo as already clean")
    flags = parser.parse_args(argv)

    import jax

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.sampling import SyncDDIMSampler
    from morphablediffusion_tpu.utils.checkpoint import CheckpointManager
    from morphablediffusion_tpu.utils.config import load_config
    from morphablediffusion_tpu.utils.mesh_io import load_mesh_vertices, read_pickle

    img_name = Path(flags.input_img).stem
    exp_name = Path(flags.exp_img).stem if flags.exp_img else "mesh"

    cfg = load_config(flags.cfg)
    if flags.w8a8:
        cfg.model.unet.w8a8 = True

    input_img = load_input_image(flags.input_img, cfg.model.image_size,
                                 matting=flags.matting)

    if flags.camera_trajectory == "real":
        cams = read_pickle(flags.trajectory_pkl)
        Ks = np.stack(
            [np.block([[np.asarray(k), np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]])
             for k in cams["intrinsics"][: cfg.model.view_num]]
        )
        RTs = np.stack([np.asarray(rt)[:3] for rt in cams["extrinsics"][: cfg.model.view_num]])
    else:
        Ks, RTs = generate_camera_trajectory(cfg.model.view_num)

    verts = load_mesh_vertices(flags.mesh)
    if not flags.no_mica_alignment:
        verts = align_mica_mesh(verts)

    # checkpoints that ship trained spconv (`xyzc_net`) weights select the
    # reference-exact fine conditioner, cropped to this mesh — the model is
    # therefore constructed only after peeking at the checkpoint
    state_dict = None
    if str(flags.ckpt).endswith((".ckpt", ".pt", ".pth")):
        from morphablediffusion_tpu.utils.torch_import import load_torch_state_dict

        state_dict = load_torch_state_dict(flags.ckpt)
        autoselect_fine_conditioner(cfg.model, state_dict, verts)
    model = MorphableDiffusion(cfg.model)

    batch = build_inference_batch(input_img, Ks, RTs, verts, cfg.model.max_vertices)
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}

    params = load_params(model, batch, flags.ckpt, state_dict=state_dict)
    if not flags.f32_params:
        from morphablediffusion_tpu.utils.checkpoint import (
            cast_params_for_serving,
        )

        params = cast_params_for_serving(params)
    sampler = SyncDDIMSampler(model, sample_steps=flags.sample_steps,
                              batch_view_num=flags.batch_view_num,
                              eta=flags.eta)
    vs = None
    if flags.view_parallel and len(jax.devices()) > 1:
        from morphablediffusion_tpu.parallel.mesh import (
            create_view_mesh, view_sharding,
        )

        n = len(jax.devices())
        assert cfg.model.view_num % n == 0, (
            f"view_num {cfg.model.view_num} must divide over {n} devices"
        )
        vs = view_sharding(create_view_mesh(jax.devices()))
    fn = jax.jit(
        lambda p, b, r: sampler.sample(p, b, r, flags.cfg_scale,
                                       view_sharding=vs)[0]
    )
    images = np.asarray(fn(params, batch, jax.random.key(flags.seed)))[0]

    out = Path(flags.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_strip(input_img, list(images), out / f"{img_name}_{exp_name}.png")
    print(f"wrote {out / f'{img_name}_{exp_name}.png'}")

    if flags.prepare_neus2_data:
        neus2_root = out / "neus2_data" / f"{img_name}_{exp_name}"
        export_neus2(neus2_root, list(images), Ks, RTs)
        print(f"wrote NeuS2 data to {neus2_root}")


def autoselect_fine_conditioner(model_cfg, state_dict, verts=None) -> bool:
    """Switch `mesh_voxel_mode` to 'fine' when the checkpoint carries trained
    spconv weights (`spatial_volume.xyzc_net.*` — present in every published
    morphable-diffusion .ckpt) and the config left the conditioner at its
    default. The coarse TPU-native redesign cannot consume those weights
    (utils/config.py); the fine dense emulation reproduces the reference
    field exactly (tests/test_mesh_voxel_fine.py).

    With a known mesh the static fine grid is cropped to the mesh's own
    `out_sh` (ceil(extent/voxel) rounded up to a multiple of 4 via (sh|3)+1,
    facescape.py:170-175) — the scatter indices max out strictly below it,
    so the crop is exact, and compute scales with the mesh, not the
    dataset-max default."""
    if model_cfg.mesh_voxel_mode != "coarse":
        return False
    if not any(k.startswith("spatial_volume.xyzc_net.") for k in state_dict):
        return False
    model_cfg.mesh_voxel_mode = "fine"
    if verts is not None:
        ext_dhw = (verts.max(axis=0) - verts.min(axis=0))[::-1]
        sh = np.ceil(ext_dhw / model_cfg.fine_voxel_size).astype(np.int64)
        model_cfg.fine_grid_shape = tuple(int(s | 3) + 1 for s in sh)
    print(
        "checkpoint ships xyzc_net weights: using the fine-grid conditioner "
        f"(grid {model_cfg.fine_grid_shape} @ {model_cfg.fine_voxel_size} m)"
    )
    return True


def _abstract_params(model, batch):
    import jax

    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    b = dict(batch)
    m = model.cfg
    b["target_image"] = jax.numpy.zeros(
        (1, m.view_num, m.image_size, m.image_size, 3)
    )
    return rngs, b


def load_params(model, batch, ckpt_path, state_dict=None):
    """Load params from an Orbax run dir, a torch .ckpt (imported), or — for
    smoke runs — 'random' to initialize fresh weights."""
    import jax

    rngs, b = _abstract_params(model, batch)
    init = lambda r, bb: model.init(r, bb, method="init_fn")
    if ckpt_path == "random":
        return jax.jit(init)(rngs, b)
    if str(ckpt_path).endswith((".ckpt", ".pt", ".pth")):
        from morphablediffusion_tpu.utils.torch_import import import_torch_checkpoint

        # the importer copies checkpoint tensors into a freshly-initialized
        # template tree (strict=False semantics: unmapped paths keep init)
        like = jax.jit(init)(rngs, b)
        return import_torch_checkpoint(ckpt_path, model.cfg, like=like,
                                       state_dict=state_dict)
    from morphablediffusion_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_path)
    abstract = jax.eval_shape(init, rngs, b)
    return mgr.restore_params(abstract)


if __name__ == "__main__":
    main()
