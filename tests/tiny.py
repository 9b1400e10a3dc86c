"""Tiny model config + synthetic batch for CPU smoke tests."""

import numpy as np
import jax.numpy as jnp

from morphablediffusion_tpu.utils.config import (
    CLIPConfig,
    Config,
    ModelConfig,
    UNetConfig,
)


def tiny_config(view_num=2, projection="perspective"):
    cfg = Config()
    cfg.model = ModelConfig(
        view_num=view_num,
        image_size=64,
        spatial_volume_size=8,
        frustum_volume_depth=8,
        voxel_grid_shape=(16, 16, 16),
        max_vertices=64,
        sample_steps=2,
        projection=projection,
        dtype="float32",
        vae_ch=32,
        vae_ch_mult=(1, 1, 1, 1),
        vae_num_res_blocks=1,
        unet=UNetConfig(
            model_channels=32,
            num_heads=4,
            volume_dims=(8, 16, 32, 64),
            # remat multiplies XLA:CPU compile time (the backward graph is
            # re-expanded per block) for zero benefit at tiny shapes; tests
            # that exercise remat (test_remat) override this explicitly
            use_checkpoint=False,
        ),
        clip=CLIPConfig(width=64, layers=2, num_heads=2, patch_size=14,
                        output_dim=768),
    )
    return cfg


def tiny_batch(cfg, B=1, rng=None, with_targets=True):
    rng = rng or np.random.default_rng(0)
    m = cfg.model
    N, S, Nv = m.view_num, m.image_size, m.max_vertices
    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))

    # cameras on a ring at distance 4 looking at the origin
    poses = []
    for i in range(N):
        a = 2 * np.pi * i / max(N, 1) * 0.2
        R = np.asarray(
            [[np.cos(a), 0, -np.sin(a)], [0, 1, 0], [np.sin(a), 0, np.cos(a)]]
        )
        t = -R @ (R.T @ np.asarray([0, 0, -4.0]))
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses)  # (N, 3, 4)
    K = np.eye(4)
    if m.projection == "perspective":
        K[:3, :3] = np.asarray([[80.0, 0, S / 2], [0, 80.0, S / 2], [0, 0, 1]])
    else:
        K[0, 0] = K[1, 1] = 1 / 0.6
    verts = rng.uniform(-0.2, 0.2, size=(B, Nv, 3))

    batch = {
        "input_image": f32(rng.uniform(-1, 1, (B, S, S, 3))),
        "input_elevation": f32(np.zeros((B, 1))),
        "input_azimuth": f32(np.zeros((B, 1))),
        "target_elevation": f32(np.zeros((B, N))),
        "target_azimuth": f32(np.zeros((B, N))),
        "target_K": f32(np.broadcast_to(K, (B, N, 4, 4))),
        "target_RT": f32(np.broadcast_to(poses, (B, N, 3, 4))),
        "vertices": f32(verts),
        "vertex_mask": f32(np.ones((B, Nv))),
    }
    if with_targets:
        batch["target_image"] = f32(rng.uniform(-1, 1, (B, N, S, S, 3)))
    return batch
