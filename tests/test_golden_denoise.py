"""End-to-end denoise-step golden parity vs the reference.

Chains EVERYTHING the sampler runs per DDIM step — model-level time embed,
spatial-volume build from all noisy views, frustum conditioning, doubled-
batch CFG UNet (predict_with_unconditional_scale), and the DDIM latent
update — through the ACTUAL reference torch modules with shared imported
weights, and requires per-step latent parity. Extends
test_golden_orchestrator (conditioning chain only) to the full step:
reference morphable_diffusion.py:675-739 (denoise_apply + denoise_apply_impl)
vs our `predict_eps_cfg` + `ddim_step`.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_golden_orchestrator import (  # noqa: F401 (fixtures)
    OracleXyzcNet,
    ref_spatial_volume_cls,
)
from tests.test_golden_reference import install_kornia_stub, ref_modules  # noqa: F401
from tests.test_mesh_voxel_fine import SparseConvNetOracle

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_step_modules(ref_spatial_volume_cls, ref_modules):  # noqa: F811
    """The reference classes needed to assemble a denoise step without
    instantiating the full Lightning module (whose __init__ builds the
    VAE + CLIP towers)."""
    from ldm.models.diffusion.morphable_diffusion import (
        SyncDDIMSampler,
        SyncMultiviewDiffusion,
        UNetWrapper,
    )

    RefSV, _ = ref_spatial_volume_cls
    DepthWiseAttention, _, _ = ref_modules
    return RefSV, DepthWiseAttention, UNetWrapper, SyncMultiviewDiffusion, SyncDDIMSampler


def test_full_denoise_step_golden(ref_step_modules, rng):
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.ops import schedules
    from morphablediffusion_tpu.utils.torch_import import import_state_dict
    from tests.tiny import tiny_config

    (RefSV, DepthWiseAttention, UNetWrapper, SyncMultiviewDiffusion,
     SyncDDIMSampler) = ref_step_modules
    torch.manual_seed(11)

    B, N, S, V, D, Nv = 1, 4, 64, 8, 8, 30
    h = S // 8
    TD, VD = 256, 4
    voxel = 0.005
    vol_dims = (64, 128, 256, 512)  # reference-fixed frustum dims (:164)
    cfg_scale = 2.0
    index = 30

    # ---------------- reference stand-in model ----------------
    ref_sv = RefSV(
        time_dim=TD, view_dim=VD, view_num=N, input_image_size=S,
        frustum_volume_depth=D, spatial_volume_size=V,
    ).eval()
    # the reference hardcodes num_views=16 (morphable_diffusion.py:166);
    # the mid-net view mean must pool over the actual N of this tiny setup
    ref_sv.smpl_feature_extractor.num_views = N
    oracle = SparseConvNetOracle().eval()
    with torch.no_grad():
        for bn in oracle.bns.values():
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)
    ref_sv.xyzc_net = OracleXyzcNet(oracle)

    ref_unet = DepthWiseAttention(
        volume_dims=vol_dims, image_size=h, in_channels=8, out_channels=4,
        model_channels=32, attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    ).eval()

    wrapper = UNetWrapper.__new__(UNetWrapper)
    torch.nn.Module.__init__(wrapper)
    wrapper.diffusion_model = ref_unet
    wrapper.drop_conditions = False
    wrapper.drop_scheme = "default"
    wrapper.use_zero_123 = True

    class Standin:
        pass

    m = Standin()
    m.spatial_volume = ref_sv
    m.model = wrapper
    m.time_embed_dim = TD
    m.viewpoint_dim = VD
    m.time_embed = torch.nn.Sequential(
        torch.nn.Linear(TD, TD), torch.nn.SiLU(True), torch.nn.Linear(TD, TD)
    ).eval()
    m.embed_time = types.MethodType(SyncMultiviewDiffusion.embed_time, m)
    m.get_target_view_feats = types.MethodType(
        SyncMultiviewDiffusion.get_target_view_feats, m
    )

    # DDIM tables from the shared beta schedule
    sched = schedules.make_diffusion_schedule()
    m.alphas_cumprod = torch.from_numpy(
        np.asarray(sched.alphas_cumprod, np.float32)
    )
    m.alphas = torch.from_numpy(np.asarray(sched.alphas, np.float32))
    samp = SyncDDIMSampler.__new__(SyncDDIMSampler)
    samp.model = m
    samp.ddpm_num_timesteps = sched.num_timesteps
    samp._make_schedule(50, ddim_eta=1.0, verbose=False)

    # ---------------- shared inputs ----------------
    min_xyz = np.asarray([-0.05, -0.04, -0.06], np.float32)
    cells = rng.permutation(18 * 16 * 14)[:Nv]
    coords_dhw = np.stack(np.unravel_index(cells, (18, 16, 14)), -1).astype(
        np.int32
    )
    coords_dhw[0] = (0, 0, 0)
    coords_dhw[1] = (17, 15, 13)
    verts = np.stack(
        [min_xyz + coords_dhw[:, ::-1].astype(np.float32) * voxel
         for _ in range(B)]
    )

    poses = []
    for i in range(N):
        a = 2 * np.pi * i / N * 0.25
        R = np.asarray([[np.cos(a), 0, -np.sin(a)], [0, 1, 0],
                        [np.sin(a), 0, np.cos(a)]], np.float32)
        t = np.asarray([0.01 * i, -0.02, 1.6], np.float32)
        poses.append(np.concatenate([R, t[:, None]], 1))
    RTs = np.broadcast_to(np.stack(poses), (B, N, 3, 4)).copy()
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = np.asarray([[90.0, 0, S / 2], [0, 90.0, S / 2], [0, 0, 1]])
    Ks = np.broadcast_to(K, (B, N, 4, 4)).copy()

    x_noisy = rng.normal(size=(B, N, 4, h, h)).astype(np.float32)
    x_input = rng.normal(size=(B, 4, h, h)).astype(np.float32) * 0.2
    clip_embed = rng.normal(size=(B, 1, 768)).astype(np.float32)
    t_step = np.full((B,), int(samp.ddim_timesteps[index]), np.int64)
    # zero azimuth/elevation -> (0, 0, 1, 0) per view (both datasets feed
    # zeros; morphable_diffusion.py:383-397)
    v_embed = np.zeros((B, N, VD), np.float32)
    v_embed[..., 2] = 1.0

    # reference-side voxelization aux (facescape.py:165-175)
    tverts = torch.from_numpy(verts)
    min_v = tverts.min(1).values
    max_v = tverts.max(1).values
    bounds = torch.stack([min_v, max_v], 1)
    dhw = tverts[:, :, [2, 1, 0]]
    min_dhw_t = min_v[:, [2, 1, 0]]
    coord_t = torch.round((dhw - min_dhw_t[:, None]) / voxel).int()
    out_sh_t = torch.ceil((max_v[:, [2, 1, 0]] - min_dhw_t) / voxel).int()
    out_sh_t = (out_sh_t | 3) + 1
    batch_t = {
        "vertices": tverts,
        "target_K": torch.from_numpy(Ks),
        "target_RT": torch.from_numpy(RTs),
        "coord": coord_t,
        "out_sh": out_sh_t,
        "bounds": bounds,
    }

    # ---------------- reference denoise trajectory ----------------
    # three chained steps (index, index-1, index-2) with the eta-noise term
    # zeroed on both sides (is_step0 / sigma_noise=0) so the comparison is
    # the deterministic latent trajectory: volume rebuild from the EVOLVING
    # latents -> CFG UNet -> DDIM update, per step
    # (morphable_diffusion.py:701-739).
    n_traj = 3
    ref_traj = []
    ref_e_t0 = None
    with torch.no_grad():
        x_cur = torch.from_numpy(x_noisy)
        target_indices = torch.arange(N)[None].repeat(B, 1)
        for s in range(n_traj):
            idx_s = index - s
            t_s = torch.full((B,), int(samp.ddim_timesteps[idx_s]),
                             dtype=torch.int64)
            t_embed_t = m.embed_time(t_s)
            spatial_volume = ref_sv.construct_spatial_volume(
                x_cur, t_embed_t, torch.from_numpy(v_embed), batch_t
            )
            clip_, vol_feats_, x_concat_ = m.get_target_view_feats(
                torch.from_numpy(x_input), spatial_volume,
                torch.from_numpy(clip_embed), t_embed_t,
                torch.from_numpy(v_embed), target_indices, batch_t,
            )
            x_flat = x_cur.reshape(B * N, 4, h, h)
            t_flat = t_s.repeat_interleave(N)
            e_t = wrapper.predict_with_unconditional_scale(
                x_flat, t_flat, clip_, vol_feats_, x_concat_, cfg_scale
            ).view(B, N, 4, h, h)
            if s == 0:
                ref_e_t0 = e_t
            x_cur = samp.denoise_apply_impl(x_cur, idx_s, e_t, is_step0=True)
            ref_traj.append(x_cur.numpy())
        e_t = ref_e_t0
        ref_x_prev = ref_traj[0]

    # ---------------- ours, with imported weights ----------------
    cfg = tiny_config(view_num=N)
    cfg.model.mesh_voxel_mode = "fine"
    cfg.model.fine_grid_shape = (24, 24, 24)
    cfg.model.fine_voxel_size = voxel
    cfg.model.max_vertices = Nv
    import dataclasses

    cfg.model.unet = dataclasses.replace(cfg.model.unet,
                                         volume_dims=vol_dims)
    model = MorphableDiffusion(cfg.model)

    x_j = jnp.asarray(np.moveaxis(x_noisy, 2, -1))
    x_in_j = jnp.asarray(np.moveaxis(x_input, 1, -1))
    batch_j = {
        "target_K": jnp.asarray(Ks),
        "target_RT": jnp.asarray(RTs),
        "vertices": jnp.asarray(verts),
        "vertex_mask": jnp.ones((B, Nv), jnp.float32),
    }
    t_j = jnp.asarray(t_step.astype(np.int32))
    args = (x_j, t_j, jnp.asarray(clip_embed), x_in_j, jnp.asarray(v_embed),
            batch_j, cfg_scale)
    params = model.init({"params": jax.random.key(0)}, *args,
                        method="predict_eps_cfg")

    sd = {"model.diffusion_model." + k: w.numpy()
          for k, w in ref_unet.state_dict().items()}
    for prefix, mod in [
        ("spatial_volume.target_encoder.", ref_sv.target_encoder),
        ("spatial_volume.smpl_feature_extractor.", ref_sv.smpl_feature_extractor),
        ("spatial_volume.frustum_volume_feats.", ref_sv.frustum_volume_feats),
        ("time_embed.", m.time_embed),
    ]:
        for k, w in mod.state_dict().items():
            sd[prefix + k] = w.numpy()
    sd.update(oracle.spconv_state_dict())

    imported, report = import_state_dict(sd, params)
    assert not report["unmatched_model_paths"], (
        report["unmatched_model_paths"][:5]
    )
    assert report["filled"] == len(sd), (report["filled"], len(sd))

    eps = model.apply(imported, *args, method="predict_eps_cfg")
    eps_np = np.moveaxis(np.asarray(eps), -1, 2)
    np.testing.assert_allclose(eps_np, e_t.numpy(), rtol=5e-3, atol=5e-3)

    dd = schedules.make_ddim_schedule(sched, 50, eta=1.0)
    x_prev = schedules.ddim_step(
        x_j, eps, jnp.asarray(index), dd, sigma_noise=jnp.zeros_like(x_j)
    )
    got = np.moveaxis(np.asarray(x_prev), -1, 2)
    # end-to-end per-step latent parity (VERDICT r2 item 7: < 1e-2 rel)
    denom = np.maximum(np.abs(ref_x_prev), 1e-3)
    assert np.max(np.abs(got - ref_x_prev) / denom) < 1e-2

    # ---------------- multi-step trajectory parity ----------------
    # continue the chain for the remaining steps and require the FINAL
    # latent after n_traj chained steps to match, proving per-step error
    # does not compound through the volume-rebuild -> UNet -> update loop
    # (the trajectory comparison the published-weights claim rests on).
    x_cur_j = x_prev
    for s in range(1, n_traj):
        idx_s = index - s
        t_s = jnp.full((B,), int(samp.ddim_timesteps[idx_s]), jnp.int32)
        eps_s = model.apply(
            imported, x_cur_j, t_s, jnp.asarray(clip_embed), x_in_j,
            jnp.asarray(v_embed), batch_j, cfg_scale,
            method="predict_eps_cfg",
        )
        x_cur_j = schedules.ddim_step(
            x_cur_j, eps_s, jnp.asarray(idx_s), dd,
            sigma_noise=jnp.zeros_like(x_cur_j),
        )
        got_s = np.moveaxis(np.asarray(x_cur_j), -1, 2)
        denom_s = np.maximum(np.abs(ref_traj[s]), 1e-3)
        rel = np.max(np.abs(got_s - ref_traj[s]) / denom_s)
        assert rel < 1e-2, (s, rel)

    # ---------------- W8A8 int8 serving trajectory gate ----------------
    # The quality gate for the int8 harvest (VERDICT r3 item 2): the SAME
    # imported weights served with w8a8=True must keep the 3-step CFG-denoise
    # latent trajectory close to the reference — loosened tolerance (int8
    # symmetric quantization is ~1-2% per conv; the CFG subtraction and
    # 3-step chaining amplify it, but the trajectory must stay on-manifold).
    model_q = MorphableDiffusion(
        dataclasses.replace(
            cfg.model, unet=dataclasses.replace(cfg.model.unet, w8a8=True)
        )
    )
    x_cur_q = x_j
    for s in range(n_traj):
        idx_s = index - s
        t_s = jnp.full((B,), int(samp.ddim_timesteps[idx_s]), jnp.int32)
        eps_q = model_q.apply(
            imported, x_cur_q, t_s, jnp.asarray(clip_embed), x_in_j,
            jnp.asarray(v_embed), batch_j, cfg_scale,
            method="predict_eps_cfg",
        )
        x_cur_q = schedules.ddim_step(
            x_cur_q, eps_q, jnp.asarray(idx_s), dd,
            sigma_noise=jnp.zeros_like(x_cur_q),
        )
        got_q = np.moveaxis(np.asarray(x_cur_q), -1, 2)
        # relative L2 over the whole latent: robust to isolated near-zero
        # entries that the elementwise metric above would divide by
        rel_q = (np.linalg.norm(got_q - ref_traj[s])
                 / np.linalg.norm(ref_traj[s]))
        assert rel_q < 0.05, (s, rel_q)
