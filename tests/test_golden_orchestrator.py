"""Whole-orchestrator golden parity: SpatialVolumeNet vs the reference.

Runs the ACTUAL reference `SpatialVolumeNet.construct_spatial_volume` and
`construct_view_frustum_volume` (morphable_diffusion.py:182-320) end to end —
unprojection -> vertex sampling -> view fusion -> sparse-conv field ->
frustum resample -> FrustumTV3DNet — against our orchestrator with imported
weights.

The only non-importable stage, spconv's CUDA kernels, is anchored by the
dense-masked torch oracle from tests/test_mesh_voxel_fine.py: the reference
model's `xyzc_net` is replaced by the oracle (same semantics spconv defines
its outputs by), and our side runs `mesh_voxel_mode='fine'`, whose exact
equivalence to that oracle is proven separately. Everything else is the
reference's own code.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_golden_reference import (  # noqa: F401 (fixture)
    install_kornia_stub,
    ref_modules,
)
from tests.test_mesh_voxel_fine import SparseConvNetOracle

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def ref_spatial_volume_cls(ref_modules):  # noqa: F811
    """Import the reference SpatialVolumeNet with its heavy deps stubbed."""
    install_kornia_stub()
    for name in ("pytorch_lightning", "tqdm", "trimesh", "clip"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "pytorch_lightning":
                mod.LightningModule = type("LightningModule", (), {})
            if name == "tqdm":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skio = types.ModuleType("skimage.io")
        skio.imsave = lambda *a, **k: None
        skio.imread = lambda *a, **k: None
        sk.io = skio
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = skio

    class SparseConvTensorStub:
        """Carries (features, indices, spatial_shape) to the oracle adapter."""

        def __init__(self, features, indices, spatial_shape, batch_size):
            self.features = features
            self.indices = indices
            self.spatial_shape = spatial_shape
            self.batch_size = batch_size

    if "spconv" not in sys.modules or not hasattr(
        sys.modules.get("spconv.pytorch.core", None), "SparseConvTensor"
    ):
        sp = sys.modules.get("spconv", types.ModuleType("spconv"))
        spp = getattr(sp, "pytorch", types.ModuleType("spconv.pytorch"))
        core = types.ModuleType("spconv.pytorch.core")
        core.SparseConvTensor = SparseConvTensorStub
        spc = types.ModuleType("spconv.pytorch.conv")
        spm = types.ModuleType("spconv.pytorch.modules")

        # benign constructors: the reference SpatialVolumeNet builds its
        # SparseConvNet at __init__, which the test then replaces whole
        # with OracleXyzcNet — these layers are never called.
        class _Stub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, *a, **k):
                raise RuntimeError("spconv stub called")

        spc.SparseConv3d = spc.SubMConv3d = _Stub
        spm.SparseSequential = torch.nn.Sequential
        sp.pytorch = spp
        spp.core, spp.conv, spp.modules = core, spc, spm
        sys.modules.update({
            "spconv": sp, "spconv.pytorch": spp,
            "spconv.pytorch.core": core, "spconv.pytorch.conv": spc,
            "spconv.pytorch.modules": spm,
        })
    from ldm.models.diffusion.morphable_diffusion import SpatialVolumeNet

    return SpatialVolumeNet, SparseConvTensorStub


class OracleXyzcNet(torch.nn.Module):
    """Drop-in for the reference's spconv net inside its per-sample loop:
    dense scatter-mean of the SparseConvTensor contents + oracle forward
    (returns the `.dense()` tensor the reference grid_samples)."""

    def __init__(self, oracle):
        super().__init__()
        self.oracle = oracle

    def forward(self, xyzc):
        D, H, W = [int(s) for s in xyzc.spatial_shape]
        feats = xyzc.features.detach().numpy()
        coords = xyzc.indices[:, 1:].detach().numpy()
        grid = np.zeros((16, D, H, W), np.float32)
        count = np.zeros((D, H, W), np.float32)
        for f, (d, h, w) in zip(feats, coords):
            grid[:, d, h, w] += f
            count[d, h, w] += 1
        nz = count > 0
        grid[:, nz] /= count[nz]
        return self.oracle(
            torch.from_numpy(grid)[None],
            torch.from_numpy(nz.astype(np.float32))[None, None],
        )


def test_orchestrator_golden(ref_spatial_volume_cls, rng):
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.spatial_volume import SpatialVolumeNet
    from morphablediffusion_tpu.utils.torch_import import import_state_dict

    RefSV, _ = ref_spatial_volume_cls
    torch.manual_seed(7)

    B, N, TN, S, V, D, Nv = 2, 16, 4, 64, 8, 8, 30
    TD, VD = 32, 4
    voxel = 0.005

    ref = RefSV(
        time_dim=TD, view_dim=VD, view_num=N, input_image_size=S,
        frustum_volume_depth=D, spatial_volume_size=V,
    ).eval()
    oracle = SparseConvNetOracle().eval()
    with torch.no_grad():
        for bn in oracle.bns.values():
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)
    ref.xyzc_net = OracleXyzcNet(oracle)

    # ---- synthetic batch on the fine voxel lattice ----
    min_xyz = np.asarray([-0.05, -0.04, -0.06], np.float32)
    cells = rng.permutation(18 * 16 * 14)[:Nv]
    coords_dhw = np.stack(np.unravel_index(cells, (18, 16, 14)), -1).astype(
        np.int32
    )
    coords_dhw[0] = (0, 0, 0)
    coords_dhw[1] = (17, 15, 13)
    verts = np.stack([
        min_xyz + coords_dhw[:, ::-1].astype(np.float32) * voxel
        for _ in range(B)
    ])  # (B, Nv, 3) — xyz = reversed dhw

    x = rng.normal(size=(B, N, 4, S // 8, S // 8)).astype(np.float32)
    t_embed = rng.normal(size=(B, TD)).astype(np.float32)
    v_embed = rng.normal(size=(B, N, VD)).astype(np.float32)
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

    # dataset-side voxelization aux (facescape.py:165-175)
    tverts = torch.from_numpy(verts)
    min_v = tverts.min(1).values
    max_v = tverts.max(1).values
    bounds = torch.stack([min_v, max_v], 1)  # (B, 2, 3)
    dhw = tverts[:, :, [2, 1, 0]]
    min_dhw_t = min_v[:, [2, 1, 0]]
    coord_t = torch.round((dhw - min_dhw_t[:, None]) / voxel).int()
    out_sh_t = torch.ceil((max_v[:, [2, 1, 0]] - min_dhw_t) / voxel).int()
    out_sh_t = (out_sh_t | 3) + 1

    batch = {
        "vertices": tverts,
        "target_K": torch.from_numpy(Ks),
        "target_RT": torch.from_numpy(RTs),
        "coord": coord_t,
        "out_sh": out_sh_t,
        "bounds": bounds,
    }
    tidx = torch.from_numpy(
        np.stack([rng.permutation(N)[:TN] for _ in range(B)]).astype(np.int64)
    )

    with torch.no_grad():
        ref_vol = ref.construct_spatial_volume(
            torch.from_numpy(x), torch.from_numpy(t_embed),
            torch.from_numpy(v_embed), batch,
        )  # (B, 64, V, V, V)
        ref_feats, ref_depth = ref.construct_view_frustum_volume(
            ref_vol, torch.from_numpy(t_embed), torch.from_numpy(v_embed),
            tidx, batch,
        )

    # ---- ours, with imported weights ----
    ours = SpatialVolumeNet(
        view_num=N, input_image_size=S, spatial_volume_size=V,
        frustum_volume_depth=D, mesh_voxel_mode="fine",
        fine_grid_shape=(24, 24, 24), fine_voxel_size=voxel,
        volume_dims=(64, 128, 256, 512), dtype=jnp.float32,
    )
    x_j = jnp.asarray(np.moveaxis(x, 2, -1))
    vmask = jnp.ones((B, Nv), jnp.float32)
    args = (x_j, jnp.asarray(t_embed), jnp.asarray(v_embed), jnp.asarray(Ks),
            jnp.asarray(RTs), jnp.asarray(verts), vmask)
    params = ours.init(jax.random.key(0), *args,
                       method="construct_spatial_volume")
    # flax init is lazy per-method: init the frustum stage too and merge
    # (submodule name sets are disjoint across the two methods)
    ti_np = tidx.numpy()
    v_sel = jnp.asarray(np.stack([v_embed[b, ti_np[b]] for b in range(B)]))
    poses_sel = jnp.asarray(np.stack([RTs[b, ti_np[b]] for b in range(B)]))
    Ks_sel = jnp.asarray(np.stack([Ks[b, ti_np[b]] for b in range(B)]))
    dummy_vol = jnp.zeros((B, V, V, V, 64), jnp.float32)
    params_fr = ours.init(
        jax.random.key(1), dummy_vol, jnp.asarray(t_embed), v_sel,
        poses_sel, Ks_sel, method="construct_view_frustum_volume",
    )
    params = {"params": {**params["params"], **params_fr["params"]}}

    sd = {}
    for prefix, mod in [
        ("spatial_volume.target_encoder.", ref.target_encoder),
        ("spatial_volume.smpl_feature_extractor.",
         ref.smpl_feature_extractor),
        ("spatial_volume.frustum_volume_feats.", ref.frustum_volume_feats),
    ]:
        for k, w in mod.state_dict().items():
            sd[prefix + k] = w.numpy()
    sd.update(oracle.spconv_state_dict())
    wrapped = {"params": {"spatial_volume": params["params"]}}
    imported, report = import_state_dict(sd, wrapped)
    assert not report["unmatched_model_paths"], (
        report["unmatched_model_paths"][:5]
    )
    assert report["filled"] == len(sd), (report["filled"], len(sd))
    new = {"params": imported["params"]["spatial_volume"]}

    bound = ours.bind(new)
    got_vol = bound.construct_spatial_volume(*args)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_vol), -1, 1), ref_vol.numpy(),
        rtol=1e-3, atol=1e-3,
    )

    # frustum stage at the same target indices
    got_feats, got_depth = bound.construct_view_frustum_volume(
        got_vol, jnp.asarray(t_embed), v_sel, poses_sel, Ks_sel
    )
    for w_key, ref_val in ref_feats.items():
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(got_feats[w_key]), -1, 1),
            ref_val.numpy(), rtol=2e-3, atol=2e-3,
        )
