"""Fine-grid mesh conditioner vs a torch oracle of the reference spconv net.

The reference's `SparseConvNet` (network.py:74-96) runs spconv CUDA sparse
convolutions; spconv defines its outputs by equivalence with dense
`nn.Conv3d` on densified input (its own unit tests), with submanifold convs
additionally re-masked to the input active set and `.dense()` reporting 0 at
inactive sites. The oracle below implements exactly those semantics in plain
torch on the per-sample `out_sh` grid — the same data flow as
morphable_diffusion.py:245-256 (scatter -> net -> grid_sample at normalized
dhw) — and `FineMeshVoxelNet` must match it through the checkpoint importer,
including its static-padded grid and per-sample extent clipping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.slow



# --------------------------------------------------------------------- #
# torch oracle


class SparseConvNetOracle(torch.nn.Module):
    """Dense-masked reference semantics on the exact out_sh grid."""

    def __init__(self):
        super().__init__()
        c3 = lambda i, o, s=1: torch.nn.Conv3d(i, o, 3, stride=s, padding=1,
                                               bias=False)
        bn = lambda c: torch.nn.BatchNorm1d(c, eps=1e-3, momentum=0.01)
        self.convs = torch.nn.ModuleDict()
        self.bns = torch.nn.ModuleDict()
        plan = [("conv0_0", 16, 16, 1), ("conv0_3", 16, 16, 1),
                ("down0_0", 16, 32, 2), ("conv1_0", 32, 32, 1),
                ("conv1_3", 32, 32, 1), ("down1_0", 32, 64, 2),
                ("conv2_0", 64, 64, 1), ("conv2_3", 64, 64, 1),
                ("conv2_6", 64, 64, 1)]
        for name, i, o, s in plan:
            self.convs[name] = c3(i, o, s)
            self.bns[name] = bn(o)

    def _bn(self, name, x, mask):
        """BatchNorm1d over active rows, eval form (running stats)."""
        b = self.bns[name]
        y = (x - b.running_mean[None, :, None, None, None]) / torch.sqrt(
            b.running_var[None, :, None, None, None] + b.eps
        )
        y = y * b.weight[None, :, None, None, None] + b.bias[
            None, :, None, None, None
        ]
        return F.relu(y) * mask

    def forward(self, grid, mask):
        """grid: (1, 16, D, H, W) dense scatter; mask: (1, 1, D, H, W)."""
        h = grid
        for name in ("conv0_0", "conv0_3"):
            h = self._bn(name, self.convs[name](h), mask)
        h = self.convs["down0_0"](h)
        mask = (F.max_pool3d(mask, 3, 2, 1) > 0).float()
        h = self._bn("down0_0", h, mask)
        for name in ("conv1_0", "conv1_3"):
            h = self._bn(name, self.convs[name](h), mask)
        h = self.convs["down1_0"](h)
        mask = (F.max_pool3d(mask, 3, 2, 1) > 0).float()
        h = self._bn("down1_0", h, mask)
        for name in ("conv2_0", "conv2_3", "conv2_6"):
            h = self._bn(name, self.convs[name](h), mask)
        return h  # (1, 64, D//4, H//4, W//4) == .dense()

    def spconv_state_dict(self, prefix="spatial_volume.xyzc_net."):
        """Export in the published-checkpoint naming + spconv-2.x KRSC
        kernel layout (O, kd, kh, kw, I)."""
        seq_bn = {"conv0_0": "conv0.1", "conv0_3": "conv0.4",
                  "down0_0": "down0.1", "conv1_0": "conv1.1",
                  "conv1_3": "conv1.4", "down1_0": "down1.1",
                  "conv2_0": "conv2.1", "conv2_3": "conv2.4",
                  "conv2_6": "conv2.7"}
        sd = {}
        for name, conv in self.convs.items():
            tkey = prefix + name.replace("_", ".") + ".weight"
            sd[tkey] = conv.weight.detach().permute(0, 2, 3, 4, 1).numpy()
            bn = self.bns[name]
            bk = prefix + seq_bn[name]
            sd[bk + ".weight"] = bn.weight.detach().numpy()
            sd[bk + ".bias"] = bn.bias.detach().numpy()
            sd[bk + ".running_mean"] = bn.running_mean.numpy()
            sd[bk + ".running_var"] = bn.running_var.numpy()
        return sd


def oracle_field(oracle, feats, coords, out_sh, query_fine):
    """Reference data flow on the exact grid: scatter -> net -> grid_sample.

    feats: (Nv, 16); coords: (Nv, 3) int dhw; out_sh: (3,) int;
    query_fine: (P, 3) float fine-voxel dhw coords. Returns (P, 64).
    """
    D, H, W = [int(s) for s in out_sh]
    grid = np.zeros((16, D, H, W), np.float32)
    count = np.zeros((D, H, W), np.float32)
    for f, (d, h, w) in zip(feats, coords):
        if 0 <= d < D and 0 <= h < H and 0 <= w < W:
            grid[:, d, h, w] += f
            count[d, h, w] += 1
    nz = count > 0
    grid[:, nz] /= count[nz]
    with torch.no_grad():
        vol = oracle(
            torch.from_numpy(grid)[None],
            torch.from_numpy(nz.astype(np.float32))[None, None],
        )
        # reference normalization (morphable_diffusion.py:240-242,255):
        # dhw/out_sh*2-1, sampled whd-ordered with align_corners=True
        g = query_fine / out_sh[None].astype(np.float32) * 2 - 1
        g = torch.from_numpy(g[:, ::-1].copy())[None, :, None, None, :]
        out = F.grid_sample(vol, g, mode="bilinear", padding_mode="zeros",
                            align_corners=True)
    return out[0, :, :, 0, 0].numpy().T  # (P, 64)


# --------------------------------------------------------------------- #


def _sparse_problem(rng, out_sh, n_verts, n_query):
    """Unique voxel coords within out_sh-1 bounds + queries around them."""
    D, H, W = out_sh
    # true extents strictly inside (reference: coords <= ceil < out_sh)
    cells = rng.permutation((D - 2) * (H - 2) * (W - 2))[:n_verts]
    coords = np.stack(
        np.unravel_index(cells, (D - 2, H - 2, W - 2)), axis=-1
    ).astype(np.int32)
    # guarantee the bounds: pin one vertex at 0 and one at the max corner
    coords[0] = (0, 0, 0)
    coords[1] = (D - 2, H - 2, W - 2)
    feats = rng.normal(size=(n_verts, 16)).astype(np.float32)
    q = rng.uniform(-3.0, np.max(out_sh) + 3.0, (n_query, 3)).astype(
        np.float32
    )
    return feats, coords, q


def test_fine_mesh_voxel_matches_oracle(rng):
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.mesh_voxel import FineMeshVoxelNet
    from morphablediffusion_tpu.utils.torch_import import import_state_dict

    torch.manual_seed(0)
    oracle = SparseConvNetOracle().eval()
    # non-trivial running stats (fresh BN would be identity-ish)
    with torch.no_grad():
        for bn in oracle.bns.values():
            bn.running_mean.normal_(0, 0.3)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1.0, 0.2)
            bn.bias.normal_(0, 0.2)

    voxel = 0.005
    static_shape = (32, 28, 24)
    net = FineMeshVoxelNet(grid_shape=static_shape, voxel_size=voxel,
                           dtype=jnp.float32)

    B, Nv, P = 2, 40, 64
    # two samples with DIFFERENT extents -> exercises per-sample out_sh
    # arithmetic + extent clipping on the shared static grid
    extents = [np.array([26, 22, 18]), np.array([14, 26, 10])]
    min_dhw = np.asarray([[0.3, -0.2, 0.1], [-1.0, 0.5, 0.25]], np.float32)

    all_feats, all_dhw, all_mask, all_q, want = [], [], [], [], []
    for b in range(B):
        # reference out_sh from the true extent: ceil(ext/voxel)|3 + 1
        feats, coords, q = _sparse_problem(rng, extents[b], Nv - 4, P)
        out_sh = (np.asarray(extents[b]) - 2) | 3
        out_sh = out_sh + 1
        want.append(oracle_field(oracle, feats, coords, out_sh, q))
        # pad with masked-out vertices
        fpad = np.concatenate([feats, np.zeros((4, 16), np.float32)])
        cpad = np.concatenate([coords, np.zeros((4, 3), np.int32)])
        mask = np.concatenate([np.ones(Nv - 4), np.zeros(4)]).astype(
            np.float32
        )
        all_feats.append(fpad)
        all_dhw.append(min_dhw[b] + cpad.astype(np.float32) * voxel)
        all_mask.append(mask)
        all_q.append(min_dhw[b] + q * voxel)

    params = net.init(
        jax.random.key(0),
        jnp.asarray(np.stack(all_feats)), jnp.asarray(np.stack(all_dhw)),
        jnp.asarray(min_dhw), jnp.asarray(np.stack(all_mask)),
        jnp.asarray(np.stack(all_q)),
    )
    wrapped = {"params": {"spatial_volume": {"mesh_voxel": params["params"]}}}
    imported, report = import_state_dict(oracle.spconv_state_dict(), wrapped)
    assert report["filled"] == 9 + 9 * 4, report
    assert not report["unmatched_model_paths"], report
    new = {"params": imported["params"]["spatial_volume"]["mesh_voxel"]}

    got = net.apply(
        new,
        jnp.asarray(np.stack(all_feats)), jnp.asarray(np.stack(all_dhw)),
        jnp.asarray(min_dhw), jnp.asarray(np.stack(all_mask)),
        jnp.asarray(np.stack(all_q)),
    )
    np.testing.assert_allclose(np.asarray(got), np.stack(want),
                               rtol=2e-4, atol=2e-4)


def test_fine_mode_model_smoke(rng):
    """End-to-end: MorphableDiffusion with mesh_voxel_mode=fine initializes,
    and the importer fills xyzc weights through the full-model tree."""
    import jax
    import jax.numpy as jnp

    from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
    from morphablediffusion_tpu.utils.torch_import import import_state_dict
    from tests.tiny import tiny_batch, tiny_config

    cfg = tiny_config()
    cfg.model.mesh_voxel_mode = "fine"
    cfg.model.fine_grid_shape = (16, 16, 16)
    cfg.model.fine_voxel_size = 0.05
    model = MorphableDiffusion(cfg.model)
    batch = tiny_batch(cfg, rng=rng)
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    params = model.init(rngs, batch, method="init_fn")

    torch.manual_seed(1)
    sd = SparseConvNetOracle().spconv_state_dict()
    imported, report = import_state_dict(sd, params)
    assert report["filled"] == 45, report
    assert not report["unmatched_model_paths"], report

    loss = model.apply(
        imported, batch, method="training_loss",
        rngs={k: v for k, v in rngs.items() if k != "params"},
    )
    assert np.isfinite(float(loss))
