"""Weight importer: full name-map coverage against the real model tree.

Builds the flagship model's abstract param tree (eval_shape — no compile),
synthesizes a torch state_dict with the exact shapes the mapping implies,
imports it, and checks every mapped path landed. Catches any drift between
our module names and the torch naming scheme without needing a checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
from morphablediffusion_tpu.utils.config import Config
from morphablediffusion_tpu.utils import torch_import as ti

from tiny import tiny_batch, tiny_config

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def abstract_tree():
    cfg = Config()
    model = MorphableDiffusion(cfg.model)
    t = tiny_config(view_num=cfg.model.view_num)
    t.model.image_size = cfg.model.image_size
    t.model.max_vertices = cfg.model.max_vertices
    batch = tiny_batch(t, B=1)
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(0), len(names))))
    shapes = jax.eval_shape(
        lambda r, b: model.init(r, b, method="init_fn"), rngs, batch
    )
    return cfg, shapes


def _get(tree, path):
    node = tree
    for k in path.split("/"):
        if k not in node:
            return None
        node = node[k]
    return node


def _torch_shape(kind, name, our_shape):
    if name == "bias" or kind in (ti.NORM, ti.DIRECT):
        return our_shape
    if kind == ti.CONV2:
        kh, kw, i, o = our_shape
        return (o, i, kh, kw)
    if kind == ti.CONV3:
        kd, kh, kw, i, o = our_shape
        return (o, i, kd, kh, kw)
    if kind == ti.CONVT3:
        kd, kh, kw, i, o = our_shape
        return (i, o, kd, kh, kw)
    if kind == ti.LINEAR:
        i, o = our_shape
        return (o, i)
    raise ValueError(kind)


def test_mapping_covers_model(abstract_tree):
    cfg, shapes = abstract_tree
    like = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    mapping = ti.full_mapping(cfg.model.clip.layers)

    state_dict = {}
    skipped = []
    for tkey, opath, kind in mapping:
        leaf = _get(like["params"], opath)
        if leaf is None:
            skipped.append((tkey, opath))
            continue
        name = opath.rsplit("/", 1)[-1]
        # zeros, not random: this test checks mapping coverage and shapes
        # only, and synthesizing ~1.2B random values takes minutes on 1 core
        state_dict[tkey] = np.zeros(
            _torch_shape(kind, name, leaf.shape), np.float32
        )

    # every mapped model path must exist except optional skip connections
    hard_misses = [p for _, p in skipped if not p.endswith(("skip/kernel", "skip/bias"))]
    assert hard_misses == [], f"mapping paths missing from model: {hard_misses[:10]}"

    params, report = ti.import_state_dict(
        state_dict, like, clip_layers=cfg.model.clip.layers
    )
    assert report["unmatched_model_paths"] == []
    assert report["unused_torch_keys"] == []
    assert report["filled"] == len(state_dict)

    # untouched modules (mesh_voxel) keep their init values
    mv = _get(params["params"], "spatial_volume/mesh_voxel/conv0/kernel")
    assert mv is not None and np.all(mv == 0)


def test_conv_and_linear_conversion_semantics():
    # conv2: torch (O,I,kh,kw) -> flax (kh,kw,I,O)
    w = np.arange(2 * 3 * 5 * 7).reshape(2, 3, 5, 7).astype(np.float32)
    out = ti._convert(ti.CONV2, "kernel", w)
    assert out.shape == (5, 7, 3, 2)
    assert out[1, 2, 1, 0] == w[0, 1, 1, 2]
    # linear: torch (O,I) -> flax (I,O)
    w = np.arange(6).reshape(2, 3).astype(np.float32)
    out = ti._convert(ti.LINEAR, "kernel", w)
    assert out.shape == (3, 2) and out[1, 0] == w[0, 1]
    # 1x1x1 conv3d as dense: torch (O,I,1,1,1) -> (I,O)
    w = np.arange(6).reshape(2, 3, 1, 1, 1).astype(np.float32)
    out = ti._convert(ti.LINEAR, "kernel", w)
    assert out.shape == (3, 2)


def test_convtranspose3d_conversion_matches_torch():
    """Numeric parity: our dilated-conv formulation with the converted kernel
    must equal torch ConvTranspose3d(k=3, s=2, p=1, op=1)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from morphablediffusion_tpu.models.layers import ConvTranspose3dTorch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 4, 5, 6, 3)).astype(np.float32)  # NDHWC
    tconv = torch.nn.ConvTranspose3d(3, 2, 3, stride=2, padding=1,
                                     output_padding=1)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    ref = ref.detach().numpy().transpose(0, 2, 3, 4, 1)

    mod = ConvTranspose3dTorch(features=2)
    params = {
        "params": {
            "kernel": jnp.asarray(
                ti._convert(ti.CONVT3, "kernel", tconv.weight.detach().numpy())
            ),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_input_conv_surgery(abstract_tree):
    cfg, shapes = abstract_tree
    like = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    w4 = np.random.default_rng(1).normal(size=(320, 4, 3, 3)).astype(np.float32)
    params, report = ti.import_state_dict(
        {"model.diffusion_model.input_blocks.0.0.weight": w4}, like,
        clip_layers=cfg.model.clip.layers,
    )
    k = _get(params["params"], "unet/input_conv/kernel")
    assert k.shape == (3, 3, 8, 320)
    np.testing.assert_allclose(k[:, :, :4], w4.transpose(2, 3, 1, 0))
    assert np.all(k[:, :, 4:] == 0)


def test_export_import_roundtrip():
    """export_state_dict is the exact inverse of import_state_dict: a tiny
    model's real init params survive export->import bit-for-bit (including
    the fine-grid spconv kernels and BN running stats)."""
    cfg = tiny_config()
    cfg.model.mesh_voxel_mode = "fine"
    cfg.model.fine_grid_shape = (8, 8, 8)
    cfg.model.fine_voxel_size = 0.1
    model = MorphableDiffusion(cfg.model)
    batch = tiny_batch(cfg, B=1)
    names = ["params", "time", "noise", "view", "vae", "drop"]
    rngs = dict(zip(names, jax.random.split(jax.random.key(2), len(names))))
    params = model.init(rngs, batch, method="init_fn")

    sd = ti.export_state_dict(params, clip_layers=cfg.model.clip.layers)
    assert len(sd) > 300
    like = jax.tree.map(lambda x: np.zeros(x.shape, np.float32), params)
    imported, report = ti.import_state_dict(
        sd, like, clip_layers=cfg.model.clip.layers
    )
    assert report["filled"] == len(sd)
    assert not report["unused_torch_keys"], report["unused_torch_keys"][:5]

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    checked = 0
    for path, a in flat_a:
        b = flat_b[path]
        if np.asarray(a).shape == np.asarray(b).shape and not np.all(
            np.asarray(b) == 0
        ):
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b), err_msg=str(path)
            )
            checked += 1
    assert checked > 300
