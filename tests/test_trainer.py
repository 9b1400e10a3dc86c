"""Trainer: param grouping, LR schedule, and an 8-device data-parallel step."""

import jax
import jax.numpy as jnp
import numpy as np

from morphablediffusion_tpu.parallel.mesh import create_mesh, shard_batch
from morphablediffusion_tpu.training.lr import lambda_linear_schedule
from morphablediffusion_tpu.training.trainer import (
    BASE,
    COND,
    FROZEN,
    Trainer,
    param_labels,
)

from tiny import tiny_batch, tiny_config

import pytest

pytestmark = pytest.mark.slow


def test_lambda_linear_schedule():
    s = lambda_linear_schedule(5e-5, warm_up_steps=100, cycle_length=100000,
                               f_start=0.02, f_max=1.0, f_min=1.0)
    np.testing.assert_allclose(float(s(0)), 5e-5 * 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 5e-5 * (0.02 + 0.98 * 0.5), rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(6000)), 5e-5, rtol=1e-6)


def test_param_labels_tiny():
    fake = {
        "params": {
            "first_stage": {"encoder": {"k": jnp.zeros(1)}},
            "clip_image_encoder": {"block_0": {"k": jnp.zeros(1)}},
            "time_embed": {"dense0": {"kernel": jnp.zeros(1)}},
            "spatial_volume": {"mesh_voxel": {"conv0": {"kernel": jnp.zeros(1)}}},
            "unet": {
                "time_embed": {"dense0": {"kernel": jnp.zeros(1)}},
                "mid_res0": {"conv_in": {"kernel": jnp.zeros(1)}},
                "middle_conditions": {"to_q": {"kernel": jnp.zeros(1)}},
                "out_5_cond": {"to_q": {"kernel": jnp.zeros(1)}},
            },
        }
    }
    lbl = param_labels(fake, finetune_unet=True)["params"]
    assert lbl["first_stage"]["encoder"]["k"] == FROZEN
    assert lbl["clip_image_encoder"]["block_0"]["k"] == FROZEN
    assert lbl["time_embed"]["dense0"]["kernel"] == COND
    assert lbl["spatial_volume"]["mesh_voxel"]["conv0"]["kernel"] == COND
    assert lbl["unet"]["mid_res0"]["conv_in"]["kernel"] == BASE
    assert lbl["unet"]["time_embed"]["dense0"]["kernel"] == BASE

    lbl2 = param_labels(fake, finetune_unet=False)["params"]
    assert lbl2["unet"]["mid_res0"]["conv_in"]["kernel"] == FROZEN
    assert lbl2["unet"]["middle_conditions"]["to_q"]["kernel"] == BASE
    assert lbl2["unet"]["out_5_cond"]["to_q"]["kernel"] == BASE


def test_data_parallel_train_step_8dev():
    assert jax.device_count() == 8, "conftest must force 8 CPU devices"
    cfg = tiny_config(view_num=2)
    cfg.data.batch_size = 8
    mesh = create_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    batch = tiny_batch(cfg, B=8)
    batch = shard_batch(batch, mesh)
    state = trainer.init_state(batch)
    step = trainer.compile_train_step(state.params)

    # ZeRO-1: at least one AdamW moment leaf must be sharded over the mesh
    sharded = [
        x for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert sharded, "opt state should be ZeRO-1 sharded on a multi-device mesh"

    p0 = float(jnp.sum(jnp.abs(
        state.params["params"]["unet"]["input_conv"]["kernel"]
    )))
    vae_k0 = np.asarray(
        state.params["params"]["first_stage"]["encoder"]["conv_in"]["kernel"]
    ).copy()

    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 1

    # At exact init the UNet's zero-initialized output conv blocks all
    # upstream gradient (zero_module parity), so interior params only move
    # from step 2 on, once the output conv is nonzero.
    state, metrics2 = step(state, batch)
    assert int(state.step) == 2
    p2 = float(jnp.sum(jnp.abs(
        state.params["params"]["unet"]["input_conv"]["kernel"]
    )))
    assert p2 != p0  # trainable params moved
    # frozen params must not move
    vae_k = np.asarray(
        state.params["params"]["first_stage"]["encoder"]["conv_in"]["kernel"]
    )
    np.testing.assert_array_equal(vae_k, vae_k0)


def test_cast_params_for_serving():
    from morphablediffusion_tpu.utils.checkpoint import cast_params_for_serving

    params = {
        "params": {
            "unet": {"input_conv": {"kernel": jnp.zeros((3, 3, 8, 16))}},
            "blk": {"GroupNorm_0": {"scale": jnp.ones(16),
                                    "bias": jnp.zeros(16)}},
            "out_norm": {"scale": jnp.ones(16)},
        }
    }
    cast = cast_params_for_serving(params)
    assert cast["params"]["unet"]["input_conv"]["kernel"].dtype == jnp.bfloat16
    assert cast["params"]["blk"]["GroupNorm_0"]["scale"].dtype == jnp.float32
    assert cast["params"]["out_norm"]["scale"].dtype == jnp.float32


def test_grad_accumulation_and_frozen_bf16():
    """k=2 accumulation: optimizer applies only every 2nd micro-step; frozen
    VAE/CLIP leaves are stored bf16 (norm scales stay fp32)."""
    cfg = tiny_config(view_num=2)
    cfg.data.batch_size = 2
    cfg.train.accumulate_grad_batches = 2
    mesh = create_mesh(jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    batch = shard_batch(tiny_batch(cfg, B=2), mesh)
    state = trainer.init_state(batch)

    vae_kernel = state.params["params"]["first_stage"]["encoder"]["conv_in"]["kernel"]
    assert vae_kernel.dtype == jnp.bfloat16
    # norm params inside frozen modules stay fp32 (statistics path)
    leaves = jax.tree_util.tree_leaves_with_path(
        state.params["params"]["first_stage"]
    )
    norm_leaves = [
        l for p, l in leaves if "norm" in jax.tree_util.keystr(p).lower()
    ]
    assert norm_leaves and all(l.dtype == jnp.float32 for l in norm_leaves)

    step = trainer.compile_train_step(state.params)
    p0 = np.asarray(state.params["params"]["unet"]["input_conv"]["kernel"]).copy()
    state, m1 = step(state, batch)
    p1 = np.asarray(state.params["params"]["unet"]["input_conv"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # accumulating: no update yet
    state, m2 = step(state, batch)
    state, m3 = step(state, batch)
    state, m4 = step(state, batch)  # two full optimizer steps done
    p4 = np.asarray(state.params["params"]["unet"]["input_conv"]["kernel"])
    assert not np.array_equal(p0, p4)  # updates landed on the k boundaries
    assert np.isfinite(float(m4["loss"]))


def test_abstract_state_matches_init_state():
    """abstract_state (the no-materialize resume skeleton) must mirror
    init_state leaf-for-leaf — shape, dtype, AND sharding — and accept a
    checkpoint restore (the resume path restores straight into it so the
    device never holds two copies of the state)."""
    import tempfile

    from morphablediffusion_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(view_num=2)
    cfg.data.batch_size = 8
    mesh = create_mesh()
    batch = shard_batch(tiny_batch(cfg, B=8), mesh)

    t1 = Trainer(cfg, mesh=mesh)
    concrete = t1.init_state(batch)
    t2 = Trainer(cfg, mesh=mesh)
    abstract = t2.abstract_state(batch)

    cl = jax.tree_util.tree_leaves_with_path(concrete)
    al = jax.tree_util.tree_leaves_with_path(abstract)
    assert len(cl) == len(al)
    n_sharded = 0
    for (cp, c), (ap, a) in zip(cl, al):
        key = jax.tree_util.keystr(cp)
        assert key == jax.tree_util.keystr(ap)
        assert c.shape == a.shape, key
        assert c.dtype == a.dtype, key
        # ZeRO-1-split leaves must restore into the exact concrete layout;
        # everything else must be replicated (concrete leaves created
        # outside jit carry an equivalent SingleDeviceSharding — the
        # abstract's NamedSharding(P()) is the step-ready form of the same)
        if not c.sharding.is_fully_replicated and "opt_state" in key:
            assert c.sharding == a.sharding, key
            n_sharded += 1
        else:
            assert a.sharding.is_fully_replicated, key
    assert n_sharded > 0, "expected ZeRO-1-sharded opt leaves on the 8-dev mesh"

    # side effect parity: the schedule exists without init_state
    assert t2.lr_at(0) == t1.lr_at(0)

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, rolling_every=1, snapshot_every=0)
        mgr.maybe_save(concrete, 1)
        mgr.wait()
        restored = mgr.restore(abstract)
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["unet"]["input_conv"]["kernel"]),
        np.asarray(concrete.params["params"]["unet"]["input_conv"]["kernel"]),
    )
    assert int(restored.step) == int(concrete.step)
