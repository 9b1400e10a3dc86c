"""CheckpointManager round-trip: rolling/snapshot cadence, resume restore,
params-only export, and the refuse-to-clobber guard
(train_morphable_diffusion.py:73-74, 276-297)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morphablediffusion_tpu.utils.checkpoint import (
    CheckpointManager,
    cast_params_for_serving,
)

pytestmark = pytest.mark.slow


@dataclasses.dataclass
class _State:
    step: jnp.ndarray
    params: dict
    opt: dict


jax.tree_util.register_dataclass(_State, ["step", "params", "opt"], [])


def _state(step, seed=0):
    k = jax.random.key(seed)
    return _State(
        step=jnp.asarray(step, jnp.int32),
        params={"w": jax.random.normal(k, (4, 4)), "norm": {"scale": jnp.ones(4)}},
        opt={"mu": jnp.zeros((4, 4))},
    )


def test_checkpoint_roundtrip_and_guard(tmp_path):
    mgr = CheckpointManager(tmp_path, rolling_every=2, snapshot_every=4)
    assert mgr.latest_step() is None
    mgr.assert_fresh_or_resume(False)  # fresh dir: fine

    s2 = _state(2)
    mgr.maybe_save(s2, 2)       # rolling (2 % 2 == 0), no snapshot
    s4 = _state(4, seed=1)
    mgr.maybe_save(s4, 4)       # rolling + snapshot
    mgr.maybe_save(_state(5), 5)  # neither cadence: no-op
    mgr.wait()

    assert mgr.latest_step() == 4
    with pytest.raises(RuntimeError):
        mgr.assert_fresh_or_resume(False)  # existing run must refuse
    mgr.assert_fresh_or_resume(True)

    restored = mgr.restore(jax.eval_shape(lambda: s4))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(s4.params["w"]))
    assert int(restored.step) == 4

    params = mgr.restore_params(jax.eval_shape(lambda: s4.params))
    np.testing.assert_array_equal(np.asarray(params["w"]),
                                  np.asarray(s4.params["w"]))


def test_cast_params_for_serving_keeps_norms_fp32():
    p = {"conv": {"kernel": jnp.ones((3, 3), jnp.float32)},
         "some_norm": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}}
    c = cast_params_for_serving(p)
    assert c["conv"]["kernel"].dtype == jnp.bfloat16
    assert c["some_norm"]["scale"].dtype == jnp.float32
    assert c["some_norm"]["bias"].dtype == jnp.float32
