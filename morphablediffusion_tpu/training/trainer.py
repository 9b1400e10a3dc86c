"""Data-parallel trainer.

Reference behavior re-created (morphable_diffusion.py:627-646
`configure_optimizers` + train_morphable_diffusion.py):
  * AdamW; conditioning nets (spatial_volume + model-level time_embed) at
    10x base LR (:638-639).
  * `finetune_unet` toggles between training the whole UNet and only the
    DepthTransformer blocks (:633-636, attention.py:140-142).
  * VAE + CLIP strictly frozen (:54-59).
  * LambdaLinear warmup schedule stepped per optimizer step (:643-646).

TPU-native execution: ONE jitted train step with sharding annotations — the
batch is sharded over the 1-D "data" mesh axis, params/opt-state replicated,
and XLA inserts the gradient all-reduce over ICI. This replaces the
reference's PL DDPStrategy + NCCL stack (train_morphable_diffusion.py:302-303)
with zero framework overhead around the XLA graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from morphablediffusion_tpu.models.diffusion import MorphableDiffusion
from morphablediffusion_tpu.training.lr import lambda_linear_schedule
from morphablediffusion_tpu.utils.config import Config

FROZEN, BASE, COND = "frozen", "base", "cond"


def param_labels(params, finetune_unet: bool):
    """Label every parameter: frozen / base-LR / 10x-LR (see module docstring)."""

    def label(path_key, _):
        path = jax.tree_util.keystr(path_key)
        if "first_stage" in path or "clip_image_encoder" in path:
            return FROZEN
        if "spatial_volume" in path:
            return COND
        if "unet" in path:
            if finetune_unet:
                return BASE
            return BASE if ("_cond" in path or "middle_conditions" in path) else FROZEN
        if "time_embed" in path:
            # the model-level 256-d time MLP (10x LR); the UNet's own
            # time_embed is matched by the 'unet' branch above
            return COND
        return BASE

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(config: Config, params):
    t = config.train
    sched = lambda_linear_schedule(
        t.base_learning_rate, t.warm_up_steps, t.cycle_length,
        t.f_start, t.f_max, t.f_min,
    )
    sched_cond = lambda step: sched(step) * t.cond_lr_mult
    tx = optax.multi_transform(
        {
            BASE: optax.adamw(sched),
            COND: optax.adamw(sched_cond),
            FROZEN: optax.set_to_zero(),
        },
        param_labels(params, config.model.finetune_unet),
    )
    return tx, sched


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray


@dataclasses.dataclass
class Trainer:
    """Owns the model, optimizer, mesh, and the compiled train step."""

    config: Config
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        self.model = MorphableDiffusion(self.config.model)
        if self.mesh is None:
            from morphablediffusion_tpu.parallel.mesh import create_mesh

            self.mesh = create_mesh()
        self._tx = None

    # ------------------------------------------------------------------ #

    def init_state(self, batch, seed: Optional[int] = None) -> TrainState:
        seed = self.config.train.seed if seed is None else seed
        root = jax.random.key(seed)
        names = ["params", "time", "noise", "view", "vae", "drop"]
        rngs = dict(zip(names, jax.random.split(root, len(names))))
        params = jax.jit(
            lambda r, b: self.model.init(r, b, method="init_fn")
        )(rngs, batch)
        self._tx, _ = make_optimizer(self.config, params)
        opt_state = jax.jit(self._tx.init)(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=root,
        )

    def tx(self, params):
        if self._tx is None:
            self._tx, _ = make_optimizer(self.config, params)
        return self._tx

    # ------------------------------------------------------------------ #

    def _train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(state.rng, state.step)
        names = ["time", "noise", "view", "vae", "drop"]
        rngs = dict(zip(names, jax.random.split(step_rng, len(names))))

        def loss_fn(p):
            return self.model.apply(p, batch, method="training_loss", rngs=rngs)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx(state.params).update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step,
        }
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    def compile_train_step(self):
        """jit with explicit shardings: batch split over 'data', state replicated."""
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        return jax.jit(
            self._train_step,
            in_shardings=(repl, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
