"""Device mesh + sharding helpers.

The reference's only distributed strategy is 2-GPU DDP via NCCL
(train_morphable_diffusion.py:303, DistributedSampler facescape.py:217). The
TPU-native equivalent: a 1-D `jax.sharding.Mesh` over the "data" axis;
batches are sharded on their leading axis, parameters are replicated, and
XLA inserts the gradient `psum` over ICI automatically from the sharding
annotations on the jitted train step. Multi-host initialization
(`jax.distributed.initialize`) extends the same mesh across DCN.

The model itself is ~0.5B params replicated comfortably in 16 GB HBM, so
no tensor/FSDP sharding is needed (SURVEY.md section 2.4); the mesh helpers
still accept extra axes for future model sharding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Device-put every leaf with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def global_batch_from_local(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Multi-host: assemble a globally-sharded batch from per-host shards
    (the DistributedSampler equivalent)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def create_view_mesh(devices: Optional[Sequence] = None,
                     axis_name: str = "view") -> Mesh:
    """1-D mesh over the synchronized-VIEW axis, for multi-chip sampling.

    The reference serializes the 16 views in chunks of `batch_view_num` on
    one GPU (morphable_diffusion.py:723-735). On TPU the views are instead
    sharded across chips: every per-view stage (noisy-view encoder,
    unprojection, frustum resample + FrustumTV3DNet, the doubled-batch CFG
    UNet, the DDIM update) is embarrassingly parallel over views, and the
    ONLY cross-view coupling per step is the mean over views inside
    SMPLFeatureExtractor (network.py:61-67) — a (B, N_verts, 16) psum that
    XLA lowers to one small ICI all-reduce. See
    SyncDDIMSampler.sample(view_mesh=...).
    """
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def view_sharding(mesh: Mesh, axis_name: str = "view") -> NamedSharding:
    """Sharding for (B, N_views, ...) arrays: split the view axis."""
    return NamedSharding(mesh, P(None, axis_name))
