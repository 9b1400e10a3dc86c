"""Morphable Diffusion, TPU-native.

A from-scratch JAX/Flax/Pallas framework with the capabilities of
xiyichen/morphablediffusion (CVPR 2024): synchronized 16-view latent diffusion
of a human face/body conditioned on one input photo and a fitted morphable
mesh (FLAME / SMPL-X).

Design notes (TPU-first, not a port):
  * All tensors are channels-last (NHWC / NDHWC) so XLA tiles convs and
    matmuls straight onto the MXU.
  * The whole synchronized-DDIM sampling loop is ONE jitted graph
    (`lax.scan` over steps, all 16 views batched per step).
  * The reference's CUDA sparse-conv mesh conditioner (spconv) is replaced by
    a static-shape scatter + dense 3D CNN (see `models/mesh_voxel.py`).
  * Data parallel / multi-chip scaling uses `jax.sharding.Mesh` + NamedSharding,
    with gradient reduction riding ICI collectives inserted by XLA.
"""

__version__ = "0.1.0"
