"""Samplers. The synchronized DDIM loop compiles to a single XLA graph."""

from morphablediffusion_tpu.sampling.ddim import SyncDDIMSampler  # noqa: F401
