"""Persistent XLA compilation cache shared by every CLI entry point.

Flagship graphs compile in minutes on this class of host (remote TPU
compile helper, one CPU core); the persistent cache turns every re-run —
a resumed training job, a second `generate_face` invocation, the driver's
bench — into a near-instant cache hit. Keyed on backend + jax version +
graph, so an invalidated entry just recompiles. Same mechanism as
`__graft_entry__._enable_compile_cache`; round 4's driver-bench timeout
(BENCH_r04: rc=124 on a cold int8 compile) is the failure mode this
prevents. Override the location with MDTPU_COMPILE_CACHE (empty string
disables).
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache() -> None:
    """Call before the first jit compilation (top of a CLI main())."""
    import jax

    cache_dir = os.environ.get(
        "MDTPU_COMPILE_CACHE",
        str(Path(__file__).resolve().parents[2] / ".jax_cache"),
    )
    if not cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
