"""Pure-function compute ops: geometry, resampling, schedules, embeddings.

Everything here is shape-static, jit/vmap-friendly, and layout-native
(channels-last). Pallas TPU kernels for the hot paths live in
`ops/pallas/`; each has a pure-XLA reference implementation here that is
used for testing and as a CPU fallback.
"""
