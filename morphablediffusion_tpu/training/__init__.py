"""Trainer: optax optimizer with per-group LRs, jit/sharded DP train step."""
