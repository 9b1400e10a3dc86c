"""Flax (linen) model components, all channels-last (NHWC / NDHWC), bf16-first."""
