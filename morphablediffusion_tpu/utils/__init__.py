"""Config, checkpointing, image, and misc host-side utilities."""
