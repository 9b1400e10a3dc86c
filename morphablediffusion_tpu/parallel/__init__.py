"""Device-mesh and sharding utilities (data-parallel over ICI, DCN-ready)."""
