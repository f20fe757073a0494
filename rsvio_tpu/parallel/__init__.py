"""Device meshes and sharded (multi-chip) bundle adjustment."""
