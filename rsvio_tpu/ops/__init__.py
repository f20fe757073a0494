"""Device-side math ops: Lie groups, cameras, sampling, KLT, detection."""
