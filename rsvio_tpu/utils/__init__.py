"""Host-side utilities: config, timing, trajectory export/evaluation."""
