"""Dataset players: EuRoC, TUM-VI, 4Seasons manifests + async prefetch feed."""
