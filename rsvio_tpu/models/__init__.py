"""Estimator models: frontend tracker, PnP, sliding-window BA, IMU, estimator."""
