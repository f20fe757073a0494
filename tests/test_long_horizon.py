"""Long-horizon stability regression tests (round-3 postmortem).

Round 3 shipped an estimator that diverged to NaN by frame ~30 on the
flagship bench scene (constant-velocity PnP extrapolation closing a
vision-only feedback loop on a low-parallax planar scene — commit 7320b34)
and NOTHING in the suite or the bench quality floors caught it. These tests
make that class of breakage impossible to ship silently:

  * test_default_config_long_run: 130 frames of the bench.py pan scene at
    reduced resolution on CPU; asserts the pose stays finite, recovery never
    fires, BA stays live, and the final x-translation is within 2% of the
    known ground truth (bench.py asserts the same floors on-device).
  * NaN-gate unit tests: every solver refuses to report success over
    non-finite state, and the estimator recovers a non-finite current pose
    to the last keyframe instead of freezing the keyframe policy forever
    (NaN comparisons are False -> is_kf never fires -> BA dead, the exact
    round-3 failure signature).

Reference context: the reference runs arbitrarily long sequences without
collapse (per-frame loop ref src/datasets/euroc_player.rs:84-135, rollback
ref src/estimator/sliding_window.rs:397-416); long-run stability is the most
basic parity axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsvio_tpu.models import ba as ba_mod
from rsvio_tpu.models import estimator as est
from rsvio_tpu.models import pnp as pnp_mod
from rsvio_tpu.models.frontend import FrontendConfig
from rsvio_tpu.ops import cameras
from rsvio_tpu.ops.klt import KLTConfig

H, W = 240, 376
FX = FY = 229.0
CX, CY = W / 2, H / 2
BASELINE_M = 0.11
PLANE_Z = 5.0
STEP = 0.03  # m/frame of pure +x translation (the known ground truth)


def _make_scene():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    tex = sum(
        w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                       (1536, 1536), interpolation=cv2.INTER_CUBIC)
        for w, n in [(90.0, 48), (60.0, 192), (40.0, 512)]) + 40.0

    def render(cam_t):
        u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32))
        x = (u - CX) / FX
        y = (v - CY) / FY
        mx = ((x * PLANE_Z + cam_t[0]) * 60.0 + 650.0).astype(np.float32)
        my = ((y * PLANE_Z + cam_t[1]) * 60.0 + 650.0).astype(np.float32)
        return cv2.remap(tex, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)

    return render


def _rig_and_cfg(**overrides):
    params = cameras.pack_params(cameras.PINHOLE_RADTAN,
                                 [FX, FY, CX, CY], [0, 0, 0, 0])
    rig = est.make_rig(params, params, jnp.eye(4, dtype=jnp.float32),
                       jnp.eye(4, dtype=jnp.float32).at[0, 3].set(BASELINE_M))
    cfg = est.EstimatorConfig(
        frontend=FrontendConfig(capacity=128, cell_size=40, detect_margin=19,
                                klt=KLTConfig(levels=4, max_iterations=15)),
        window_size=10, translation_threshold=0.05, rotation_threshold=0.05,
        image_shape=(H, W), **overrides)
    return rig, cfg


@pytest.mark.slow
@pytest.mark.parametrize("overrides", [
    {},                                   # default (reference-parity) config
    {"use_marginalization": True},        # --marginalization ships in YAML
    {"use_obs_weights": True},            # score_weighted_obs ships in YAML
], ids=["default", "marginalized", "weighted"])
def test_default_config_long_run(overrides):
    """130 frames of the bench pan scene: finite, accurate, BA alive — for
    every shipped configuration class (the round-3 divergence shipped
    precisely because no long-horizon run guarded the default path)."""
    render = _make_scene()
    rig, cfg = _rig_and_cfg(**overrides)
    step = est.make_estimator_step(cfg)
    state = est.init_state(cfg)
    n_frames = 130
    ba_fires = 0
    for k in range(n_frames):
        cam = np.array([STEP * k, 0.0, 0.0])
        f0 = jnp.asarray(render(cam))
        f1 = jnp.asarray(render(cam + np.array([BASELINE_M, 0, 0])))
        state, out = step(state, rig, f0, f1)
        if k % 10 == 9:  # cheap rolling health check (device sync)
            T = np.asarray(out.T_W_B)
            assert np.all(np.isfinite(T)), f"non-finite pose at frame {k}"
            assert bool(out.pose_ok), f"pose recovery fired at frame {k}"
        ba_fires += int(out.ba_success)
    x_final = float(out.T_W_B[0, 3])
    x_truth = STEP * (n_frames - 1)
    drift_rel = abs(x_final - x_truth) / x_truth
    assert np.isfinite(x_final)
    assert ba_fires >= 5, f"BA fired only {ba_fires} times in {n_frames} frames"
    assert drift_rel <= 0.02, (
        f"x drifted {drift_rel * 100:.2f}% (x={x_final:.4f} vs {x_truth:.4f})")
    assert int(out.n_landmarks) >= 60, "landmark table bled out"


def test_pnp_refuses_nonfinite_result():
    """solve_pnp over a NaN init must not report success (round-3 weak #2a)."""
    rng = np.random.default_rng(1)
    L = 32
    lms = jnp.asarray(rng.uniform(-1, 1, (L, 3)) + [0, 0, 4], jnp.float32)
    T_C_B = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(-0.11)]).astype(
        jnp.float32)
    obs = jnp.asarray(lms[None, :, :2] / lms[None, :, 2:3], jnp.float32)
    obs = jnp.broadcast_to(obs, (2, L, 2))
    mask = jnp.ones((2, L), bool)
    T_bad = jnp.full((4, 4), jnp.nan, jnp.float32)
    res = pnp_mod.solve_pnp(T_bad, T_C_B, lms, obs, mask)
    assert not bool(res.success)


def test_ba_refuses_nonfinite_input():
    """solve_ba over NaN poses must roll back, not report success."""
    Wn, L = 4, 24
    rng = np.random.default_rng(2)
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (Wn, 4, 4))
    T = T.at[1].set(jnp.nan)
    T_C_B = jnp.stack([jnp.eye(4), jnp.eye(4).at[0, 3].set(-0.11)]).astype(
        jnp.float32)
    lms = jnp.asarray(rng.uniform(-1, 1, (L, 3)) + [0, 0, 4], jnp.float32)
    obs = jnp.zeros((Wn, 2, L, 2), jnp.float32)
    mask = jnp.ones((Wn, 2, L), bool)
    lm_valid = jnp.ones((L,), bool)
    res = ba_mod.solve_ba(T, T_C_B, lms, obs, mask, lm_valid)
    assert not bool(res.success)
    # Rollback: inputs returned unchanged (NaN and all).
    assert np.isnan(np.asarray(res.T_W_B[1])).all()


def test_estimator_recovers_nonfinite_pose():
    """A non-finite current pose must recover to the last keyframe pose and
    flag pose_ok=False — not freeze the keyframe policy forever."""
    render = _make_scene()
    rig, cfg = _rig_and_cfg()
    step = est.make_estimator_step(cfg)
    state = est.init_state(cfg)
    # Run a few healthy frames so landmarks/keyframes exist.
    for k in range(6):
        cam = np.array([STEP * k, 0.0, 0.0])
        state, out = step(state, rig, jnp.asarray(render(cam)),
                          jnp.asarray(render(cam + np.array([BASELINE_M, 0, 0]))))
    # Corrupt the current pose (simulates an upstream numerical blow-up).
    last_kf = np.asarray(state.last_kf_T_W_B)
    state = state._replace(T_W_B=jnp.full((4, 4), jnp.nan, jnp.float32))
    cam = np.array([STEP * 6, 0.0, 0.0])
    state, out = step(state, rig, jnp.asarray(render(cam)),
                      jnp.asarray(render(cam + np.array([BASELINE_M, 0, 0]))))
    T = np.asarray(out.T_W_B)
    assert np.all(np.isfinite(T)), "estimator did not recover a NaN pose"
    assert np.all(np.isfinite(np.asarray(state.T_W_B)))
    # And the run continues healthily afterwards.
    for k in range(7, 12):
        cam = np.array([STEP * k, 0.0, 0.0])
        state, out = step(state, rig, jnp.asarray(render(cam)),
                          jnp.asarray(render(cam + np.array([BASELINE_M, 0, 0]))))
    assert np.all(np.isfinite(np.asarray(out.T_W_B)))
    assert bool(out.pose_ok)
