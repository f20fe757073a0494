"""Adversarial synthetic stereo(+IMU) scene generator.

Round-1 accuracy evidence was limited to fronto-parallel constant-depth
planes under pure translation; this module generates the harder scenes the
accuracy matrix needs (VERDICT round-1 item 1):

  * 6-DoF trajectories — simultaneous rotation + translation, parametric
    sinusoid families with exact ground-truth poses,
  * depth-structured worlds — arbitrary textured planes (ground, walls,
    frontal facades) ray-cast with correct inter-plane OCCLUSION,
  * photometric gain/bias drift per frame (exercises the LSSD tracker's
    brightness-invariance claim end-to-end),
  * moving occluder quads (dynamic objects violating the static-world
    assumption that PnP/BA rely on — exercises Huber + the bidirectional
    gate),
  * IMU generation consistent with the trajectory (midpoint-sampled exact
    specific force + angular rate, optional bias/noise), for the VIO
    configurations.

Everything is host-side numpy: scene generation is the data layer, not the
compute path (SURVEY.md §2.3 puts image production on the host feeding the
device). The renderer shares the pipeline's pinhole convention (x right,
y down, z forward) and the world frame is z-up with gravity (0, 0, -9.81),
so generated IMU feeds models.imu directly.

There is no reference counterpart (the reference ships no dataset synthesis
or benchmark fixtures at all — SURVEY.md §6); the forward-model pattern
(generate GT -> render/project -> run -> compare) follows the reference's
synthetic solver tests (ref src/optimization/tests.rs:136-380).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

GRAVITY_W = np.array([0.0, 0.0, -9.81], np.float64)

# Level camera attitude in the z-up world: body/camera x -> world x (right),
# y (down) -> world -z, z (forward/optical axis) -> world +y.
R_LEVEL = np.array([[1.0, 0.0, 0.0],
                    [0.0, 0.0, 1.0],
                    [0.0, -1.0, 0.0]], np.float64)  # columns are body axes


def make_texture(size: int = 1024, seed: int = 0,
                 scales=((90.0, 24), (60.0, 96), (40.0, 256)),
                 offset: float = 40.0) -> np.ndarray:
    """Multi-scale smooth random texture with corners at several spatial
    frequencies (same recipe as bench.py's detector-friendly texture)."""
    import cv2
    rng = np.random.default_rng(seed)
    tex = sum(
        w * cv2.resize(rng.uniform(0, 1, (n, n)).astype(np.float32),
                       (size, size), interpolation=cv2.INTER_CUBIC)
        for w, n in scales) + offset
    return np.clip(tex, 0, 255).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class Plane:
    """A textured rectangle in the world.

    origin: (3,) a corner-ish anchor point; a1/a2: (3,) unit in-plane axes
    (texture s/t directions); extent: (s_min, s_max, t_min, t_max) meters;
    tex: (Ht, Wt) float32 texture; tex_scale: texture px per meter;
    motion: optional t(seconds) -> (3,) world offset added to origin (a
    MOVING occluder / dynamic object).
    """
    origin: np.ndarray
    a1: np.ndarray
    a2: np.ndarray
    extent: tuple
    tex: np.ndarray
    tex_scale: float = 100.0
    motion: Optional[Callable[[float], np.ndarray]] = None

    def origin_at(self, t: float) -> np.ndarray:
        if self.motion is None:
            return self.origin
        return self.origin + np.asarray(self.motion(t), np.float64)


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    planes: Sequence[Plane]
    H: int = 480
    W: int = 752
    fx: float = 458.0
    fy: float = 458.0
    cx: float = 376.0
    cy: float = 240.0
    baseline: float = 0.11  # right camera at +x in the body frame
    # Photometric drift: frame intensity = gain(t) * I + bias(t)
    gain_fn: Optional[Callable[[float], float]] = None
    bias_fn: Optional[Callable[[float], float]] = None


def render_camera(scene: SceneConfig, T_W_C: np.ndarray,
                  t: float = 0.0) -> np.ndarray:
    """Ray-cast all planes from camera pose T_W_C (4x4); nearest positive
    hit wins (correct occlusion). Returns (H, W) float32 intensities."""
    import cv2
    H, W = scene.H, scene.W
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    # Unnormalized camera ray with z == 1: the plane-hit parameter IS the
    # camera depth, so z-ordering is a plain elementwise min.
    d_cam = np.stack([(u - scene.cx) / scene.fx,
                      (v - scene.cy) / scene.fy,
                      np.ones_like(u)], axis=-1)           # (H,W,3)
    R = T_W_C[:3, :3]
    c = T_W_C[:3, 3]
    d_w = d_cam @ R.T                                      # (H,W,3)

    depth = np.full((H, W), np.inf, np.float64)
    img = np.zeros((H, W), np.float32)
    for plane in scene.planes:
        o = plane.origin_at(t)
        n = np.cross(plane.a1, plane.a2)
        denom = d_w @ n                                    # (H,W)
        with np.errstate(divide="ignore", invalid="ignore"):
            t_hit = (n @ (o - c)) / denom
            t_hit = np.where(np.isfinite(t_hit), t_hit, -1.0)
            X = c + t_hit[..., None] * d_w                 # (H,W,3)
            rel = X - o
            s = rel @ plane.a1
            tt = rel @ plane.a2
        s0, s1, t0, t1 = plane.extent
        hit = (np.isfinite(t_hit) & (t_hit > 1e-6)
               & (s >= s0) & (s <= s1) & (tt >= t0) & (tt <= t1)
               & (t_hit < depth))
        if not hit.any():
            continue
        Ht, Wt = plane.tex.shape
        mx = np.clip((s - s0) * plane.tex_scale, 0, Wt - 1.001)
        my = np.clip((tt - t0) * plane.tex_scale, 0, Ht - 1.001)
        vals = cv2.remap(plane.tex, mx.astype(np.float32),
                         my.astype(np.float32), cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REPLICATE)
        img = np.where(hit, vals, img)
        depth = np.where(hit, t_hit, depth)
    if scene.gain_fn is not None:
        img = img * scene.gain_fn(t)
    if scene.bias_fn is not None:
        img = img + scene.bias_fn(t)
    return np.clip(img, 0.0, 255.0).astype(np.float32)


def render_stereo(scene: SceneConfig, T_W_B: np.ndarray, t: float = 0.0):
    """Render (left, right) with the right camera at +baseline along body x
    (the examples'/bench's rig convention: T_B_Cl = I)."""
    T_W_Cr = T_W_B.copy()
    T_W_Cr[:3, 3] = T_W_B[:3, 3] + T_W_B[:3, :3] @ np.array(
        [scene.baseline, 0.0, 0.0])
    return (render_camera(scene, T_W_B, t),
            render_camera(scene, T_W_Cr, t))


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------

def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


@dataclasses.dataclass(frozen=True)
class Trajectory:
    """6-DoF body trajectory: world position pos(t) and attitude R_W_B(t) =
    R0 @ Rz(yaw(t)) @ Ry(pitch(t)) @ Rx(roll(t)) with sinusoid angle/offset
    channels. Exact poses; IMU by midpoint finite differences (see
    sample_imu)."""
    pos_fn: Callable[[float], np.ndarray]
    # (yaw, pitch, roll) radians as a function of time, applied body-side
    # after the base attitude R0 (so "yaw" turns about the body vertical).
    ang_fn: Callable[[float], np.ndarray]
    R0: np.ndarray = dataclasses.field(
        default_factory=lambda: R_LEVEL.copy())

    def pose(self, t: float) -> np.ndarray:
        y, p, r = self.ang_fn(t)
        T = np.eye(4)
        T[:3, :3] = self.R0 @ _rot_z(y) @ _rot_y(p) @ _rot_x(r)
        T[:3, 3] = self.pos_fn(t)
        return T

    def sample_imu(self, t0: float, t1: float, rate: float = 200.0,
                   gyro_bias=None, accel_bias=None, noise_rng=None,
                   gyro_noise: float = 0.0, accel_noise: float = 0.0):
        """Ideal body-frame IMU samples on (t0, t1]: midpoint-sampled
        angular rate and specific force (gravity-subtracted), plus optional
        constant biases and white noise.

        Returns (ts (S,), gyro (S,3), accel (S,3), dts (S,)).
        """
        dt = 1.0 / rate
        n = max(int(round((t1 - t0) * rate)), 1)
        ts = t0 + dt * (np.arange(n) + 1.0)
        mid = ts - 0.5 * dt
        h = 1e-4
        gyro = np.zeros((n, 3))
        accel = np.zeros((n, 3))
        for i, tm in enumerate(mid):
            R = self.pose(tm)[:3, :3]
            Rp = self.pose(tm + h)[:3, :3]
            Rm = self.pose(tm - h)[:3, :3]
            # omega_body = vee(R^T dR/dt)
            Wb = R.T @ (Rp - Rm) / (2 * h)
            gyro[i] = np.array([Wb[2, 1], Wb[0, 2], Wb[1, 0]])
            a_w = (self.pos_fn(tm + h) - 2 * self.pos_fn(tm)
                   + self.pos_fn(tm - h)) / (h * h)
            accel[i] = R.T @ (a_w - GRAVITY_W)
        if gyro_bias is not None:
            gyro = gyro + np.asarray(gyro_bias)
        if accel_bias is not None:
            accel = accel + np.asarray(accel_bias)
        if noise_rng is not None:
            sqrt_rate = np.sqrt(rate)
            gyro = gyro + noise_rng.normal(
                0.0, gyro_noise * sqrt_rate, (n, 3))
            accel = accel + noise_rng.normal(
                0.0, accel_noise * sqrt_rate, (n, 3))
        return ts, gyro.astype(np.float32), accel.astype(np.float32), \
            np.full(n, dt, np.float32)


def tilted(traj: Trajectory, roll_deg: float = 0.0,
           pitch_deg: float = 0.0) -> Trajectory:
    """The same trajectory flown with a constant extra body tilt — the
    adversarial initial condition for VIO gravity alignment (a non-level
    start; ref has no init at all, src/estimator/state.rs:12-19)."""
    R_tilt = _rot_y(np.deg2rad(pitch_deg)) @ _rot_x(np.deg2rad(roll_deg))
    return dataclasses.replace(traj, R0=traj.R0 @ R_tilt)


# ---------------------------------------------------------------------------
# Canned adversarial scenes (the accuracy-matrix fixtures)
# ---------------------------------------------------------------------------

def _frontal_plane(z_forward: float, half_w: float, half_h: float,
                   seed: int, tex_scale: float = 100.0,
                   tex_size: int = 1024, motion=None) -> Plane:
    """A world plane facing the level camera at forward distance z_forward
    (world +y), spanning x in [-half_w, half_w], z in [-half_h, half_h]."""
    return Plane(
        origin=np.array([-half_w, z_forward, -half_h], np.float64),
        a1=np.array([1.0, 0.0, 0.0]),
        a2=np.array([0.0, 0.0, 1.0]),
        extent=(0.0, 2 * half_w, 0.0, 2 * half_h),
        tex=make_texture(tex_size, seed=seed),
        tex_scale=tex_scale, motion=motion)


def _intrinsics(H, W):
    """EuRoC-like FOV at any resolution: focal scales with width so the
    same world geometry stays in view at reduced test resolutions."""
    f = 458.0 * W / 752.0
    return dict(H=H, W=W, fx=f, fy=f, cx=W / 2, cy=H / 2)


def scene_easy_plane(H=480, W=752, seed=0) -> SceneConfig:
    """The round-1 class: one fronto-parallel plane 5 m ahead."""
    return SceneConfig(planes=[_frontal_plane(5.0, 12.0, 8.0, seed)],
                       **_intrinsics(H, W))


def scene_depth_structured(H=480, W=752, seed=1) -> SceneConfig:
    """Corridor-like geometry: near facade, far facade, ground and side
    walls — depth spans ~3-14 m so parallax differs strongly across the
    image (exercises triangulation + BA beyond constant depth)."""
    planes = [
        # far backdrop
        _frontal_plane(14.0, 30.0, 16.0, seed, tex_scale=40.0),
        # near facade covering the left third of the view
        Plane(origin=np.array([-8.0, 4.0, -5.0]),
              a1=np.array([1.0, 0.0, 0.0]), a2=np.array([0.0, 0.0, 1.0]),
              extent=(0.0, 6.5, 0.0, 10.0),
              tex=make_texture(768, seed=seed + 1), tex_scale=120.0),
        # mid-depth facade on the right
        Plane(origin=np.array([1.5, 8.0, -6.0]),
              a1=np.array([1.0, 0.0, 0.0]), a2=np.array([0.0, 0.0, 1.0]),
              extent=(0.0, 12.0, 0.0, 12.0),
              tex=make_texture(768, seed=seed + 2), tex_scale=80.0),
        # ground plane (y forward, x right), 1.5 m below the camera
        Plane(origin=np.array([-15.0, 0.5, -1.5]),
              a1=np.array([1.0, 0.0, 0.0]), a2=np.array([0.0, 1.0, 0.0]),
              extent=(0.0, 30.0, 0.0, 16.0),
              tex=make_texture(1024, seed=seed + 3), tex_scale=60.0),
    ]
    return SceneConfig(planes=planes, **_intrinsics(H, W))


def scene_photometric(H=480, W=752, seed=2,
                      gain_amp=0.25, gain_period=3.0,
                      bias_amp=12.0, bias_period=4.1) -> SceneConfig:
    """Depth-structured geometry + sinusoidal exposure gain/bias drift."""
    base = scene_depth_structured(H, W, seed)
    return dataclasses.replace(
        base,
        gain_fn=lambda t: 1.0 + gain_amp * np.sin(2 * np.pi * t / gain_period),
        bias_fn=lambda t: bias_amp * np.sin(2 * np.pi * t / bias_period))


def scene_occlusion(H=480, W=752, seed=3, speed=0.45) -> SceneConfig:
    """Depth-structured geometry + a MOVING textured quad sweeping across
    the view 2 m ahead (a dynamic object: features born on it violate the
    static-world assumption and must be killed by the gates/robust loss).
    At the EuRoC-like FOV the view spans x in +-1.64 m at 2 m depth; the
    quad enters from the left partially visible at t=0 and transits over
    ~8 s."""
    base = scene_depth_structured(H, W, seed)
    occluder = Plane(
        origin=np.array([-2.4, 2.0, -0.9]),
        a1=np.array([1.0, 0.0, 0.0]), a2=np.array([0.0, 0.0, 1.0]),
        extent=(0.0, 1.8, 0.0, 1.8),
        tex=make_texture(256, seed=seed + 9, scales=((70.0, 16), (50.0, 64))),
        tex_scale=140.0,
        motion=lambda t: np.array([speed * t, 0.0, 0.0]))
    return dataclasses.replace(base, planes=list(base.planes) + [occluder])


def traj_forward(speed=0.25) -> Trajectory:
    """Pure lateral translation (the round-1 easy motion)."""
    return Trajectory(
        pos_fn=lambda t: np.array([speed * t, 0.0, 0.0]),
        ang_fn=lambda t: np.zeros(3))


def traj_6dof(lin_amp=(0.9, 0.35, 0.25), lin_period=(7.0, 5.3, 4.3),
              ang_amp_deg=(8.0, 5.0, 4.0),
              ang_period=(6.1, 4.7, 5.9)) -> Trajectory:
    """Simultaneous 3-axis translation + 3-axis rotation, all sinusoidal
    (smooth, bounded, exactly differentiable for IMU generation)."""
    la = np.asarray(lin_amp)
    lp = np.asarray(lin_period)
    aa = np.deg2rad(ang_amp_deg)
    ap = np.asarray(ang_period)

    def pos(t):
        return la * np.sin(2 * np.pi * t / lp)

    def ang(t):
        return aa * np.sin(2 * np.pi * t / ap)

    return Trajectory(pos_fn=pos, ang_fn=ang)


MATRIX_SCENES = {
    "easy_plane": (scene_easy_plane, traj_forward),
    "depth_6dof": (scene_depth_structured, traj_6dof),
    "photometric_6dof": (scene_photometric, traj_6dof),
    "occlusion_6dof": (scene_occlusion, traj_6dof),
}


def generate_sequence(scene: SceneConfig, traj: Trajectory, n_frames: int,
                      fps: float = 20.0, imu_rate: float = 0.0,
                      imu_kwargs: Optional[dict] = None):
    """Render a whole sequence.

    Returns dict with keys: ts (s), frames [(left, right)], gt_T_W_B
    (n,4,4); when imu_rate > 0 also imu_ts / gyro / accel / imu_dts
    (flat arrays over the whole sequence, ready for per-frame bucketing).
    """
    dt = 1.0 / fps
    ts = np.arange(n_frames) * dt
    frames = []
    poses = np.zeros((n_frames, 4, 4))
    for i, t in enumerate(ts):
        T = traj.pose(t)
        poses[i] = T
        frames.append(render_stereo(scene, T, t))
    out = {"ts": ts, "frames": frames, "gt_T_W_B": poses}
    if imu_rate > 0:
        kw = imu_kwargs or {}
        its, gy, ac, idts = traj.sample_imu(
            ts[0] - dt, ts[-1], rate=imu_rate, **kw)
        out.update(imu_ts=its, gyro=gy, accel=ac, imu_dts=idts)
    return out
