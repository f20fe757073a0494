"""Window-solver timing on the current device: plain BA, marginalized BA,
VIO BA, marginalized VIO BA at production shapes (W=10, L=256).

Each solver is forced to run its full LM iteration budget (cost/param tols
set to 0) so the numbers are iteration-cost, not convergence-speed. Timing is
PIPELINED (submit n, block once) per docs/NOTES.md — the tunnel RTT otherwise
dominates blocked per-call numbers.

Run on TPU: python tools/bench_solvers.py
Run on CPU: JAX_PLATFORMS=cpu python tools/bench_solvers.py --platform cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W_KF = 10
N_LM = 256
KF_DT = 0.25
IMU_HZ = 200.0


def make_problem(seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rsvio_tpu.models import imu, vio_ba
    from rsvio_tpu.ops import lie

    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -imu.GRAVITY])
    v_const = np.array([0.4, 0.1, 0.0])

    T_C_B = jnp.stack([
        jnp.eye(4, dtype=jnp.float32),
        jnp.eye(4, dtype=jnp.float32).at[0, 3].set(-0.11),
    ])

    poses, vels = [], []
    for i in range(W_KF):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = v_const * KF_DT * i
        poses.append(T)
        vels.append(v_const.copy())
    T_gt = jnp.asarray(np.stack(poses))
    v_gt = jnp.asarray(np.stack(vels), dtype=jnp.float32)

    n_s = int(KF_DT * IMU_HZ)
    dt = 1.0 / IMU_HZ
    gyro = np.zeros((W_KF - 1, n_s, 3), np.float32)
    accel = np.tile((-g).astype(np.float32), (W_KF - 1, n_s, 1))
    dts = np.full((W_KF - 1, n_s), dt, np.float32)
    mask_imu = np.ones((W_KF - 1, n_s), bool)
    zb = jnp.zeros(3)
    pre = jax.vmap(lambda gy, ac, d, m: imu.preintegrate(gy, ac, d, m, zb, zb))(
        jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        jnp.asarray(mask_imu))
    pre_valid = jnp.ones(W_KF - 1, dtype=bool)

    p_gt = np.stack([rng.uniform(-2, 3, N_LM), rng.uniform(-2, 2, N_LM),
                     rng.uniform(3, 8, N_LM)], axis=1).astype(np.float32)
    obs = np.zeros((W_KF, 2, N_LM, 2), np.float32)
    mask = np.zeros((W_KF, 2, N_LM), bool)
    for i in range(W_KF):
        T_B_W = np.asarray(lie.se3_inverse(T_gt[i]))
        for c in range(2):
            Tcb = np.asarray(T_C_B[c])
            pC = (Tcb[:3, :3] @ (T_B_W[:3, :3] @ p_gt.T + T_B_W[:3, 3:4])
                  + Tcb[:3, 3:4]).T
            ok = pC[:, 2] > 0.5
            obs[i, c, ok] = pC[ok, :2] / pC[ok, 2:3]
            mask[i, c] = ok

    poses_i = [np.asarray(T_gt[0])]
    for i in range(1, W_KF):
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.01, dtype=jnp.float32)))
        T = np.asarray(T_gt[i]).copy()
        T[:3, :3] = T[:3, :3] @ dR
        T[:3, 3] += rng.normal(size=3) * 0.02
        poses_i.append(T)
    state0 = vio_ba.VIOState(
        T_W_B=jnp.asarray(np.stack(poses_i), dtype=jnp.float32),
        vel=v_gt + jnp.asarray(rng.normal(size=(W_KF, 3)) * 0.05,
                               dtype=jnp.float32),
        bg=jnp.zeros((W_KF, 3), dtype=jnp.float32),
        ba=jnp.zeros((W_KF, 3), dtype=jnp.float32),
    )
    lms0 = jnp.asarray(p_gt + rng.normal(size=p_gt.shape) * 0.05,
                       dtype=jnp.float32)
    return (state0, T_C_B, lms0, jnp.asarray(obs), jnp.asarray(mask),
            jnp.ones(N_LM, dtype=bool), pre, pre_valid)


def timeit_pipelined(fn, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("-n", type=int, default=20)
    ap.add_argument("--lm", type=int, default=None, help="landmark slots")
    ap.add_argument("--window", type=int, default=None, help="keyframe window")
    args = ap.parse_args()
    global N_LM, W_KF
    if args.lm:
        N_LM = args.lm
    if args.window:
        W_KF = args.window
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    from rsvio_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from rsvio_tpu.utils.precision import ensure_matmul_precision
    ensure_matmul_precision()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from rsvio_tpu.models import ba, vio_ba
    from rsvio_tpu.models.marginalization import empty_prior

    print("devices:", jax.devices())
    (state0, T_C_B, lms0, obs, mask, lm_valid, pre, pre_valid) = make_problem()
    W = W_KF

    # Full-trip LM (no early convergence exit) -> per-iteration cost numbers.
    cfg_ba = ba.BAConfig(cost_tol=0.0, param_tol=0.0)
    cfg_vio = vio_ba.VIOBAConfig(cost_tol=0.0, param_tol=0.0)

    t = timeit_pipelined(lambda: ba.solve_ba(
        state0.T_W_B, T_C_B, lms0, obs, mask, lm_valid, cfg_ba), n=args.n)
    print(f"BA {W_KF}x{N_LM} (20 it):            {t:8.2f} ms")

    prior6 = empty_prior(W, 6)
    t = timeit_pipelined(lambda: ba.solve_ba_marginalized(
        state0.T_W_B, T_C_B, lms0, obs, mask, lm_valid, prior6,
        jnp.asarray(True), cfg_ba), n=args.n)
    print(f"BA+marg {W_KF}x{N_LM} (20 it):       {t:8.2f} ms")

    t = timeit_pipelined(lambda: vio_ba.solve_vio_ba(
        state0, T_C_B, lms0, obs, mask, lm_valid, pre, pre_valid, cfg_vio),
        n=args.n)
    print(f"VIO BA {W_KF}x{N_LM} (20 it):        {t:8.2f} ms")

    prior15 = empty_prior(W, 15)
    t = timeit_pipelined(lambda: vio_ba.solve_vio_ba_marginalized(
        state0, T_C_B, lms0, obs, mask, lm_valid, pre, pre_valid, prior15,
        jnp.asarray(True), cfg_vio), n=args.n)
    print(f"VIO BA+marg {W_KF}x{N_LM} (20 it):   {t:8.2f} ms")


if __name__ == "__main__":
    main()
