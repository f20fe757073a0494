"""Double-precision path: the runtime analog of the reference's `use_f32`
cargo feature (ref src/types.rs:17-23 — compile-time Float = f32|f64,
default f64). Here precision is a YAML key; `precision: f64` must carry
float64 end-to-end through camera models, Lie ops and the BA solver.

x64 is enabled in a subprocess so the process-wide jax flag does not leak
into the rest of the suite.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_x64(body: str):
    """Run `body` in a fresh CPU-only interpreter with jax x64 enabled."""
    prog = textwrap.dedent("""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_ENABLE_X64"] = "1"
        import sys
        sys.path.insert(0, %r)
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
    """) % REPO + textwrap.dedent(body)
    res = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                         text=True, timeout=600, cwd=REPO)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    return res.stdout


class TestConfigPrecision:
    def test_default_is_f32(self, tmp_path):
        from rsvio_tpu.utils.config import load_config
        p = tmp_path / "c.yaml"
        p.write_text("camera:\n  image_width: 64\n  image_height: 48\n")
        assert load_config(str(p)).precision == "f32"

    def test_f64_parsed(self, tmp_path):
        from rsvio_tpu.utils.config import load_config
        p = tmp_path / "c.yaml"
        p.write_text("precision: f64\n")
        assert load_config(str(p)).precision == "f64"

    def test_invalid_rejected(self, tmp_path):
        from rsvio_tpu.utils.config import load_config
        p = tmp_path / "c.yaml"
        p.write_text("precision: f16\n")
        with pytest.raises(ValueError):
            load_config(str(p))


@pytest.mark.slow
class TestF64Numerics:
    def test_lie_and_camera_f64(self):
        out = _run_x64("""
            from rsvio_tpu.ops import lie, cameras
            w = jnp.asarray([0.1, -0.2, 0.3], jnp.float64)
            t = jnp.asarray([1.0, 2.0, 3.0], jnp.float64)
            T = lie.se3_from_rt(lie.so3_exp(w), t)
            assert T.dtype == jnp.float64, T.dtype
            # round-trip at double precision: far tighter than f32 allows
            err = float(jnp.abs(lie.so3_log(lie.so3_exp(w)) - w).max())
            assert err < 1e-12, err
            params = cameras.pack_params(
                cameras.PINHOLE_RADTAN, [458.0, 457.0, 376.0, 240.0],
                [-0.28, 0.07, 1e-4, -2e-5], dtype=jnp.float64)
            pt = jnp.asarray([0.11, -0.07], jnp.float64)
            uv, ok = cameras.project(cameras.PINHOLE_RADTAN, params,
                                     jnp.asarray([0.11, -0.07, 1.0],
                                                 jnp.float64))
            assert bool(ok)
            n = cameras.unproject(cameras.PINHOLE_RADTAN, params, uv)
            assert n.dtype == jnp.float64, n.dtype
            err = float(jnp.abs(n - pt).max())
            assert err < 1e-9, err
            print("OK lie/camera f64")
        """)
        assert "OK lie/camera f64" in out

    def test_ba_solver_f64(self):
        out = _run_x64("""
            from rsvio_tpu.models import ba
            from rsvio_tpu.ops import lie
            rng = np.random.default_rng(3)
            W, L = 4, 24
            T_C_B = jnp.stack([jnp.eye(4, dtype=jnp.float64),
                               jnp.eye(4, dtype=jnp.float64).at[0, 3].set(-0.11)])
            poses = [lie.se3_from_rt(
                lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.02)),
                jnp.asarray([0.25 * i, 0.0, 0.0])) for i in range(W)]
            T_W_B = jnp.stack(poses).astype(jnp.float64)
            lms = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], (L, 3)))
            # observations: project ground truth (normalized coords)
            obs_np = np.zeros((W, 2, L, 2))
            for w in range(W):
                T_bw = np.asarray(lie.se3_inverse(T_W_B[w]))
                for c in range(2):
                    for l in range(L):
                        p = (np.asarray(T_C_B[c]) @ T_bw
                             @ np.append(np.asarray(lms[l]), 1.0))[:3]
                        obs_np[w, c, l] = p[:2] / p[2]
            obs = jnp.asarray(obs_np)
            mask = jnp.ones((W, 2, L), bool)
            lm_valid = jnp.ones((L,), bool)
            # perturb all but the first pose (the gauge anchor: fix_first
            # holds pose 0, so it must keep its ground-truth value for the
            # recovered solution to be comparable against GT)
            T0 = jnp.stack([T_W_B[0]] + [lie.se3_mul(lie.se3_exp(
                jnp.asarray(np.r_[rng.normal(size=3) * 0.002,
                                  rng.normal(size=3) * 0.001])), T)
                for T in T_W_B[1:]]).astype(jnp.float64)
            lms0 = lms + jnp.asarray(rng.normal(size=(L, 3)) * 0.01)
            cfg = ba.BAConfig(max_iterations=60, cost_tol=1e-14,
                              param_tol=1e-14)
            res = ba.solve_ba(T0, T_C_B, lms0, obs, mask, lm_valid, cfg)
            assert res.T_W_B.dtype == jnp.float64, res.T_W_B.dtype
            err = float(jnp.abs(res.landmarks - lms).max())
            # f32 plateaus ~1e-3 on this fixture; double must go well past it
            assert err < 1e-7, err
            print("OK ba f64", err)
        """)
        assert "OK ba f64" in out


@pytest.mark.slow
def test_f64_cli_end_to_end(tmp_path):
    """`precision: f64` in the YAML must run the full CLI pipeline in double
    (fresh interpreter so jax x64 does not leak into this suite)."""
    out = _run_x64("""
        sys.path.insert(0, %r)
        from test_players_cli import make_mini_euroc
        root, cfg_path = make_mini_euroc(%r, extra_cfg="precision: f64\\n")
        from rsvio_tpu.cli.run_euroc import main
        rc = main([cfg_path, root, "--max-frames", "6", "--quiet",
                   "--trajectory-out", %r])
        assert rc == 0, rc
        from rsvio_tpu.utils.trajectory import load_tum
        ts, pos, quat = load_tum(%r)
        assert len(ts) == 6 and np.all(np.isfinite(pos))
        print("OK f64 cli")
    """ % (os.path.join(REPO, "tests"), str(tmp_path),
           str(tmp_path / "traj64.txt"), str(tmp_path / "traj64.txt")))
    assert "OK f64 cli" in out
