"""Native motion-only BA core: build, pose recovery, numpy-fallback parity."""
import numpy as np
import pytest

from photo_slam_tpu.native import (_pose_optimize_numpy, native_available,
                                   pose_optimize)


def synth_problem(noise_px=0.0, seed=0, n=120):
    rng = np.random.RandomState(seed)
    fx = fy = 300.0
    cx, cy = 160.0, 120.0
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(3, 8, n)], 1)
    # True pose: small rotation + translation.
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    t = np.array([0.2, -0.1, 0.05])
    T_true = np.eye(4)
    T_true[:3, :3] = R
    T_true[:3, 3] = t
    xc = pts @ R.T + t
    obs = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                    fy * xc[:, 1] / xc[:, 2] + cy], 1)
    obs += rng.randn(n, 2) * noise_px
    return pts, obs, (fx, fy, cx, cy), T_true


class TestPoseBA:
    def test_native_builds(self):
        assert native_available(), "g++ build of pose_ba.cpp failed"

    def test_recovers_pose_from_identity(self):
        pts, obs, (fx, fy, cx, cy), T_true = synth_problem()
        n_inl, T, cost = pose_optimize(pts, obs, fx, fy, cx, cy, np.eye(4),
                                       max_iters=50)
        np.testing.assert_allclose(T, T_true, atol=1e-5)
        assert n_inl == pts.shape[0]
        assert cost < 1e-6

    def test_robust_to_outliers(self):
        pts, obs, (fx, fy, cx, cy), T_true = synth_problem(noise_px=0.3)
        # Corrupt 15% of observations badly.
        rng = np.random.RandomState(1)
        bad = rng.choice(len(obs), len(obs) * 15 // 100, replace=False)
        obs[bad] += rng.uniform(30, 80, (len(bad), 2))
        n_inl, T, _ = pose_optimize(pts, obs, fx, fy, cx, cy, np.eye(4),
                                    huber_delta=2.0, max_iters=60)
        # Pose still close despite outliers.
        np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.02)
        assert n_inl >= len(obs) - len(bad) - 5

    def test_numpy_fallback_matches_native(self):
        pts, obs, (fx, fy, cx, cy), T_true = synth_problem(noise_px=0.5,
                                                           seed=2)
        n1, T1, c1 = pose_optimize(pts, obs, fx, fy, cx, cy, np.eye(4),
                                   max_iters=30)
        n2, T2, c2 = _pose_optimize_numpy(
            np.ascontiguousarray(pts, np.float64),
            np.ascontiguousarray(obs, np.float64),
            fx, fy, cx, cy, 3.0, 5.0, 30, np.eye(4))
        if not native_available():
            pytest.skip("no native lib; fallback already exercised")
        np.testing.assert_allclose(T1, T2, atol=1e-4)
        assert n1 == n2

    def test_improves_noisy_initial_pose(self):
        pts, obs, (fx, fy, cx, cy), T_true = synth_problem(noise_px=0.2,
                                                           seed=3)
        T0 = T_true.copy()
        T0[:3, 3] += [0.05, -0.03, 0.08]
        err0 = np.linalg.norm(T0[:3, 3] - T_true[:3, 3])
        _, T, _ = pose_optimize(pts, obs, fx, fy, cx, cy, T0, max_iters=30)
        err1 = np.linalg.norm(T[:3, 3] - T_true[:3, 3])
        assert err1 < err0 * 0.2
