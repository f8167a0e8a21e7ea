"""Sensitivity of visual-inertial init to keyframe spacing + visual pose
noise: the e2e frontend test produces keyframes every 1-3 frames at 30fps
(33-100 ms spans) while the unit tests use 350 ms. Measure recovered scale
vs spacing and noise to decide whether the init must subsample its chain.
"""
import numpy as np

from photo_slam_tpu.tracking.imu import (GRAVITY, ImuBias, Preintegrated,
                                         initialize_imu, right_jacobian,
                                         so3_exp)

G_W = np.array([0.0, 0.0, -GRAVITY])
SCALE_TRUE = 5.0


def path(t):
    p = np.array([0.30 * np.sin(1.4 * t), 0.20 * (1 - np.cos(1.1 * t)),
                  0.10 * np.sin(0.7 * t)])
    a = np.array([-0.30 * 1.4 ** 2 * np.sin(1.4 * t),
                  0.20 * 1.1 ** 2 * np.cos(1.1 * t),
                  -0.10 * 0.7 ** 2 * np.sin(0.7 * t)])
    return p, a


def rot(t):
    psi = np.array([0.04 * np.sin(0.9 * t), 0.05 * np.sin(0.6 * t), 0.0])
    psi_dot = np.array([0.04 * 0.9 * np.cos(0.9 * t),
                        0.05 * 0.6 * np.cos(0.6 * t), 0.0])
    return so3_exp(psi), right_jacobian(psi) @ psi_dot


def run(dt_kf, span_s, pose_noise, seed=0):
    rng = np.random.default_rng(seed)
    n = int(span_s / dt_kf) + 1
    Rwb, pwb, preints = [], [], []
    hz = 200.0
    for i in range(n):
        t = i * dt_kf
        Rw, _ = rot(t)
        p, _ = path(t)
        Rwb.append(Rw)
        pwb.append(p / SCALE_TRUE
                   + rng.normal(0, pose_noise, 3))
        if i > 0:
            pre = Preintegrated()
            ts = np.arange(t - dt_kf, t - 1e-9, 1.0 / hz)
            for tk in ts:
                tm = tk + 0.5 / hz
                _, a_w = path(tm)
                Rw2, w_b = rot(tm)
                pre.integrate(Rw2.T @ (a_w - G_W), w_b, 1.0 / hz)
            preints.append(pre)
    res = initialize_imu(Rwb, pwb, preints, monocular=True)
    return res.scale if res.ok else float("nan")


if __name__ == "__main__":
    for dt_kf in (0.0333, 0.0667, 0.1, 0.2, 0.35):
        for noise in (0.0, 1e-4, 5e-4, 2e-3):
            scales = [run(dt_kf, 2.0, noise, seed=s) for s in range(3)]
            print(f"dt_kf={dt_kf:.4f} noise={noise:.0e} "
                  f"scale={np.mean(scales):8.3f} (true {SCALE_TRUE}) "
                  f"spread={np.std(scales):.3f}")
