"""Diagnose the mono-inertial e2e init: run the same synthetic sequence as
tests/test_imu.py::test_mono_inertial_frontend_recovers_metric_scale, capture
the exact (Rwb, pwb, preints) handed to initialize_imu, and compare:
  (a) similarity fit of visual kf positions -> GT positions (true gauge
      scale + visual pose noise magnitude),
  (b) init on GT-exact poses with the SAME preintegrations (validates the
      preintegration chain / timing),
  (c) init on the actual visual poses (what the frontend computes).
"""
import jax

jax.config.update("jax_platforms", "cpu")  # host-only diagnostic

import numpy as np

import photo_slam_tpu.tracking.frontend as fe_mod
from photo_slam_tpu.tracking import imu as imu_mod
from photo_slam_tpu.tracking.imu import (GRAVITY, initialize_imu,
                                         right_jacobian, so3_exp)

G_W = np.array([0.0, 0.0, -GRAVITY])
captured = {}

_orig = imu_mod.initialize_imu


def spy(Rwb, pwb, preints, monocular=True):
    res = _orig(Rwb, pwb, preints, monocular=monocular)
    captured.setdefault("calls", []).append(
        (list(Rwb), list(pwb), list(preints), res))
    return res


def main():
    import tests.test_imu as ti
    from photo_slam_tpu.tracking.frontend import SlamFrontend
    from tests.test_frontend import PLANE_Z, make_sequence

    fps, n_frames, imu_hz = 30.0, 150, 200.0

    def path(t):
        p = np.array([0.70 * np.sin(1.4 * t), 0.45 * (1 - np.cos(1.1 * t)),
                      0.25 * np.sin(0.7 * t)])
        a = np.array([-0.70 * 1.4 ** 2 * np.sin(1.4 * t),
                      0.45 * 1.1 ** 2 * np.cos(1.1 * t),
                      -0.25 * 0.7 ** 2 * np.sin(0.7 * t)])
        return p, a

    import os
    NO_ROT = os.environ.get("DIAG_NO_ROT", "0") == "1"

    def rot(t):
        if NO_ROT:
            return np.eye(3), np.zeros(3)
        psi = np.array([0.04 * np.sin(0.9 * t), 0.05 * np.sin(0.6 * t), 0.0])
        psi_dot = np.array([0.04 * 0.9 * np.cos(0.9 * t),
                            0.05 * 0.6 * np.cos(0.6 * t), 0.0])
        return so3_exp(psi), right_jacobian(psi) @ psi_dot

    trans, rots, times = [], [], []
    for i in range(n_frames):
        t = i / fps
        p, _ = path(t)
        Rwb, _ = rot(t)
        R_cw = Rwb.T
        trans.append(-R_cw @ p)
        rots.append(R_cw)
        times.append(t)
    DEEP = os.environ.get("DIAG_DEEP", "0") == "1"
    if DEEP:
        # Depth-diverse world: breaks the planar two-view degeneracy
        # (findEssentialMat on a plane) and anchors PnP translation.
        import tests.test_frontend as tf
        rng = np.random.RandomState(0)
        n = 4000
        span_x = tf.PLANE_Z * tf.W / (2 * tf.F) * 2.6
        span_y = tf.PLANE_Z * tf.H / (2 * tf.F) * 2.6
        pts = np.stack([rng.uniform(-span_x, span_x, n),
                        rng.uniform(-span_y, span_y, n),
                        rng.uniform(0.5 * tf.PLANE_Z, 1.5 * tf.PLANE_Z, n)],
                       1).astype(np.float32)
        world = (pts, np.full((n, 3), 0.035, np.float32),
                 np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1)),
                 np.full(n, 0.95, np.float32),
                 rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32))
        cam = tf.make_camera()
        frames = []
        from photo_slam_tpu.tracking.gt_tracker import Frame
        for i, (t, R) in enumerate(zip(trans, rots)):
            img = tf.render_frame(world, R, np.asarray(t, np.float64), cam)
            frames.append(Frame(image=img,
                                quat_wxyz=np.array([1.0, 0, 0, 0]),
                                trans=np.asarray(t, np.float64), depth=None,
                                filename=f"f{i}"))
    else:
        cam, frames, _gt = make_sequence(trans, rotations=rots, depth=False)
    for i, fr in enumerate(frames):
        fr.timestamp = times[i]
        if i == 0:
            fr.imu = None
            continue
        ts = np.arange(times[i - 1], times[i] - 1e-9, 1.0 / imu_hz)
        accs, gyros = [], []
        for tk in ts:
            tm = tk + 0.5 / imu_hz
            _, a_w = path(tm)
            Rwb, w_b = rot(tm)
            accs.append(Rwb.T @ (a_w - G_W))
            gyros.append(w_b)
        fr.imu = (ts, np.array(accs), np.array(gyros))

    # Patch the spy into the frontend's import site.
    imu_mod.initialize_imu = spy
    fe = SlamFrontend(cam, sensor="mono", kf_min_interval=2,
                      kf_max_interval=6, enable_loop_closing=False,
                      use_imu=True)
    # Keep kf timestamps visible for GT comparison.
    all_ops = []
    for i, fr in enumerate(frames):
        all_ops.extend(fe.process_frame(fr))
        if i % 5 == 0 or i == len(frames) - 1:
            n_ = fe.map._n
            live = fe.map.alive[:n_]
            med = float("nan")
            if live.sum() > 10:
                z = (fe.map.xyz[:n_][live] @ fe.tcw[:3, :3].T
                     + fe.tcw[:3, 3])[:, 2]
                z = z[z > 1e-6]
                if len(z) > 10:
                    med = float(np.median(z))
            print(f"  f{i:3d} t={times[i]:.2f} kfs={len(fe.map.keyframes)} "
                  f"pts={int(live.sum())} med_depth={med:.3f} "
                  f"(gauge~{med / 5.0:.3f})")
    imu_mod.initialize_imu = _orig
    print(f"init calls: {len(captured.get('calls', []))}, "
          f"initialized={fe.imu_initialized}, "
          f"refinements={fe.num_scale_refinements}")
    from photo_slam_tpu.mapper.mapping_ops import OprType
    srs = [o for o in all_ops if o.kind == OprType.SCALE_REFINEMENT]
    print("scale ops:", [round(float(o.scale), 3) for o in srs],
          "product:", round(float(np.prod([o.scale for o in srs])), 3))
    if not captured.get("calls"):
        return

    Rwb_v, pwb_v, preints, res = captured["calls"][-1]
    n = len(Rwb_v)
    tks = list(fe._imu_init_debug["times"])
    print("kf times:", np.round(tks, 3))
    print("preint dT:", np.round([p.dT for p in preints], 3),
          "vs dt:", np.round(np.diff(tks), 3))
    gt_p = np.array([path(t)[0] for t in tks])
    gt_R = [rot(t)[0] for t in tks]
    vis_p = np.array(pwb_v)

    # (a00) per-FRAME tracked motion vs GT (5-frame windows): catches the
    # tracker under-estimating motion irrespective of kf/BA bookkeeping.
    cs = np.array([np.linalg.inv(T)[:3, 3] for T in fe.trajectory])
    for i in range(10, min(len(cs), n_frames) - 5, 10):
        dv_ = np.linalg.norm(cs[i + 5] - cs[i])
        dg_ = np.linalg.norm(path(times[i + 5])[0] - path(times[i])[0])
        print(f"  frames {i:3d}->{i+5:3d}: |dc_vis|/|dc_gt| = "
              f"{dv_ / max(dg_, 1e-12):.4f} (local scale "
              f"{dg_ / max(dv_, 1e-12):6.2f})")

    # (a0) LOCAL gauge per chain interval: |dp_vis| / |dp_gt| (inverse
    # scale, no global fit needed — shows gauge drift directly).
    dv = np.linalg.norm(np.diff(vis_p, axis=0), axis=1)
    dg = np.linalg.norm(np.diff(gt_p, axis=0), axis=1)
    print("(a0) local 1/scale per interval:",
          np.array2string(dv / np.maximum(dg, 1e-12), precision=4))
    print("     implied local scale:",
          np.array2string(dg / np.maximum(dv, 1e-12), precision=2))

    # (a) similarity fit vis -> GT: s*R*vis + t ~ gt
    mu_v, mu_g = vis_p.mean(0), gt_p.mean(0)
    Xv, Xg = vis_p - mu_v, gt_p - mu_g
    U, S, Vt = np.linalg.svd(Xg.T @ Xv)
    D = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R_fit = U @ D @ Vt
    s_fit = (S * np.diag(D)).sum() / (Xv ** 2).sum()
    resid = Xg - (s_fit * Xv @ R_fit.T)
    print(f"(a) similarity fit: s={s_fit:.4f} (expect ~{PLANE_Z}), "
          f"pose noise rms={np.linalg.norm(resid, axis=1).std():.2e} metric "
          f"= {np.linalg.norm(resid, axis=1).std() / s_fit:.2e} visual")
    # rotation error per kf
    rot_errs = [np.linalg.norm(imu_mod.so3_log(
        (R_fit @ Rv).T @ Rg)) for Rv, Rg in zip(Rwb_v, gt_R)]
    print(f"    rot err mean={np.mean(rot_errs):.4f} rad "
          f"max={np.max(rot_errs):.4f}")

    # (b) init on GT poses scaled into the visual gauge (exact poses).
    pwb_gt_vis = [(R_fit.T @ (p - mu_g)) / s_fit + mu_v for p in gt_p]
    Rwb_gt = [R_fit.T @ Rg for Rg in gt_R]
    r_gt = initialize_imu(Rwb_gt, pwb_gt_vis, preints, monocular=True)
    print(f"(b) init on GT poses:   ok={r_gt.ok} scale={r_gt.scale:.3f} "
          f"resid={r_gt.residual:.2e}")

    # (c) init on actual visual poses.
    r_v = initialize_imu(Rwb_v, pwb_v, preints, monocular=True)
    print(f"(c) init on vis poses:  ok={r_v.ok} scale={r_v.scale:.3f} "
          f"resid={r_v.residual:.2e}  (frontend got {res.scale:.3f})")


if __name__ == "__main__":
    main()
