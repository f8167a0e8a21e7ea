"""Loop closing: place recognition detects a revisit (not injected), the
pose graph pulls drifted keyframes back, and the LoopClosingBA operation
drives the mapper's correction path.

The role of the reference's LoopClosing thread (reference:
ORB-SLAM3/src/LoopClosing.cc: DetectLoop -> ComputeSim3 -> CorrectLoop ->
pushMappingOperation at :1201).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.mapper.mapping_ops import OprType  # noqa: E402
from photo_slam_tpu.tracking.frontend import SlamFrontend  # noqa: E402
from photo_slam_tpu.utils.math import (se3_exp_numpy, se3_inverse,  # noqa: E402
                                       se3_log_numpy)
from tests.test_frontend import make_camera, make_sequence  # noqa: E402


CYL_R = 5.0


def _cylinder_world(n=9000, seed=3):
    """Textured cylinder of splats around the origin: full angular coverage
    so a panning camera always sees structure."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    phi = rng.uniform(-2.2, 2.2, n)  # radians around +z
    y = rng.uniform(-1.6, 1.6, n)
    r = CYL_R + rng.uniform(-0.1, 0.1, n)
    pts = np.stack([r * np.sin(phi), y, r * np.cos(phi)], 1).astype(
        np.float32)
    scales = np.full((n, 3), 0.035, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 0.95, np.float32)
    cols = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return pts, scales, quats, opac, cols


@pytest.fixture(scope="module")
def pan_loop():
    """Yaw-panning out-and-back: the camera sweeps 0 -> ~66deg -> 0. Views
    at distant yaws share no structure (the FoV half-width is ~31deg), so
    the sequence contains a genuine non-covisible excursion and the return
    IS a loop-closure revisit."""
    from photo_slam_tpu.tracking.gt_tracker import Frame
    from tests.test_frontend import render_frame

    cam = make_camera()
    world = _cylinder_world()
    yaws = list(np.linspace(0.0, 1.15, 9)) + list(np.linspace(1.0, 0.0, 8))
    frames, gt = [], []
    for i, yaw in enumerate(yaws):
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])  # world->cam
        img = render_frame(world, R, np.zeros(3), cam)
        # Analytic cylinder depth: for pixel ray d_cam, world dir = R^T d_cam;
        # t solves |radial(t * d_w)| = CYL_R; z-depth = t * d_cam_z = t.
        u, v = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
        d_cam = np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                          np.ones_like(u, np.float64)], -1)
        d_w = d_cam @ R  # == R^T applied to rows
        a = np.sqrt(d_w[..., 0] ** 2 + d_w[..., 2] ** 2)
        t = CYL_R / np.maximum(a, 1e-9)
        depth = t.astype(np.float32)  # d_cam_z == 1 -> z-depth == t
        T = np.eye(4)
        T[:3, :3] = R
        frames.append(Frame(image=img, quat_wxyz=np.array([1.0, 0, 0, 0]),
                            trans=np.zeros(3), depth=depth,
                            filename=f"f{i}"))
        gt.append(T)
    return cam, frames, np.array(gt)


def _drift_late_keyframes(fe, from_kfid, drift_xi, scale=1.0):
    """Apply a similarity world-frame drift W (rigid + optional uniform
    scale) to keyframes >= from_kfid and the map points they created — a
    self-consistent distorted submap, exactly what accumulated (monocular)
    odometry drift produces: camera coords scale uniformly with the
    structure, so projections are unchanged. Observations that cross the
    drift boundary are severed (in a genuinely drifted run those matches
    would never have formed: the reprojection would have rejected them)."""
    from photo_slam_tpu.utils.sim3 import Sim3

    T_w = se3_exp_numpy(drift_xi)
    W = Sim3(scale, T_w[:3, :3], T_w[:3, 3])
    W_inv_rigid = se3_inverse(T_w)

    def drift_pose(tcw):
        # SE3 pose consistent with the similarity-drifted points: the Sim3
        # composition s*T o W^-1 has unit scale ([R Rw^T | s t - R Rw^T tw]).
        s_t = Sim3(scale, tcw[:3, :3], scale * tcw[:3, 3])
        d = s_t.compose(W.inverse())
        out = np.eye(4)
        out[:3, :3] = d.R
        out[:3, 3] = d.t
        return out

    n = fe.map._n
    sel = (fe.map.first_kf[:n] >= from_kfid) & fe.map.alive[:n]
    fe.map.xyz[:n][sel] = W.apply(fe.map.xyz[:n][sel])
    for kfid, kf in fe.map.keyframes.items():
        if kfid >= from_kfid:
            kf.tcw = (kf.tcw @ W_inv_rigid if scale == 1.0
                      else drift_pose(kf.tcw))
            # Sever observations of pre-drift points.
            for kp_idx, mp in enumerate(kf.mp_ids):
                if mp >= 0 and fe.map.first_kf[mp] < from_kfid:
                    fe.map.obs[mp].pop(kfid, None)
                    fe.map.n_obs[mp] = len(fe.map.obs[mp])
                    kf.mp_ids[kp_idx] = -1
        else:
            for kp_idx, mp in enumerate(kf.mp_ids):
                if mp >= 0 and fe.map.first_kf[mp] >= from_kfid:
                    fe.map.obs[mp].pop(kfid, None)
                    fe.map.n_obs[mp] = len(fe.map.obs[mp])
                    kf.mp_ids[kp_idx] = -1
    fe.tcw = (fe.tcw @ W_inv_rigid if scale == 1.0
              else drift_pose(fe.tcw))


class TestLoopClosing:
    def test_detects_and_corrects_drift(self, pan_loop):
        cv2.setRNGSeed(7)  # PnP-RANSAC uses cv2's GLOBAL RNG
        cam, frames, gt = pan_loop
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0,  # keyframe nearly every frame
                          ba_window=4, enable_loop_closing=True,
                          loop_min_score=40, loop_min_inliers=20)
        # Phase 1: outbound sweep only, no loop closing.
        fe.enable_loop_closing = False
        for fr in frames[:9]:
            fe.process_frame(fr)
        n_out = len(fe.map.keyframes)
        assert n_out >= 6, f"outbound produced too few keyframes: {n_out}"

        # Inject accumulated drift at the turnaround: keyframes from the
        # midpoint on (and the points they created) move rigidly — large
        # enough that returning frames cannot silently re-match the old
        # (undrifted) map through the projection window.
        mid = sorted(fe.map.keyframes)[n_out - 2]
        drift = np.array([0.5, -0.3, 0.4, 0.0, 0.0, 0.08])
        _drift_late_keyframes(fe, mid, drift)

        # Phase 2: the return sweep. The detector must recognize the start
        # views against the early (undrifted) keyframes.
        fe.enable_loop_closing = True
        loop_ops = []
        for fr in frames[9:]:
            for op in fe.process_frame(fr):
                if op.kind == OprType.LOOP_CLOSING_BA:
                    loop_ops.append(op)
        assert fe.num_loops_closed >= 1, "loop was not detected"
        assert loop_ops, "no LoopClosingBA operation emitted"
        op = loop_ops[0]
        # The op carries every keyframe that existed at detection time (the
        # return sweep keeps adding keyframes afterwards).
        assert len(op.keyframes) > n_out
        assert len(op.keyframes) <= len(fe.map.keyframes)
        assert any(k.is_loop_kf for k in op.keyframes)

        # After correction the loop is geometrically closed: the loop
        # keyframe (yaw back near 0) sits near the first keyframe's
        # viewpoint instead of carrying the injected drift.
        first = sorted(fe.map.keyframes)[0]
        loop_kf = max(k.kfid for k in op.keyframes if k.is_loop_kf)
        rel = (fe.map.keyframes[loop_kf].tcw
               @ se3_inverse(fe.map.keyframes[first].tcw))
        xi = se3_log_numpy(rel)
        # GT relative pose between the loop pair is a small yaw; the
        # injected 0.35m translation drift must be mostly gone.
        assert np.abs(xi[:3]).max() < 0.15, (
            f"loop not closed: residual {xi}")

    def test_mono_scale_drift_corrected(self, pan_loop):
        cv2.setRNGSeed(7)  # PnP-RANSAC uses cv2's GLOBAL RNG
        """Monocular scale drift: the late submap is inflated by 1.1x (a
        similarity drift — projections self-consistent). The Sim3 essential
        graph (reference: ORB-SLAM3/src/Optimizer.cc:1762 4DoF/7DoF
        OptimizeEssentialGraph) must measure the relative scale at loop
        verification and shrink the drifted submap back: <2% residual scale
        error, and the LoopClosingBA op carries the per-keyframe scales."""
        cam, frames, gt = pan_loop
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          enable_loop_closing=True,
                          loop_min_score=40, loop_min_inliers=20)
        fe.enable_loop_closing = False
        for fr in frames[:9]:
            fe.process_frame(fr)
        n_out = len(fe.map.keyframes)
        assert n_out >= 6

        # Inject the similarity drift at the sweep MIDPOINT (not the last
        # two keyframes): the BoW minScore gate defers detection to a
        # high-confidence revisit (~kf 12 vs kf 3), by which time tracking
        # re-locks onto whatever undrifted points are still in view — the
        # drift must own enough of the outbound map that the verified loop
        # still measures a genuinely scale-drifted current structure.
        mid = sorted(fe.map.keyframes)[n_out // 2]
        s_drift = 1.1
        _drift_late_keyframes(fe, mid,
                              np.array([0.5, -0.3, 0.4, 0.0, 0.0, 0.08]),
                              scale=s_drift)

        # The return sweep runs MONOCULAR (no depth): new keyframes
        # triangulate against the drifted (scale-inflated) submap, so the
        # loop verification sees genuinely scale-drifted current structure.
        # (Copy the frames — pan_loop is module-scoped and other tests need
        # the depth maps.)
        import dataclasses
        fe.sensor = "mono"
        fe.enable_loop_closing = True
        loop_ops = []
        for fr in frames[9:]:
            fr = dataclasses.replace(fr, depth=None)
            for op in fe.process_frame(fr):
                if op.kind == OprType.LOOP_CLOSING_BA:
                    loop_ops.append(op)
        assert fe.num_loops_closed >= 1, "loop was not detected"
        op = loop_ops[0]

        # The op must carry genuine per-keyframe Sim3 scales (the mapper
        # multiplies each keyframe's visible points by them).
        assert any(abs(k.scale - 1.0) > 0.02 for k in op.keyframes), (
            "per-keyframe Sim3 scales missing from the op")
        # Ground-truth scale criterion: the graph is anchored at the first
        # (metric) keyframe, so after correction the scale-INFLATED points —
        # those created by the drifted keyframes up to and including the
        # loop keyframe — must sit back ON the cylinder: <2% residual
        # median scale error. Points triangulated AFTER the closure are
        # excluded: their radial spread is dominated by narrow-baseline
        # monocular triangulation noise, not gauge (and the reference's
        # essential graph likewise only corrects existing structure).
        first = sorted(fe.map.keyframes)[0]
        loop_kf = max(k.kfid for k in op.keyframes if k.is_loop_kf)
        n_pts = fe.map._n
        fk = fe.map.first_kf[:n_pts]
        late = (fk >= mid) & (fk <= loop_kf) & fe.map.alive[:n_pts]
        assert late.sum() > 50
        xyz = fe.map.xyz[:n_pts][late]
        radial = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 2] ** 2)
        err = abs(float(np.median(radial)) / CYL_R - 1.0)
        assert err < 0.02, f"residual loop scale error {err:.4f} (>=2%)"
        # And the loop is geometrically closed (as in the rigid-drift test).
        rel = (fe.map.keyframes[loop_kf].tcw
               @ se3_inverse(fe.map.keyframes[first].tcw))
        xi = se3_log_numpy(rel)
        assert np.abs(xi[:3]).max() < 0.15, f"loop not closed: {xi}"

    def test_no_false_loop_on_linear_path(self):
        trans = [np.array([0.06 * i, 0.0, 0.0]) for i in range(10)]
        cam, frames, _ = make_sequence(trans, seed=4)
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=3,
                          enable_loop_closing=True)
        for fr in frames:
            fe.process_frame(fr)
        assert fe.num_loops_closed == 0

    def test_no_false_loop_on_repetitive_texture(self):
        """Distractor robustness (VERDICT r3): a forward-only pan across a
        cylinder whose texture is statistically IDENTICAL everywhere
        (i.i.d. random splat colors) but a different instance at every yaw.
        Early and late views share no structure; a retrieval model that
        keys on texture statistics instead of texture identity would fire
        here, and a wrong loop is catastrophic (the pose graph cements it).
        The reference's guard is DBoW2 scoring normalized by the worst
        covisible neighbor (ORB-SLAM3/src/LoopClosing.cc DetectLoop
        minScore) — ours is the same rule over the online BoW index."""
        from photo_slam_tpu.tracking.gt_tracker import Frame
        from tests.test_frontend import render_frame

        cv2.setRNGSeed(7)
        cam = make_camera()
        world = _cylinder_world(seed=11)
        # Forward-only sweep 0 -> ~2.1 rad: no revisit ever happens.
        yaws = np.linspace(0.0, 2.1, 17)
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          enable_loop_closing=True,
                          loop_min_score=40, loop_min_inliers=20)
        for i, yaw in enumerate(yaws):
            cy, sy = np.cos(yaw), np.sin(yaw)
            R = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
            img = render_frame(world, R, np.zeros(3), cam)
            u, v = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
            d_cam = np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                              np.ones_like(u, np.float64)], -1)
            d_w = d_cam @ R
            a = np.sqrt(d_w[..., 0] ** 2 + d_w[..., 2] ** 2)
            depth = (CYL_R / np.maximum(a, 1e-9)).astype(np.float32)
            fe.process_frame(Frame(image=img,
                                   quat_wxyz=np.array([1.0, 0, 0, 0]),
                                   trans=np.zeros(3), depth=depth,
                                   filename=f"f{i}"))
        # The BoW vocabulary must have trained (so this exercises the real
        # retrieval path, not the pre-training fallback) and never accepted
        # a loop on the repetitive-texture distractors.
        assert fe.kfdb.trained
        assert len(fe.map.keyframes) >= 10
        assert fe.num_loops_closed == 0

    def test_bow_recall_on_true_revisit(self, pan_loop):
        """Retrieval recall calibration: on the out-and-back pan the BoW
        database's top hits for the returning keyframes must include the
        genuinely-covisible early keyframes (scored above the covisibility
        minScore gate) — the property the loop detector depends on."""
        cv2.setRNGSeed(7)
        cam, frames, _ = pan_loop
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          enable_loop_closing=False)
        for fr in frames:
            fe.process_frame(fr)
        assert fe.kfdb.trained
        kf_ids = sorted(fe.map.keyframes)
        last = kf_ids[-1]  # yaw back near 0 — a true revisit of kf 0/1
        hits = dict(fe.kfdb.query(last, topk=8))
        early = [k for k in kf_ids[:3] if k in hits]
        assert early, f"no early keyframe retrieved for kf {last}: {hits}"
        cov = fe.map.covisible_kfs(last, 15)
        cov_scores = [fe.kfdb.score(last, c) for c in cov if c in fe.kfdb]
        min_score = min(cov_scores) if cov_scores else 0.0
        assert max(hits[k] for k in early) >= max(min_score, 0.05), (
            hits, min_score)

    def test_loop_op_drives_mapper_correction(self, pan_loop):
        cv2.setRNGSeed(7)  # PnP-RANSAC uses cv2's GLOBAL RNG
        """A detected LoopClosingBA op applied to the mapper exercises the
        visible-point similarity transform path (the reference's
        combineMappingOperations LoopClosingBA case,
        src/gaussian_mapper.cpp:862-963)."""
        cam, frames, _ = pan_loop
        from photo_slam_tpu.config import Config
        from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType

        cfg = Config()
        cfg.renderer.initial_capacity = 8192
        cfg.mapper.min_num_initial_map_kfs = 2
        cfg.mapper.do_gaus_pyramid_training = False
        cfg.opt.densify_from_iter = 10000
        mapper = GaussianMapper(cfg, SensorType.RGBD)
        mapper.add_camera(cam)

        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          loop_min_score=40, loop_min_inliers=20)
        fe.enable_loop_closing = False
        for fr in frames[:9]:
            for op in fe.process_frame(fr):
                mapper.queue.push(op)
        mid = sorted(fe.map.keyframes)[len(fe.map.keyframes) - 2]
        _drift_late_keyframes(fe, mid,
                              np.array([0.5, -0.3, 0.4, 0, 0, 0.08]))
        fe.enable_loop_closing = True
        got_loop = False
        for fr in frames[9:]:
            for op in fe.process_frame(fr):
                got_loop |= op.kind == OprType.LOOP_CLOSING_BA
                mapper.queue.push(op)
        assert got_loop
        mapper.run(is_tracker_done=lambda: True, max_iterations=6)
        assert mapper.initial_mapped
        assert mapper.loop_closure_iteration or mapper.trainer.iteration > 0

    def test_async_worker_detects_and_corrects_drift(self, pan_loop):
        """Async local mapping splits loop closing across threads (the
        reference's LoopClosing-thread architecture): the worker runs
        retrieval + PnP verification, the tracking thread applies the
        pose-graph correction at the next frame boundary. The injected
        drift must still come out."""
        cv2.setRNGSeed(7)
        cam, frames, _ = pan_loop
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          enable_loop_closing=True,
                          loop_min_score=40, loop_min_inliers=20,
                          async_local_mapping=True)
        try:
            fe.enable_loop_closing = False
            for fr in frames[:9]:
                fe.process_frame(fr)
            fe.flush()  # drain the worker before mutating the map
            n_out = len(fe.map.keyframes)
            assert n_out >= 6
            mid = sorted(fe.map.keyframes)[n_out - 2]
            _drift_late_keyframes(fe, mid,
                                  np.array([0.5, -0.3, 0.4, 0, 0, 0.08]))
            fe.enable_loop_closing = True
            loop_ops = []
            for fr in frames[9:]:
                for op in fe.process_frame(fr):
                    if op.kind == OprType.LOOP_CLOSING_BA:
                        loop_ops.append(op)
            # A loop verified on the very last keyframe is still pending.
            fe.flush()
            loop_ops += [op for op in fe._apply_pending()
                         if op.kind == OprType.LOOP_CLOSING_BA]
            assert fe.num_loops_closed >= 1, "loop was not detected"
            assert loop_ops, "no LoopClosingBA operation emitted"
            first = sorted(fe.map.keyframes)[0]
            loop_kf = max(k.kfid for k in loop_ops[0].keyframes
                          if k.is_loop_kf)
            rel = (fe.map.keyframes[loop_kf].tcw
                   @ se3_inverse(fe.map.keyframes[first].tcw))
            xi = se3_log_numpy(rel)
            assert np.abs(xi[:3]).max() < 0.15, (
                f"loop not closed: residual {xi}")
        finally:
            fe.close()
