"""SLAM frontend: local-map tracking, keyframing, local BA, mono init,
loop detection, relocalization — on synthetic rendered sequences.

The frontend replaces the reference's ORB-SLAM3 pipeline (Tracking /
LocalMapping / LoopClosing); these tests exercise the same contracts the
reference's examples rely on: accurate poses, LocalMappingBA operations
that drive the mapper, and loop corrections that reduce drift.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.tracking.gt_tracker import Frame
from photo_slam_tpu.utils.math import se3_inverse, se3_log_numpy

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.mapper.mapping_ops import OprType  # noqa: E402
from photo_slam_tpu.tracking.frontend import (SlamFrontend,  # noqa: E402
                                              match_descriptors)

W, H, F = 320, 240, 260.0
PLANE_Z = 5.0


def make_camera():
    return Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                  fx=F, fy=F, cx=W / 2, cy=H / 2)


def textured_world(n=4000, seed=0, span=2.6):
    rng = np.random.RandomState(seed)
    span_x = PLANE_Z * W / (2 * F) * span
    span_y = PLANE_Z * H / (2 * F) * span
    pts = np.stack([rng.uniform(-span_x, span_x, n),
                    rng.uniform(-span_y, span_y, n),
                    np.full(n, PLANE_Z) + rng.uniform(-0.15, 0.15, n)],
                   1).astype(np.float32)
    scales = np.full((n, 3), 0.035, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 0.95, np.float32)
    cols = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return pts, scales, quats, opac, cols


def render_frame(world, R, trans, cam):
    pts, scales, quats, opac, cols = world
    mats = build_camera_matrices(R, trans, 0.01, 100.0, cam.fovx, cam.fovy)
    settings = RenderSettings(width=W, height=H,
                              tan_fovx=np.tan(cam.fovx / 2),
                              tan_fovy=np.tan(cam.fovy / 2),
                              max_per_tile=1024)
    res = render(jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac), mats, settings, jnp.zeros(3),
                 colors_precomp=jnp.asarray(cols))
    return np.asarray(res.image)


def make_sequence(translations, rotations=None, depth=True, seed=0):
    cam = make_camera()
    world = textured_world(seed=seed)
    frames, gt_tcw = [], []
    for i, t in enumerate(translations):
        R = np.eye(3) if rotations is None else rotations[i]
        img = render_frame(world, R, np.asarray(t, np.float64), cam)
        d = np.full((H, W), PLANE_Z, np.float32) if depth else None
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        frames.append(Frame(image=img, quat_wxyz=np.array([1.0, 0, 0, 0]),
                            trans=np.asarray(t, np.float64), depth=d,
                            filename=f"f{i}"))
        gt_tcw.append(T)
    return cam, frames, np.array(gt_tcw)


@pytest.fixture(scope="module")
def rgbd_sequence():
    trans = [np.array([0.05 * i, 0.015 * i, 0.0]) for i in range(10)]
    return make_sequence(trans)


class TestMatching:
    def test_match_descriptors_identity(self):
        rng = np.random.RandomState(0)
        d = rng.randint(0, 256, (50, 32), dtype=np.uint8)
        ia, ib = match_descriptors(d, d, max_dist=10, ratio=0.9)
        assert len(ia) == 50
        np.testing.assert_array_equal(ia, ib)

    def test_match_rejects_random(self):
        rng = np.random.RandomState(1)
        a = rng.randint(0, 256, (40, 32), dtype=np.uint8)
        b = rng.randint(0, 256, (40, 32), dtype=np.uint8)
        ia, _ = match_descriptors(a, b, max_dist=40, ratio=0.8)
        assert len(ia) < 5  # random 256-bit strings ~128 bits apart


class TestRgbdTracking:
    def test_pose_recovery(self, rgbd_sequence):
        cam, frames, gt = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          enable_loop_closing=False)
        for fr in frames:
            fe.process_frame(fr)
        assert len(fe.trajectory) == len(frames)
        err = [np.abs(se3_log_numpy(fe.trajectory[i]
                                    @ se3_inverse(gt[i]))).max()
               for i in range(len(gt))]
        assert max(err) < 0.03, f"pose errors {err}"

    def test_emits_local_ba_ops_with_new_kf_payload(self, rgbd_sequence):
        cam, frames, _ = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0,  # force frequent keyframes
                          enable_loop_closing=False)
        ops = []
        fe.run(iter(frames), ops.append)
        assert fe.done
        assert len(ops) >= 3
        for op in ops:
            assert op.kind == OprType.LOCAL_MAPPING_BA
            new_kfs = [k for k in op.keyframes if k.image is not None]
            assert len(new_kfs) == 1  # exactly one full-payload keyframe
            assert new_kfs[0].kps_pixel is not None
            assert new_kfs[0].kps_point_local is not None
        # First op carries the initial map points.
        assert len(ops[0].points) > 50
        assert ops[0].points.shape == ops[0].colors.shape

    def test_map_grows_and_culls(self, rgbd_sequence):
        cam, frames, _ = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, enable_loop_closing=False)
        for fr in frames:
            fe.process_frame(fr)
        assert fe.map.num_points > 200
        assert len(fe.map.keyframes) >= 3
        # Covisibility: consecutive keyframes share points.
        kfs = sorted(fe.map.keyframes)
        assert kfs[-2] in fe.map.covisible_kfs(kfs[-1])

    @pytest.mark.slow
    def test_drives_mapper(self, rgbd_sequence):
        cam, frames, _ = rgbd_sequence
        from photo_slam_tpu.config import Config
        from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType

        cfg = Config()
        cfg.renderer.initial_capacity = 8192
        cfg.mapper.min_num_initial_map_kfs = 2
        cfg.mapper.do_gaus_pyramid_training = False
        cfg.opt.densify_from_iter = 1000
        mapper = GaussianMapper(cfg, SensorType.RGBD)
        mapper.add_camera(cam)
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, enable_loop_closing=False)
        fe.run(iter(frames), mapper.queue.push)
        assert len(fe.live_kf_ids) >= 2
        mapper.run(is_tracker_done=lambda: True, max_iterations=10)
        assert mapper.initial_mapped
        assert mapper.trainer.metrics.num_live > 100


class TestMonocular:
    def test_two_view_init_and_tracking(self):
        # Mono: no depth anywhere; init must come from two-view geometry.
        trans = [np.array([0.06 * i, 0.0, 0.0]) for i in range(8)]
        cam, frames, gt = make_sequence(trans, depth=False)
        fe = SlamFrontend(cam, sensor="mono", kf_min_interval=1,
                          enable_loop_closing=False)
        ops = []
        for fr in frames:
            ops.extend(fe.process_frame(fr))
        assert fe.map.num_points > 50, "mono init failed"
        assert len(fe.map.keyframes) >= 2
        assert len(ops) >= 2
        # Up-to-scale trajectory check: directions of translation.
        est = np.array([se3_inverse(T)[:3, 3] for T in fe.trajectory])
        g = np.array([se3_inverse(T)[:3, 3] for T in gt])
        # Align scale via Umeyama and compare.
        from photo_slam_tpu.utils.evaluate import ate_rmse
        nonzero = np.linalg.norm(est, axis=1) > 1e-9
        assert nonzero.sum() >= 4
        err = ate_rmse(est[nonzero], g[nonzero])
        assert err < 0.05, f"mono ATE {err}"

    def test_mono_ops_have_no_depth_payload(self):
        trans = [np.array([0.06 * i, 0.0, 0.0]) for i in range(6)]
        cam, frames, _ = make_sequence(trans, depth=False)
        fe = SlamFrontend(cam, sensor="mono", kf_min_interval=1,
                          enable_loop_closing=False)
        ops = []
        fe.run(iter(frames), ops.append)
        assert ops, "no operations emitted"
        for op in ops:
            for kf in op.keyframes:
                assert kf.aux_image is None


class TestAsyncLocalMapping:
    """Async local mapping: the keyframe tail (cull + local BA + loop
    verification + op emission) runs on a worker thread, the reference's
    LocalMapping-thread architecture (ORB-SLAM3/src/System.cc:194-213).
    Contract: identical op payloads and equally accurate poses as sync."""

    def test_async_pose_and_ops_match_sync(self, rgbd_sequence):
        cam, frames, gt = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, enable_loop_closing=False,
                          async_local_mapping=True)
        ops = []
        try:
            fe.run(iter(frames), ops.append)  # run() flushes + closes
        finally:
            fe.close()
        assert fe.done
        assert len(ops) >= 3
        for op in ops:
            assert op.kind == OprType.LOCAL_MAPPING_BA
            new_kfs = [k for k in op.keyframes if k.image is not None]
            assert len(new_kfs) == 1  # exactly one full-payload keyframe
            assert new_kfs[0].kps_pixel is not None
        assert len(ops[0].points) > 50
        err = [np.abs(se3_log_numpy(fe.trajectory[i]
                                    @ se3_inverse(gt[i]))).max()
               for i in range(len(gt))]
        assert max(err) < 0.03, f"pose errors {err}"

    def test_worker_exception_surfaces(self, rgbd_sequence):
        cam, frames, _ = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, enable_loop_closing=False,
                          async_local_mapping=True)
        try:
            fe.process_frame(frames[0])
            fe.flush()
            # Sabotage the worker's BA path; the error must not be
            # swallowed silently.
            fe._run_local_ba = None  # type: ignore[assignment]
            fe.process_frame(frames[1])
            fe.process_frame(frames[2])
            with pytest.raises(TypeError):
                fe.flush()
        finally:
            fe.close()


class TestRelocalization:
    def test_recovers_after_blackout(self, rgbd_sequence):
        cam, frames, gt = rgbd_sequence
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          enable_loop_closing=False)
        for fr in frames[:5]:
            fe.process_frame(fr)
        # Feed garbage frames (blackout) to force tracking loss.
        black = Frame(image=np.zeros_like(frames[0].image),
                      quat_wxyz=np.array([1.0, 0, 0, 0]),
                      trans=np.zeros(3), depth=frames[0].depth,
                      filename="black")
        for _ in range(3):
            fe.process_frame(black)
        # Resume at a previously-seen viewpoint.
        fe.process_frame(frames[4])
        fe.process_frame(frames[5])
        err = np.abs(se3_log_numpy(fe.tcw @ se3_inverse(gt[5]))).max()
        assert err < 0.05, f"relocalization failed, err {err}"


class TestMappingQualityParity:
    """The full SLAM-driven pipeline maps as well as the GT-pose-driven one
    (VERDICT round-1 'done' criterion for the frontend): same sequence, two
    mappers, held-out-view PSNR within tolerance, ATE reported."""

    def _run_mapper(self, cam, push_ops, iters=50):
        from photo_slam_tpu.config import Config
        from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType

        cfg = Config()
        cfg.renderer.initial_capacity = 8192
        cfg.mapper.min_num_initial_map_kfs = 2
        cfg.mapper.do_gaus_pyramid_training = False
        cfg.opt.densify_from_iter = 10000
        mapper = GaussianMapper(cfg, SensorType.RGBD)
        mapper.add_camera(cam)
        push_ops(mapper.queue.push)
        mapper.run(is_tracker_done=lambda: True, max_iterations=iters)
        return mapper

    @pytest.mark.slow
    def test_slam_driven_matches_gt_driven_psnr(self, rgbd_sequence):
        from photo_slam_tpu.ops.losses import psnr
        from photo_slam_tpu.tracking.gt_tracker import GroundTruthTracker
        from photo_slam_tpu.utils.evaluate import ate_rmse
        from photo_slam_tpu.utils.math import rotmat_to_quat

        cam, frames, gt = rgbd_sequence

        def push_gt(push):
            tr = GroundTruthTracker(cam, keyframe_every=1)
            tr.run(iter(frames), push)

        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, enable_loop_closing=False)

        def push_slam(push):
            fe.run(iter(frames), push)

        m_gt = self._run_mapper(cam, push_gt)
        m_slam = self._run_mapper(cam, push_slam)

        # Frontend trajectory accuracy (reported in run_summary by the app).
        est = np.stack([se3_inverse(t)[:3, 3] for t in fe.trajectory])
        gt_pos = np.stack([se3_inverse(t)[:3, 3] for t in gt])
        err = ate_rmse(est, gt_pos)
        assert err < 0.05, f"frontend ATE {err:.3f} m"

        # Held-out view (between keyframes, slightly off-trajectory).
        world = textured_world(seed=0)
        t_test = np.array([0.22, 0.07, 0.02])
        gt_img = render_frame(world, np.eye(3), t_test, cam)
        quat = np.asarray(rotmat_to_quat(jnp.asarray(np.eye(3))))
        img_gt_driven = m_gt.render_from_pose(quat, t_test, W, H)
        img_slam_driven = m_slam.render_from_pose(quat, t_test, W, H)
        p_gt = float(psnr(jnp.asarray(img_gt_driven), jnp.asarray(gt_img)))
        p_slam = float(psnr(jnp.asarray(img_slam_driven),
                            jnp.asarray(gt_img)))
        assert p_gt > 15.0, f"GT-driven mapping failed to fit: {p_gt:.2f} dB"
        assert p_slam > p_gt - 2.0, (
            f"SLAM-driven mapping {p_slam:.2f} dB far below GT-driven "
            f"{p_gt:.2f} dB")
