"""ORB+PnP visual-odometry tracker: pose recovery on a synthetic textured
scene + full tracker->mapper pipeline, and the ATE evaluation utility."""
import numpy as np
import pytest

import jax.numpy as jnp

from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.tracking.gt_tracker import Frame
from photo_slam_tpu.utils.evaluate import ate_rmse, umeyama_alignment

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.tracking.vo_tracker import OrbVoTracker  # noqa: E402

W, H, F = 320, 240, 260.0
PLANE_Z = 5.0


def make_camera():
    return Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                  fx=F, fy=F, cx=W / 2, cy=H / 2)


def textured_world(n=3000, seed=0):
    """High-frequency textured plane: enough ORB corners to track."""
    rng = np.random.RandomState(seed)
    span_x = PLANE_Z * W / (2 * F) * 2.2
    span_y = PLANE_Z * H / (2 * F) * 2.2
    pts = np.stack([rng.uniform(-span_x, span_x, n),
                    rng.uniform(-span_y, span_y, n),
                    np.full(n, PLANE_Z) + rng.uniform(-0.1, 0.1, n)],
                   1).astype(np.float32)
    scales = np.full((n, 3), 0.035, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 0.95, np.float32)
    cols = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return pts, scales, quats, opac, cols


def render_frame(world, trans, cam):
    pts, scales, quats, opac, cols = world
    mats = build_camera_matrices(np.eye(3), trans, 0.01, 100.0,
                                 cam.fovx, cam.fovy)
    settings = RenderSettings(width=W, height=H,
                              tan_fovx=np.tan(cam.fovx / 2),
                              tan_fovy=np.tan(cam.fovy / 2),
                              max_per_tile=1024)
    res = render(jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
                 jnp.asarray(opac), mats, settings, jnp.zeros(3),
                 colors_precomp=jnp.asarray(cols))
    return np.asarray(res.image)


@pytest.fixture(scope="module")
def sequence():
    cam = make_camera()
    world = textured_world()
    frames = []
    gt_trans = []
    for i in range(6):
        t = np.array([0.06 * i, 0.02 * i, 0.0])
        img = render_frame(world, t, cam)
        depth = np.full((H, W), PLANE_Z, np.float32)
        frames.append(Frame(image=img, quat_wxyz=np.array([1.0, 0, 0, 0]),
                            trans=t, depth=depth, filename=f"f{i}"))
        gt_trans.append(t)
    return cam, frames, np.array(gt_trans)


class TestVoTracker:
    def test_pose_recovery(self, sequence):
        cam, frames, gt_trans = sequence
        tracker = OrbVoTracker(cam, num_features=1200, min_inliers=15,
                               kf_min_interval=1)
        est = []
        for fr in frames:
            res = tracker.track(fr)
            assert not res.lost, "tracking lost"
            est.append(tracker.tcw[:3, 3].copy())
        est = np.array(est)
        # Tcw translation should match GT trans (R = I).
        err = np.abs(est - gt_trans)
        assert err.max() < 0.03, f"pose error too large: {err.max()}"

    @pytest.mark.slow
    def test_keyframe_ops_drive_mapper(self, sequence):
        cam, frames, _ = sequence
        from photo_slam_tpu.config import Config
        from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType

        cfg = Config()
        cfg.renderer.initial_capacity = 8192
        cfg.mapper.min_num_initial_map_kfs = 2
        cfg.mapper.do_gaus_pyramid_training = False
        cfg.opt.densify_from_iter = 1000
        mapper = GaussianMapper(cfg, SensorType.RGBD)
        mapper.add_camera(cam)

        tracker = OrbVoTracker(cam, num_features=800, min_inliers=15,
                               kf_min_interval=1, kf_max_translation=0.03)
        tracker.run(iter(frames), mapper.queue.push)
        assert tracker.done
        assert len(tracker.live_kf_ids) >= 2

        mapper.run(is_tracker_done=lambda: True, max_iterations=10)
        assert mapper.initial_mapped
        assert mapper.trainer.iteration >= 9
        assert mapper.trainer.metrics.num_live > 100


class TestEvaluate:
    def test_umeyama_identity(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(50, 3)
        s, R, t = umeyama_alignment(pts, pts)
        assert s == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, 0.0, atol=1e-6)

    def test_umeyama_recovers_similarity(self):
        rng = np.random.RandomState(1)
        src = rng.randn(100, 3)
        from photo_slam_tpu.utils.math import quat_to_rotmat
        q = np.array([0.9, 0.1, 0.2, -0.3])
        R_true = np.asarray(quat_to_rotmat(jnp.asarray(q / np.linalg.norm(q))))
        dst = 2.5 * src @ R_true.T + np.array([1.0, -2.0, 0.5])
        s, R, t = umeyama_alignment(src, dst)
        assert s == pytest.approx(2.5, rel=1e-5)
        np.testing.assert_allclose(R, R_true, atol=1e-5)
        assert ate_rmse(src, dst) < 1e-5

    def test_ate_nonzero_for_noise(self):
        rng = np.random.RandomState(2)
        src = rng.randn(100, 3)
        dst = src + rng.randn(100, 3) * 0.01
        e = ate_rmse(src, dst)
        assert 0.001 < e < 0.05
