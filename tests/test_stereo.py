"""Stereo path: SGBM disparity -> depth -> inactive-geometry densification."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType
from photo_slam_tpu.mapper.mapping_ops import KeyframeData
from photo_slam_tpu.models.camera import PINHOLE, Camera

W, H = 256, 192
FX = 200.0
BASELINE = 0.1  # meters
DEPTH = 4.0     # plane depth -> disparity = fx*b/z = 5 px


def make_pair():
    """Textured plane at constant depth: right image = left shifted by the
    disparity fx*B/Z."""
    rng = np.random.RandomState(0)
    tex = rng.rand(H, W + 64, 3).astype(np.float32)
    tex = cv2.GaussianBlur(tex, (5, 5), 1.0)  # smooth for SGBM matching
    disparity = FX * BASELINE / DEPTH
    d = int(round(disparity))
    left = tex[:, 32: 32 + W]
    right = tex[:, 32 + d: 32 + d + W]  # shifted right view
    return (np.transpose(left, (2, 0, 1)).copy(),
            np.transpose(right, (2, 0, 1)).copy(), disparity)


def test_sgbm_disparity_recovers_depth():
    left, right, disp_true = make_pair()
    disp = GaussianMapper._stereo_disparity(left, right)
    assert disp is not None
    center = disp[H // 4: 3 * H // 4, W // 4: 3 * W // 4]
    valid = center > 0
    assert valid.mean() >= 0.3, "SGBM failed to match the textured plane"
    med = np.median(center[valid])
    assert med == pytest.approx(disp_true, abs=1.0)


def test_stereo_inactive_geo_densify():
    cfg = Config()
    cfg.renderer.initial_capacity = 2048
    cfg.mapper.do_gaus_pyramid_training = False
    cfg.mapper.stereo_min_disparity = 1
    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                 stereo_bf=FX * BASELINE)
    mapper = GaussianMapper(cfg, SensorType.STEREO)
    mapper.add_camera(cam)

    left, right, _ = make_pair()
    rng = np.random.RandomState(1)
    kps = np.stack([rng.uniform(W * 0.3, W * 0.7, 100),
                    rng.uniform(H * 0.3, H * 0.7, 100)], 1).astype(np.float32)
    kf_data = KeyframeData(
        kfid=0, camera_id=0, quat_wxyz=np.array([1.0, 0, 0, 0]),
        trans=np.zeros(3), image=left, aux_image=right,
        kps_pixel=kps, kps_point_local=np.zeros((100, 3), np.float32))
    mapper.handle_new_keyframe(kf_data)

    # Points harvested from disparity land in the pre-init cache at ~DEPTH.
    assert mapper._cached_points, "stereo densify produced no points"
    pts = np.concatenate(mapper._cached_points)
    assert pts.shape[0] > 30
    z = pts[:, 2]
    assert np.median(z) == pytest.approx(DEPTH, rel=0.15)


def test_stereo_densify_accepts_depth_map_aux():
    """The feature frontend forwards its SGBM DEPTH as aux_image ([H, W]);
    the GT tracker forwards the raw RIGHT image ([3, H, W]). The mapper's
    stereo densify must dispatch on ndim — treating a depth map as a right
    image silently injects garbage geometry (round-2 review finding)."""
    cfg = Config()
    cfg.renderer.initial_capacity = 2048
    cfg.mapper.do_gaus_pyramid_training = False
    cam = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                 fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                 stereo_bf=FX * BASELINE)
    mapper = GaussianMapper(cfg, SensorType.STEREO)
    mapper.add_camera(cam)

    left, _, _ = make_pair()
    rng = np.random.RandomState(2)
    kps = np.stack([rng.uniform(W * 0.3, W * 0.7, 80),
                    rng.uniform(H * 0.3, H * 0.7, 80)], 1).astype(np.float32)
    depth_map = np.full((H, W), DEPTH, np.float32)
    kf_data = KeyframeData(
        kfid=0, camera_id=0, quat_wxyz=np.array([1.0, 0, 0, 0]),
        trans=np.zeros(3), image=left, aux_image=depth_map,
        kps_pixel=kps, kps_point_local=np.zeros((80, 3), np.float32))
    mapper.handle_new_keyframe(kf_data)

    assert mapper._cached_points, "depth-map aux produced no points"
    pts = np.concatenate(mapper._cached_points)
    z = pts[:, 2]
    assert np.median(z) == pytest.approx(DEPTH, rel=0.05)
