"""Fisheye (Kannala-Brandt8) END-TO-END: a KB8-distorted synthetic sequence
runs through the full rectification -> tracking -> mapping stack
(VERDICT r4 item 7 / missing 7).

The reference SLAM supports KB8 natively
(ORB-SLAM3/src/CameraModels/KannalaBrandt8.cpp) but its mapper REJECTS
fisheye cameras (src/gaussian_mapper.cpp:217-222, 1419-1423); this framework
rectifies fisheye frames to the pinhole view instead (models/camera.py), so
the same sequence maps photorealistically. KB8 projection math is unit-tested
against cv2.fisheye in tests/test_camera.py — this test drives the app-level
path: distorted frames in, trajectory + splat map out.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from photo_slam_tpu.models.camera import FISHEYE, Camera, bilinear_remap
from photo_slam_tpu.tracking.gt_tracker import Frame
from photo_slam_tpu.utils.math import se3_inverse

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.tracking.frontend import SlamFrontend  # noqa: E402
from tests.test_frontend import (H, PLANE_Z, W, F,  # noqa: E402
                                 render_frame, textured_world)


def make_fisheye_camera(k=(0.02, -0.01, 0.003, 0.0)):
    return Camera(camera_id=0, model_id=FISHEYE, width=W, height=H,
                  fx=F, fy=F, cx=W / 2, cy=H / 2,
                  dist_coeffs=np.asarray(k, np.float32))


def distort_to_fisheye(cam: Camera, pinhole_big: np.ndarray,
                       f: float, cx_big: float, cy_big: float) -> np.ndarray:
    """Synthesize the KB8-distorted image from an oversized pinhole render:
    for each DISTORTED pixel, invert theta_d -> theta (Newton) and sample the
    pinhole image at radius tan(theta). Exact inverse of
    Camera.undistort_image up to bilinear interpolation."""
    ys, xs = np.mgrid[0:cam.height, 0:cam.width].astype(np.float64)
    xd = (xs - cam.cx) / cam.fx
    yd = (ys - cam.cy) / cam.fy
    theta_d = np.sqrt(xd * xd + yd * yd)
    k1, k2, k3, k4 = cam.dist_coeffs[:4].astype(np.float64)
    theta = theta_d.copy()
    for _ in range(8):  # Newton: g(t) = t(1 + k1 t^2 + ...) - theta_d
        t2 = theta * theta
        poly = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
        dpoly = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3
                                                          + t2 * 9 * k4)))
        theta = theta - (theta * poly - theta_d) / np.maximum(dpoly, 1e-9)
    scale = np.where(theta_d > 1e-9,
                     np.tan(theta) / np.maximum(theta_d, 1e-9), 1.0)
    map_x = (xd * scale * f + cx_big).astype(np.float32)
    map_y = (yd * scale * f + cy_big).astype(np.float32)
    hwc = np.transpose(pinhole_big, (1, 2, 0))
    out = bilinear_remap(hwc, map_x, map_y)
    return np.transpose(out, (2, 0, 1)).astype(np.float32)


@pytest.mark.slow
def test_kb8_sequence_tracks_and_maps(tmp_path):
    """Distorted KB8 frames -> rectification -> RGBD tracking -> online
    mapping; asserts trajectory accuracy AND rendered-map PSNR inside the
    undistortion-valid region."""
    from photo_slam_tpu.config import Config
    from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType
    from photo_slam_tpu.ops.losses import psnr
    from photo_slam_tpu.utils.evaluate import ate_rmse

    cv2.setRNGSeed(2)
    cam = make_fisheye_camera()
    world = textured_world(seed=1)

    # Oversized pinhole canvas: the distorted image's corners look through
    # tan(theta) > theta, so the source render must cover a wider span.
    big = 1.6
    W2, H2 = int(W * big), int(H * big)
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.render import RenderSettings, render_jit

    def render_big(t):
        pts, scales, quats, opac, cols = world
        mats = build_camera_matrices(np.eye(3), t, 0.01, 100.0,
                                     2 * np.arctan(W2 / (2 * F)),
                                     2 * np.arctan(H2 / (2 * F)))
        settings = RenderSettings(width=W2, height=H2,
                                  tan_fovx=W2 / (2 * F),
                                  tan_fovy=H2 / (2 * F), max_per_tile=1024)
        return np.asarray(render_jit(
            jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), mats, settings, jnp.zeros(3),
            colors_precomp=jnp.asarray(cols)).image)

    n_frames = 10
    frames, gts, pinholes = [], [], []
    for i in range(n_frames):
        t = np.array([0.05 * i, 0.015 * i, 0.0])
        ph_big = render_big(t)
        img_d = distort_to_fisheye(cam, ph_big, F, W2 / 2, H2 / 2)
        # Plane world + identity rotation: z-depth is constant, so the
        # distorted depth image equals the pinhole one.
        depth = np.full((H, W), PLANE_Z, np.float32)
        frames.append(Frame(image=img_d, quat_wxyz=np.array([1.0, 0, 0, 0]),
                            trans=t, depth=depth, filename=f"f{i}"))
        T = np.eye(4)
        T[:3, 3] = t
        gts.append(T)
        y0, x0 = (H2 - H) // 2, (W2 - W) // 2
        pinholes.append(ph_big[:, y0:y0 + H, x0:x0 + W])

    # Sanity: rectification recovers the pinhole view inside the mask.
    mask = cam.undistort_mask()
    rect = np.transpose(cam.undistort_image(
        np.transpose(frames[0].image, (1, 2, 0))), (2, 0, 1))
    rect_psnr = float(psnr(jnp.asarray(rect * mask[None]),
                           jnp.asarray(pinholes[0] * mask[None])))
    assert rect_psnr > 28.0, f"rectification round-trip {rect_psnr:.1f} dB"

    cfg = Config()
    cfg.renderer.initial_capacity = 8192
    cfg.mapper.min_num_initial_map_kfs = 2
    cfg.mapper.do_gaus_pyramid_training = False
    cfg.opt.densify_from_iter = 10000
    mapper = GaussianMapper(cfg, SensorType.RGBD, result_dir=tmp_path)
    mapper.add_camera(cam)
    fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                      kf_tracked_ratio=2.0, enable_loop_closing=False)
    fe.run(iter(frames), mapper.queue.push)
    mapper.run(is_tracker_done=lambda: True, max_iterations=60)

    est = np.stack([se3_inverse(t)[:3, 3] for t in fe.trajectory])
    gt_pos = np.stack([se3_inverse(np.asarray(t))[:3, 3] for t in gts])
    err = ate_rmse(est, gt_pos)
    assert err < 0.05, f"fisheye-sequence ATE {err:.3f} m"

    # The mapped splats render the (pinhole) scene; the pose-render service
    # masks the invalid border itself (cam.has_distortion path).
    img = mapper.render_from_pose(np.array([1.0, 0, 0, 0]),
                                  np.array([0.22, 0.07, 0.0]), W, H)
    gt_img = render_frame(world, np.eye(3), np.array([0.22, 0.07, 0.0]),
                          make_fisheye_camera())  # same intrinsics, pinhole
    p = float(psnr(jnp.asarray(img), jnp.asarray(gt_img * mask[None])))
    assert p > 15.0, f"fisheye-mapped render PSNR {p:.2f} dB"
    # (KB8 rectification samples INWARD — theta_d < tan(theta) — so its
    # undistort mask has no dead border; the masked-border path is covered
    # by the pincushion camera in test_mapper.TestRenderFromPoseMask.)
