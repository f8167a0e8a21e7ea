"""Camera distortion models: Brown-Conrady and Kannala-Brandt8 fisheye.

The fisheye model matches the reference SLAM's native camera
(reference: ORB-SLAM3/src/CameraModels/KannalaBrandt8.cpp) — validated here
against OpenCV's cv2.fisheye implementation of the same model — and the
rectify-to-pinhole remap feeds the tracking frontend
(tracking/frontend._rectify_frame).
"""
import numpy as np
import pytest

from photo_slam_tpu.models.camera import FISHEYE, PINHOLE, Camera

cv2 = pytest.importorskip("cv2")


def make_fisheye(w=160, h=120):
    return Camera(camera_id=0, model_id=FISHEYE, width=w, height=h,
                  fx=90.0, fy=90.0, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
                  dist_coeffs=np.array([0.02, -0.005, 0.001, 0.0004],
                                       np.float32))


class TestKannalaBrandt:
    def test_distortion_matches_cv2_fisheye(self):
        """Our KB8 forward projection == cv2.fisheye.distortPoints."""
        cam = make_fisheye()
        rng = np.random.RandomState(0)
        xn = rng.uniform(-0.6, 0.6, 50)
        yn = rng.uniform(-0.45, 0.45, 50)
        xd, yd = cam._distort_normalized(xn, yn)

        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
        D = cam.dist_coeffs[:4].astype(np.float64).reshape(4, 1)
        pts = np.stack([xn, yn], -1).reshape(-1, 1, 2)
        cv_px = cv2.fisheye.distortPoints(
            pts.astype(np.float64), K, D).reshape(-1, 2)
        ours_px = np.stack([xd * cam.fx + cam.cx, yd * cam.fy + cam.cy], -1)
        np.testing.assert_allclose(ours_px, cv_px, atol=1e-6)

    def test_rectified_projection_is_pinhole(self):
        """Undistorting a fisheye image of a known 3D point grid makes the
        points land at their ideal pinhole pixels."""
        cam = make_fisheye()
        # Render dots into the FISHEYE image at their distorted positions.
        img = np.zeros((cam.height, cam.width), np.float32)
        rng = np.random.RandomState(1)
        xn = rng.uniform(-0.5, 0.5, 12)
        yn = rng.uniform(-0.35, 0.35, 12)
        xd, yd = cam._distort_normalized(xn, yn)
        ud = np.round(xd * cam.fx + cam.cx).astype(int)
        vd = np.round(yd * cam.fy + cam.cy).astype(int)
        ok = (ud >= 2) & (ud < cam.width - 2) & (vd >= 2) & (
            vd < cam.height - 2)
        img[vd[ok], ud[ok]] = 1.0

        rect = cam.undistort_image(img)
        # Each dot's mass should appear near its ideal pinhole pixel.
        up = xn * cam.fx + cam.cx
        vp = yn * cam.fy + cam.cy
        for u, v in zip(up[ok], vp[ok]):
            iu, iv = int(round(u)), int(round(v))
            if 3 <= iu < cam.width - 3 and 3 <= iv < cam.height - 3:
                patch = rect[iv - 3:iv + 4, iu - 3:iu + 4]
                assert patch.max() > 0.05, (
                    f"dot not found near pinhole pixel ({u:.1f},{v:.1f})")

    def test_fisheye_always_has_distortion(self):
        cam = Camera(camera_id=0, model_id=FISHEYE, width=64, height=48,
                     fx=40.0, fy=40.0, cx=31.5, cy=23.5,
                     dist_coeffs=np.zeros(4, np.float32))
        assert cam.has_distortion  # equidistant != pinhole even with k=0
        pin = Camera(camera_id=0, model_id=PINHOLE, width=64, height=48,
                     fx=40.0, fy=40.0, cx=31.5, cy=23.5)
        assert not pin.has_distortion

    def test_undistort_mask_marks_border_invalid(self):
        cam = make_fisheye()
        mask = cam.undistort_mask()
        assert mask.shape == (cam.height, cam.width)
        assert mask.min() in (0.0, 1.0) and mask.max() == 1.0


class TestFrontendRectification:
    def test_rectify_frame_keeps_raw_image(self):
        from photo_slam_tpu.tracking.frontend import SlamFrontend
        from photo_slam_tpu.tracking.gt_tracker import Frame

        cam = make_fisheye()
        fe = SlamFrontend(cam, sensor="rgbd")
        rng = np.random.RandomState(2)
        img = rng.rand(3, cam.height, cam.width).astype(np.float32)
        depth = np.full((cam.height, cam.width), 2.0, np.float32)
        fr = Frame(image=img, quat_wxyz=np.array([1.0, 0, 0, 0]),
                   trans=np.zeros(3), depth=depth)
        rect = fe._rectify_frame(fr)
        assert rect.raw_image is img
        assert rect.image.shape == img.shape
        assert not np.allclose(rect.image, img)  # actually remapped
        assert rect.depth.shape == depth.shape

    def test_pinhole_frame_passthrough(self):
        from photo_slam_tpu.tracking.frontend import SlamFrontend
        from photo_slam_tpu.tracking.gt_tracker import Frame

        cam = Camera(camera_id=0, model_id=PINHOLE, width=64, height=48,
                     fx=40.0, fy=40.0, cx=31.5, cy=23.5)
        fe = SlamFrontend(cam, sensor="rgbd")
        img = np.zeros((3, 48, 64), np.float32)
        fr = Frame(image=img, quat_wxyz=np.array([1.0, 0, 0, 0]),
                   trans=np.zeros(3))
        assert fe._rectify_frame(fr) is fr
