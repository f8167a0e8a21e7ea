"""Web viewer server: endpoints against a live (small) mapper."""
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType
from photo_slam_tpu.models.camera import PINHOLE, Camera
from photo_slam_tpu.viewer.server import ViewerServer


@pytest.fixture(scope="module")
def viewer():
    cfg = Config()
    cfg.renderer.initial_capacity = 256
    cam = Camera(camera_id=0, model_id=PINHOLE, width=64, height=48,
                 fx=60.0, fy=60.0, cx=32, cy=24)
    mapper = GaussianMapper(cfg, SensorType.RGBD)
    mapper.add_camera(cam)
    rng = np.random.RandomState(0)
    pts = (rng.randn(50, 3) * 0.5 + [0, 0, 5]).astype(np.float32)
    mapper.trainer.initialize_map(pts, rng.rand(50, 3).astype(np.float32))
    mapper.initial_mapped = True
    srv = ViewerServer(mapper, port=0, width=64, height=48)
    srv.start()
    yield srv, mapper
    srv.stop()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}",
                                timeout=30) as r:
        return r.status, r.read(), r.headers.get("Content-Type")


class TestViewer:
    def test_index_page(self, viewer):
        srv, _ = viewer
        code, body, ctype = _get(srv, "/")
        assert code == 200 and b"photo_slam_tpu" in body
        assert "text/html" in ctype

    def test_status(self, viewer):
        srv, _ = viewer
        code, body, _ = _get(srv, "/status")
        s = json.loads(body)
        assert code == 200
        assert "iteration" in s and "num_gaussians" in s

    def test_render_endpoint(self, viewer):
        srv, _ = viewer
        code, body, ctype = _get(
            srv, "/render?qw=1&qx=0&qy=0&qz=0&tx=0&ty=0&tz=0&w=64&h=48")
        assert code == 200
        assert ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_render_size_ladder_crop(self, viewer):
        """Arbitrary sizes are served by ladder-render + center crop — the
        returned PNG must match the requested dimensions exactly."""
        srv, _ = viewer
        import io

        code, body, ctype = _get(
            srv, "/render?qw=1&qx=0&qy=0&qz=0&tx=0&ty=0&tz=0&w=100&h=70")
        assert code == 200 and ctype == "image/png"
        try:
            from PIL import Image
            im = Image.open(io.BytesIO(body))
            assert im.size == (100, 70)
        except ImportError:
            pass

    def test_map_endpoint(self, viewer):
        """Map geometry for the overlay (the reference's ImGuiMapDrawer
        data: keyframes, points, covisibility edges)."""
        srv, mapper = viewer
        from photo_slam_tpu.models.keyframe import Keyframe

        # Give the scene two keyframes so frusta + an edge exist.
        cam = mapper.scene.cameras[0]
        for fid in (0, 1):
            kf = Keyframe(fid=fid, camera=cam)
            kf.set_pose(np.array([1.0, 0, 0, 0]),
                        np.array([0.1 * fid, 0, 0]))
            mapper.scene.add_keyframe(kf)
        mapper._sparse_log_pts = [np.random.rand(20, 3).astype(np.float32)]
        mapper._sparse_log_cols = [np.random.rand(20, 3).astype(np.float32)]
        code, body, _ = _get(srv, "/map")
        m = json.loads(body)
        assert code == 200
        assert len(m["keyframes"]) == 2
        assert len(m["keyframes"][0]["twc"]) == 3  # 3x4 camera-to-world
        assert len(m["points"]) == 20
        assert len(m["colors"]) == 20
        assert m["edges"] == [[0, 1]]
        assert m["fovx"] > 0

    def test_frame_endpoint(self, viewer):
        """SLAM-frame panel: 404 with no tracker, a keypoint-annotated PNG
        once a frontend has published last_frame_vis (the reference's
        SLAM-frame view, imgui_viewer.cpp:341-360)."""
        srv, _ = viewer
        try:
            _get(srv, "/frame")
            assert False, "expected 404 with no frontend"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        class FakeFrontend:
            last_frame_vis = (np.random.RandomState(0)
                              .rand(3, 48, 64).astype(np.float32),
                              np.array([[10.0, 20.0], [30.0, 8.0]]))

        srv.frontend = FakeFrontend()
        try:
            code, body, ctype = _get(srv, "/frame")
            assert code == 200 and ctype == "image/png"
            assert body[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            srv.frontend = None

    def test_map_endpoint_with_mutating_frontend(self, viewer):
        """map_geometry must tolerate a tracker mutating its map between
        reads (the live-threaded case): simulate with a map whose _n grows
        after the first read."""
        srv, _ = viewer
        from photo_slam_tpu.tracking.local_map import LocalMap

        lm = LocalMap()
        lm.add_points(np.random.rand(7, 3),
                      np.zeros((7, 32), np.uint8),
                      np.random.rand(7, 3).astype(np.float32), first_kf=0)

        class FE:
            map = lm

        srv.frontend = FE()
        try:
            code, body, _ = _get(srv, "/map")
            m = json.loads(body)
            assert code == 200 and len(m["points"]) == 7
        finally:
            srv.frontend = None

    def test_params_roundtrip(self, viewer):
        srv, mapper = viewer
        code, body, _ = _get(srv, "/params")
        params = json.loads(body)
        assert "lambda_dssim" in params
        params["lambda_dssim"] = 0.33
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/params",
            data=json.dumps(params).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
        assert mapper.cfg.opt.lambda_dssim == pytest.approx(0.33)

    def test_stop(self, viewer):
        srv, mapper = viewer
        req = urllib.request.Request(f"http://127.0.0.1:{srv.port}/stop",
                                     data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
        assert mapper.stopped
