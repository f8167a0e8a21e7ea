"""Dataset loaders + app entry points on synthetic on-disk sequences."""
import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render

W, H, F = 64, 48, 60.0
PLANE_Z = 5.0


def write_replica_like(root: Path, num=6):
    """Synthesize a Replica-format sequence (results/frame*, depth*, traj.txt)
    at small resolution, with GT camera-to-world matrices."""
    import cv2

    rng = np.random.RandomState(0)
    n = 300
    span_x = PLANE_Z * W / (2 * F) * 1.8
    span_y = PLANE_Z * H / (2 * F) * 1.8
    pts = np.stack([rng.uniform(-span_x, span_x, n),
                    rng.uniform(-span_y, span_y, n),
                    np.full(n, PLANE_Z)], 1).astype(np.float32)
    scales = np.full((n, 3), 0.12, np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.6, 0.95, n).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)

    results = root / "results"
    results.mkdir(parents=True)
    fovx = 2 * np.arctan(W / (2 * F))
    fovy = 2 * np.arctan(H / (2 * F))
    settings = RenderSettings(width=W, height=H,
                              tan_fovx=np.tan(fovx / 2),
                              tan_fovy=np.tan(fovy / 2))
    traj = []
    from photo_slam_tpu.io.datasets import REPLICA_DEPTH_SCALE
    for i in range(num):
        t = np.array([0.08 * (i - num / 2), 0.0, 0.0])
        mats = build_camera_matrices(np.eye(3), t, 0.01, 100.0, fovx, fovy)
        res = render(jnp.asarray(pts), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), mats, settings,
                     jnp.zeros(3), colors_precomp=jnp.asarray(cols))
        img = (np.clip(np.transpose(np.asarray(res.image), (1, 2, 0)), 0, 1)
               * 255).astype(np.uint8)
        cv2.imwrite(str(results / f"frame{i:06d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        depth = np.full((H, W), PLANE_Z * REPLICA_DEPTH_SCALE, np.uint16)
        cv2.imwrite(str(results / f"depth{i:06d}.png"), depth)
        # traj.txt rows: camera-to-world 4x4 row-major
        c2w = np.eye(4)
        c2w[:3, 3] = -t  # R=I: Twc = inv(Tcw)
        traj.append(c2w.reshape(-1))
    np.savetxt(root / "traj.txt", np.stack(traj))
    return root


@pytest.fixture(scope="module")
def replica_root(tmp_path_factory):
    return write_replica_like(tmp_path_factory.mktemp("replica") / "room0")


class TestReplicaLoader:
    def test_loads_frames_and_poses(self, replica_root):
        from photo_slam_tpu.io.datasets import ReplicaDataset
        ds = ReplicaDataset(replica_root)
        # Override the hard-coded Replica camera with the test-size one.
        from photo_slam_tpu.models.camera import PINHOLE, Camera
        ds.camera = Camera(camera_id=0, model_id=PINHOLE, width=W, height=H,
                           fx=F, fy=F, cx=W / 2, cy=H / 2)
        frames = list(ds.frames())
        assert len(frames) == 6
        f = frames[0]
        assert f.image.shape == (3, H, W)
        assert f.depth.shape == (H, W)
        np.testing.assert_allclose(f.depth, PLANE_Z, atol=1e-3)
        # GT pose round-trip: world->camera trans = +0.08*(0-3) on x.
        np.testing.assert_allclose(f.trans, [0.08 * (0 - 3), 0, 0], atol=1e-6)

    def test_tum_association(self, tmp_path):
        from photo_slam_tpu.io.datasets import _associate, _read_tum_list
        (tmp_path / "rgb.txt").write_text(
            "# comment\n1.00 rgb/a.png\n1.05 rgb/b.png\n")
        (tmp_path / "depth.txt").write_text(
            "1.01 depth/a.png\n1.06 depth/b.png\n")
        rgb = _read_tum_list(tmp_path / "rgb.txt")
        depth = _read_tum_list(tmp_path / "depth.txt")
        assoc = _associate(rgb, depth)
        assert len(assoc) == 2
        assert assoc[0][3][0] == "depth/a.png"


@pytest.fixture(scope="module")
def app_run(replica_root, tmp_path_factory):
    from photo_slam_tpu.apps import online_slam
    from photo_slam_tpu.io import datasets as ds_mod

    tmp_path = tmp_path_factory.mktemp("app")
    # Patch the Replica intrinsics to the test-sized sequence.
    old = ds_mod.REPLICA_CAMERA
    ds_mod.REPLICA_CAMERA = dict(fx=F, fy=F, cx=W / 2, cy=H / 2,
                                 width=W, height=H)
    try:
        out = tmp_path / "out"
        import photo_slam_tpu.config as cfgm
        cfg = cfgm.Config()
        cfg.renderer.initial_capacity = 1024
        cfg.mapper.min_num_initial_map_kfs = 3
        cfg.mapper.do_gaus_pyramid_training = False
        cfg.opt.densify_from_iter = 1000  # off for speed
        ds = ds_mod.ReplicaDataset(replica_root)
        # GT frontend: the 64x48 synthetic frames are too small for ORB
        # tracking; the feature frontend has its own tests
        # (tests/test_frontend.py) on trackable synthetic sequences.
        mapper = online_slam.run_online(
            ds, online_slam.SensorType.RGBD, cfg, out,
            keyframe_every=1, num_keypoints=150, max_iterations=40,
            threaded=True, frontend="gt")
    finally:
        ds_mod.REPLICA_CAMERA = old
    return mapper, out


class TestApps:
    def test_replica_rgbd_app(self, app_run):
        mapper, out = app_run
        assert mapper.trainer.iteration >= 39
        assert (out / "CameraTrajectory_TUM.txt").exists()
        assert (out / "run_summary.json").exists()
        summary = json.loads((out / "run_summary.json").read_text())
        assert summary["num_keyframes"] == 6
        plys = list((out / "point_cloud").rglob("point_cloud.ply"))
        assert len(plys) == 1

    def test_trajectory_format(self, app_run):
        _, out = app_run
        lines = (out / "CameraTrajectory_TUM.txt").read_text().splitlines()
        assert len(lines) == 6
        assert len(lines[0].split()) == 8  # t tx ty tz qx qy qz qw

    def test_view_result_app(self, app_run, tmp_path):
        _, app_out = app_run
        ply = next((app_out / "point_cloud").rglob("point_cloud.ply"))
        from photo_slam_tpu.apps.view_result import main as view_main
        out = tmp_path / "views"
        view_main(["--ply", str(ply), "--out", str(out),
                   "--width", str(W), "--height", str(H),
                   "--fx", str(F), "--fy", str(F), "--max-views", "2",
                   "--cameras", str(app_out / "cameras.json")])
        pngs = list(out.glob("*.png"))
        assert len(pngs) == 2
