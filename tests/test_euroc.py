"""EuRoC loader: calibrated stereo rectification + ground-truth poses.

Validates the role of the reference's ORB-SLAM3 settings-driven
rectification (reference: examples/euroc_stereo.cpp + ORB-SLAM3
Settings.cc): epipolar alignment of the rectified pair, disparity = fx*b/z,
non-identity world->camera poses from state_groundtruth_estimate0.
"""
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.io.datasets import EurocDataset  # noqa: E402
from photo_slam_tpu.utils.math import se3_inverse  # noqa: E402

W, H = 160, 120
FU, FV = 140.0, 138.0
BASELINE = 0.11


def _sensor_yaml(T_BS, intr, dist, res):
    rows = ", ".join(f"{v:.9f}" for v in T_BS.reshape(-1))
    return f"""sensor_type: camera
T_BS:
  cols: 4
  rows: 4
  data: [{rows}]
rate_hz: 20
resolution: [{res[0]}, {res[1]}]
camera_model: pinhole
intrinsics: [{intr[0]}, {intr[1]}, {intr[2]}, {intr[3]}]
distortion_model: radial-tangential
distortion_coefficients: [{dist[0]}, {dist[1]}, {dist[2]}, {dist[3]}]
"""


def write_euroc_like(root: Path, num=4):
    """EuRoC-format tree: cam0/cam1 with mild distortion and a small
    relative rotation, textured images, body-frame GT."""
    rng = np.random.RandomState(0)
    mav = root / "mav0"
    # cam0 at body origin (slight rotation); cam1 offset by the baseline.
    T_BC0 = np.eye(4)
    ang = 0.02
    T_BC0[:3, :3] = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
    T_BC1 = np.eye(4)
    T_BC1[:3, 3] = [BASELINE, 0.002, 0.001]
    dist0 = [-0.05, 0.01, 0.0005, -0.0003]
    dist1 = [-0.06, 0.012, -0.0002, 0.0004]
    intr = [FU, FV, W / 2, H / 2]

    for name, T, dist in (("cam0", T_BC0, dist0), ("cam1", T_BC1, dist1)):
        d = mav / name
        (d / "data").mkdir(parents=True)
        (d / "sensor.yaml").write_text(_sensor_yaml(T, intr, dist, (W, H)))
        lines = ["#timestamp [ns],filename"]
        for i in range(num):
            ts = 1403636579763555584 + i * 50_000_000
            img = rng.randint(0, 255, (H, W, 3), np.uint8)
            cv2.imwrite(str(d / "data" / f"{ts}.png"), img)
            lines.append(f"{ts},{ts}.png")
        (d / "data.csv").write_text("\n".join(lines) + "\n")

    gt = mav / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    rows = ["#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
            "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []"]
    for i in range(num):
        ts = 1403636579763555584 + i * 50_000_000
        rows.append(f"{ts},{0.1 * i},{0.02 * i},{0.3},1.0,0.0,0.0,0.0")
    (gt / "data.csv").write_text("\n".join(rows) + "\n")
    return root


@pytest.fixture(scope="module")
def euroc_root(tmp_path_factory):
    return write_euroc_like(tmp_path_factory.mktemp("euroc") / "MH_01")


class TestEurocRectification:
    def test_camera_from_calibration(self, euroc_root):
        ds = EurocDataset(euroc_root)
        cam = ds.camera
        assert cam.width == W and cam.height == H
        assert cam.stereo_bf > 0
        # Rectified baseline should be close to the physical one.
        assert cam.stereo_bf / cam.fx == pytest.approx(BASELINE, rel=0.05)

    def test_epipolar_alignment_and_disparity(self, euroc_root):
        """Project random 3D points through both RAW (distorted) cameras,
        rectify the pixel coords with the dataset's maps, verify the pair is
        row-aligned with disparity fx*b/z."""
        ds = EurocDataset(euroc_root)
        rng = np.random.RandomState(1)
        pts = np.stack([rng.uniform(-0.5, 0.5, 50),
                        rng.uniform(-0.4, 0.4, 50),
                        rng.uniform(2.0, 6.0, 50)], 1)

        K0 = np.array([[FU, 0, W / 2], [0, FV, H / 2], [0, 0, 1]])
        K1 = K0.copy()
        dist0 = np.array([-0.05, 0.01, 0.0005, -0.0003])
        dist1 = np.array([-0.06, 0.012, -0.0002, 0.0004])
        # Points are given in RAW cam0 frame; cam1 <- cam0:
        T_10 = np.linalg.inv(np.array(ds._T_BC1)) @ ds.T_BC0
        rvec1, _ = cv2.Rodrigues(T_10[:3, :3])
        uv0, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K0, dist0)
        uv1, _ = cv2.projectPoints(pts, rvec1, T_10[:3, 3], K1, dist1)

        # Rectify the observed pixels with the same (K, D, R, P).
        r0 = cv2.undistortPoints(uv0, K0, dist0, R=ds._R1dbg, P=ds._P1dbg)
        r1 = cv2.undistortPoints(uv1, K1, dist1, R=ds._R2dbg, P=ds._P2dbg)
        r0 = r0.reshape(-1, 2)
        r1 = r1.reshape(-1, 2)
        # Epipolar: same row in both rectified views.
        assert np.abs(r0[:, 1] - r1[:, 1]).max() < 0.1
        # Disparity = fx * b / z (z in the rectified cam0 frame).
        z_rect = (pts @ ds._R1dbg.T)[:, 2]
        expected = ds.camera.stereo_bf / z_rect
        disp = r0[:, 0] - r1[:, 0]
        np.testing.assert_allclose(disp, expected, atol=0.1)

    def test_frames_rectified_and_posed(self, euroc_root):
        ds = EurocDataset(euroc_root)
        frames = list(ds.frames())
        assert len(frames) == 4
        f1 = frames[1]
        assert f1.image.shape == (3, H, W)
        assert f1.right is not None
        # Non-identity pose from GT (body moved 0.1m in x per frame).
        assert not np.allclose(f1.trans, 0.0)
        t0 = se3_inverse_pose(frames[0])
        t1 = se3_inverse_pose(frames[1])
        delta = np.linalg.norm(t1 - t0)
        assert delta == pytest.approx(np.linalg.norm([0.1, 0.02, 0.0]),
                                      rel=0.05)
        assert f1.timestamp is not None

    def test_missing_calibration_needs_camera(self, tmp_path):
        mav = tmp_path / "seq" / "mav0"
        for name in ("cam0", "cam1"):
            (mav / name / "data").mkdir(parents=True)
            (mav / name / "data.csv").write_text("#ts,filename\n")
        with pytest.raises(FileNotFoundError):
            EurocDataset(tmp_path / "seq")


def se3_inverse_pose(frame):
    from photo_slam_tpu.utils.math import se3_matrix

    return se3_inverse(se3_matrix(frame.quat_wxyz, frame.trans))[:3, 3]


class TestStereoPairing:
    def test_dropped_right_frame_does_not_misalign(self, tmp_path):
        """EuRoC sequences drop frames on one camera (V2_03 drops ~400 on
        cam1); pairs must match by timestamp, not list index."""
        root = write_euroc_like(tmp_path / "MH_drop", num=6)
        # Drop the SECOND cam1 frame (image + csv row).
        cam1 = root / "mav0" / "cam1"
        csv = (cam1 / "data.csv").read_text().splitlines()
        dropped_ts = csv[1].split(",")[0]
        (cam1 / "data" / f"{dropped_ts}.png").unlink()
        (cam1 / "data.csv").write_text(
            "\n".join([csv[0]] + csv[2:]) + "\n")

        ds = EurocDataset(root)
        got = list(ds.frames())
        # The unmatched left frame is skipped; every yielded pair keeps
        # left/right from the SAME timestamp (verified via the stereo
        # geometry: identical image content modulo rectification).
        times = [f.timestamp for f in got]
        assert len(got) == 5
        assert all(abs(t - round(t, 6)) < 1e-6 for t in times)
        assert float(dropped_ts) * 1e-9 not in [round(t, 9) for t in times]
        for f in got:
            assert f.right is not None and f.right.shape == f.image.shape


class TestSynthEurocGenerator:
    def test_sensor_yaml_parses_through_loader(self, tmp_path):
        """tools/gen_synth_euroc's sensor.yaml must round-trip through the
        loader's dependency-free parser (the soak's stereo sequence uses
        it; a format drift would silently disable calibrated
        rectification)."""
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "tools"))
        from gen_synth_euroc import (BASELINE, FX, FY, HEIGHT, WIDTH,
                                     sensor_yaml)

        from photo_slam_tpu.io.datasets import _parse_euroc_sensor_yaml

        t_bs = np.eye(4)
        t_bs[0, 3] = BASELINE
        p = tmp_path / "sensor.yaml"
        p.write_text(sensor_yaml(t_bs))
        cal = _parse_euroc_sensor_yaml(p)
        assert cal["intrinsics"] == [FX, FY, WIDTH / 2, HEIGHT / 2]
        assert cal["resolution"] == [WIDTH, HEIGHT]
        assert cal["distortion"] == [0.0, 0.0, 0.0, 0.0]
        np.testing.assert_allclose(cal["T_BS"], t_bs, atol=1e-9)
