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


def _imu_yaml(T_BS):
    rows = ", ".join(f"{v:.9f}" for v in T_BS.reshape(-1))
    return f"""sensor_type: imu
T_BS:
  cols: 4
  rows: 4
  data: [{rows}]
rate_hz: 200
gyroscope_noise_density: 1.6968e-04
gyroscope_random_walk: 1.9393e-05
accelerometer_noise_density: 2.0e-3
accelerometer_random_walk: 3.0e-3
"""


def write_euroc_like(root: Path, num=4, imu=False):
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

    if imu:
        # imu0 channel at 200 Hz spanning the camera window (EuRoC column
        # order: timestamp, w_xyz, a_xyz).
        d = mav / "imu0"
        d.mkdir(parents=True)
        (d / "sensor.yaml").write_text(_imu_yaml(np.eye(4)))
        t_first = 1403636579763555584 - 50_000_000
        t_last = 1403636579763555584 + num * 50_000_000
        lines = ["#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
                 "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
                 "a_RS_S_z [m s^-2]"]
        k = 0
        ts = t_first
        while ts <= t_last:
            lines.append(f"{ts},{0.001 * k},{-0.002 * k},{0.0005 * k},"
                         f"{0.01 * k},{9.81},{0.02 * k}")
            ts += 5_000_000
            k += 1
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


class TestEurocImuChannel:
    def test_imu_loaded_and_frames_carry_spans(self, tmp_path):
        """mav0/imu0 loads into (stamps, gyro, acc) + an ImuCalib whose Tbc
        maps RECTIFIED cam0 into the body frame, and frames() attaches the
        per-frame measurement span the frontend preintegrates (the
        vImuMeas handoff of the reference mains,
        ORB-SLAM3/Examples/.../mono_inertial_euroc.cc LoadIMU)."""
        root = write_euroc_like(tmp_path / "MH_imu", num=4, imu=True)
        ds = EurocDataset(root)
        assert ds.imu_stamps is not None and len(ds.imu_stamps) > 30
        assert ds.imu_gyro.shape == ds.imu_acc.shape \
            == (len(ds.imu_stamps), 3)
        # Column order: gravity sits in a_y of the fixture.
        assert np.allclose(ds.imu_acc[:, 1], 9.81)
        cal = ds.imu_calib
        assert cal.freq == 200.0
        assert cal.noise_gyro == pytest.approx(1.6968e-4)
        assert cal.walk_acc == pytest.approx(3.0e-3)
        # T_BS(imu)=I: Tbc composes camera extrinsics with the rectifying
        # rotation, Tbc = T_BC0 @ diag(R1^T).
        R1h = np.eye(4)
        R1h[:3, :3] = ds.R1.T
        np.testing.assert_allclose(cal.Tbc, ds.T_BC0 @ R1h, atol=1e-9)

        frames = list(ds.frames())
        assert frames[0].imu is None          # nothing before frame 0
        t_prev = frames[0].timestamp
        for fr in frames[1:]:
            stamps, acc, gyro = fr.imu
            assert len(stamps) >= 9           # 200 Hz over 50 ms + boundary
            assert acc.shape == (len(stamps), 3)
            # Span covers (prev, t]: last sample at/before the frame, and
            # at most one boundary sample before prev (integrate_span
            # clips it to the exact boundary).
            assert stamps[-1] <= fr.timestamp + 1e-9
            assert stamps[0] >= t_prev - (0.5 / 200.0) - 1e-9
            assert stamps[1] > t_prev - 1e-9
            t_prev = fr.timestamp

    def test_app_imu_flag_requires_channel(self, euroc_root):
        """--imu on a dataset without mav0/imu0 must fail loudly."""
        from photo_slam_tpu.apps.online_slam import _make_tracker
        from photo_slam_tpu.mapper.mapper import SensorType
        ds = EurocDataset(euroc_root)
        with pytest.raises(ValueError, match="no IMU"):
            _make_tracker("slam", ds, SensorType.STEREO, 5, 400,
                          use_imu=True)


class TestSynthEurocGenerator:
    def test_imu_stream_consistent_with_trajectory(self, tmp_path):
        """The generator's 200 Hz IMU channel must be dynamically exact:
        preintegrating it between two frame times and dead-reckoning from
        the GT state must land on the GT pose (this is what makes `--imu`
        runs on the synthetic sequence meaningful)."""
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "tools"))
        from gen_synth_euroc import trajectory, write_imu

        from photo_slam_tpu.tracking.imu import GRAVITY, Preintegrated

        num = 40
        pose_of_time = trajectory(num)
        mav = tmp_path / "mav0"
        mav.mkdir()
        write_imu(mav, num, pose_of_time)
        rows = [r for r in (mav / "imu0" / "data.csv").read_text()
                .splitlines() if not r.startswith("#")]
        arr = np.array([[float(v) for v in r.split(",")] for r in rows])
        assert len(arr) >= 200 * (num - 1) / 20
        stamps = (arr[:, 0] - arr[0, 0]) * 1e-9
        gyros, accs = arr[:, 1:4], arr[:, 4:7]

        # Numeric GT velocity at t0 (central difference). The window stays
        # inside the outbound half: the yaw-rate sign flip at the
        # turn-around (t = half/20) is smeared over one 5 ms IMU sample
        # (~0.0055 rad), which is physical for a held-rate gyro.
        t0, t1, h = 0.1, 0.9, 1e-4
        _, c_m = pose_of_time(t0 - h)
        _, c_p = pose_of_time(t0 + h)
        v0 = (c_p - c_m) / (2 * h)
        R0, p0 = pose_of_time(t0)
        R1, p1 = pose_of_time(t1)
        pre = Preintegrated()
        pre.integrate_span(stamps, accs, gyros, t0, t1)
        R2, _v2, p2 = pre.predict(R0.T, v0, p0)
        from photo_slam_tpu.tracking.imu import so3_log
        assert np.linalg.norm(so3_log(R2.T @ R1.T)) < 5e-3
        assert np.linalg.norm(p2 - p1) < 5e-3
        assert abs(pre.dT - (t1 - t0)) < 1e-6

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
