"""Generate a synthetic EuRoC-format stereo sequence for end-to-end soaks.

Same hardened cylinder-room world and out-and-back loop trajectory as
gen_synth_replica, rendered from TWO horizontally-offset cameras and packaged
in the EuRoC MAV layout the loader expects (io/datasets.EurocDataset;
reference: examples/euroc_stereo.cpp):

  mav0/cam0/{data.csv, sensor.yaml, data/<ts>.png}   (left, grayscale)
  mav0/cam1/{data.csv, sensor.yaml, data/<ts>.png}   (right)
  mav0/imu0/{data.csv, sensor.yaml}                  (200 Hz, exact)
  mav0/state_groundtruth_estimate0/data.csv          (T_WB body poses)

The IMU channel is analytically exact (body rate from the pose derivative,
specific force = R_wb^T (a_w - g_w), central finite differences of the same
continuous-time trajectory the frames sample), so `--imu` runs of
apps.online_slam euroc_stereo exercise the full visual-inertial path
(preintegration -> init -> gravity alignment) against known ground truth.

The cameras are ideal pinholes (zero distortion) with a pure x baseline, so
the loader's calibrated cv2.stereoRectify path runs for real but resolves to
a near-identity rectification — the stereo frontend (SGBM disparity, depth
residual local BA) is exercised end to end. Frames carry the same sensor
model as the RGBD soak (exposure drift, shot noise, motion blur), with
INDEPENDENT shot noise per eye, like two physical sensors; pass --clean for
raw renders.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/gen_synth_euroc.py \
           <out_dir> [num_frames] [--clean]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gen_synth_replica import CYL_R, cylinder_world  # noqa: E402

WIDTH, HEIGHT = 752, 480
FX = FY = 458.0
CX, CY = 376.0, 240.0  # centered principal (ideal synthetic pinholes)
BASELINE = 0.11  # meters, cam1 at +x of cam0 (EuRoC-like)
T0_NS = 1_400_000_000_000_000_000  # EuRoC-era epoch
DT_NS = 50_000_000  # 20 Hz


def sensor_yaml(t_bs: np.ndarray) -> str:
    rows = ", ".join(f"{v:.9f}" for v in t_bs.reshape(-1))
    return (
        "sensor_type: camera\n"
        "T_BS:\n"
        "  cols: 4\n"
        "  rows: 4\n"
        f"  data: [{rows}]\n"
        "rate_hz: 20\n"
        f"resolution: [{WIDTH}, {HEIGHT}]\n"
        "camera_model: pinhole\n"
        f"intrinsics: [{FX}, {FY}, {CX}, {CY}]\n"
        "distortion_model: radial-tangential\n"
        "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
    )


def trajectory(num: int, yaw_max: float = 1.1):
    """Continuous-time out-and-back trajectory (t in seconds; the 20 Hz
    frames sample it at t = i/20). Returns pose_of_time(t) -> (R_cw, c_w)."""
    half = max(num // 2, 1)

    def pose_of_time(t: float):
        x = t * 20.0
        f = x / half
        yaw = yaw_max * (f if x < half else max(2.0 - f, 0.0))
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy_, 0, -sy_], [0, 1, 0], [sy_, 0, cy_]])
        c = np.array([0.25 * np.sin(2 * np.pi * x / num),
                      0.05 * np.sin(4 * np.pi * x / num),
                      0.25 * np.cos(2 * np.pi * x / num) - 0.25])
        return R, c

    return pose_of_time


def imu_yaml() -> str:
    rows = ", ".join(f"{v:.1f}" for v in np.eye(4).reshape(-1))
    return (
        "sensor_type: imu\n"
        "T_BS:\n"
        "  cols: 4\n"
        "  rows: 4\n"
        f"  data: [{rows}]\n"
        "rate_hz: 200\n"
        "gyroscope_noise_density: 1.6968e-04\n"
        "gyroscope_random_walk: 1.9393e-05\n"
        "accelerometer_noise_density: 2.0000e-3\n"
        "accelerometer_random_walk: 3.0000e-3\n"
    )


def write_imu(mav, num: int, pose_of_time) -> None:
    """200 Hz exact IMU stream over the whole camera window: body angular
    rate from Log(R_wb(t)^T R_wb(t+h))/h, specific force R_wb^T (a_w - g_w)
    with a_w the central second difference of the body center — all from
    the SAME continuous-time trajectory the frames sample."""
    from photo_slam_tpu.tracking.imu import GRAVITY, so3_log

    g_w = np.array([0.0, 0.0, -GRAVITY])
    hz, h = 200.0, 1e-4
    t_end = (num - 1) / 20.0
    d = mav / "imu0"
    d.mkdir(parents=True, exist_ok=True)
    (d / "sensor.yaml").write_text(imu_yaml())
    lines = ["#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
             "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
             "a_RS_S_z [m s^-2]"]
    k = 0
    while k / hz <= t_end + 1e-9:
        t = k / hz
        # The preintegrator is first-order: it holds the sample over
        # [t, t+1/hz] and rotates accel by the START-of-interval
        # orientation. The exact held sample is therefore the MIDPOINT
        # world dynamics expressed with the START orientation:
        #   dv_world = dR(t) (R_wb(t)^T (a_w(mid) - g)) dt  (exact to 2nd
        # order), and the midpoint angular rate (midpoint rule on SO(3)).
        tm_ = t + 0.5 / hz
        R0, _ = pose_of_time(t)
        Rwb = R0.T
        Rm, cm = pose_of_time(tm_ - h)
        Rc, cc = pose_of_time(tm_)
        Rp, cp = pose_of_time(tm_ + h)
        # R_wb(tm-h)^T R_wb(tm+h) = R(tm-h) R(tm+h)^T over 2h (central).
        w_b = so3_log(Rm @ Rp.T) / (2.0 * h)
        a_w = (cm - 2.0 * cc + cp) / (h * h)
        acc = Rwb.T @ (a_w - g_w)
        ts = T0_NS + int(round(t * 1e9))
        lines.append(f"{ts},{w_b[0]:.9f},{w_b[1]:.9f},{w_b[2]:.9f},"
                     f"{acc[0]:.9f},{acc[1]:.9f},{acc[2]:.9f}")
        k += 1
    (d / "data.csv").write_text("\n".join(lines) + "\n")


def main():
    import cv2
    import jax.numpy as jnp

    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.render import RenderSettings, render

    from bench import corrupt_frame

    argv = [a for a in sys.argv[1:] if a != "--clean"]
    clean = "--clean" in sys.argv[1:]
    out = Path(argv[0] if len(argv) > 0 else "/tmp/synth_euroc")
    num = int(argv[1]) if len(argv) > 1 else 120

    fovx = 2 * np.arctan(WIDTH / (2 * FX))
    fovy = 2 * np.arctan(HEIGHT / (2 * FY))
    world = cylinder_world()
    pts, scales, quats, opac, cols = world
    settings = RenderSettings(width=WIDTH, height=HEIGHT,
                              tan_fovx=float(np.tan(fovx / 2)),
                              tan_fovy=float(np.tan(fovy / 2)),
                              max_per_tile=1024, max_tiles_per_gaussian=8,
                              mode="pallas")

    mav = out / "mav0"
    for cam in ("cam0", "cam1"):
        (mav / cam / "data").mkdir(parents=True, exist_ok=True)
    (mav / "state_groundtruth_estimate0").mkdir(parents=True, exist_ok=True)

    t_bs0 = np.eye(4)  # body == cam0
    t_bs1 = np.eye(4)
    t_bs1[0, 3] = BASELINE
    (mav / "cam0" / "sensor.yaml").write_text(sensor_yaml(t_bs0))
    (mav / "cam1" / "sensor.yaml").write_text(sensor_yaml(t_bs1))

    rng_l = np.random.RandomState(99)
    rng_r = np.random.RandomState(199)  # independent shot noise per eye
    cam_csv = ["#timestamp [ns],filename"]
    gt_csv = ["#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
              "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z []"]

    def render_gray(R, c_w, rng, i):
        t = -R @ c_w
        mats = build_camera_matrices(R, t, 0.01, 100.0, fovx, fovy)
        res = render(jnp.asarray(pts), jnp.asarray(scales),
                     jnp.asarray(quats), jnp.asarray(opac), mats, settings,
                     jnp.zeros(3), colors_precomp=jnp.asarray(cols))
        chw = np.asarray(res.image)
        if not clean:
            chw = corrupt_frame(chw, i, rng)
        gray = (0.299 * chw[0] + 0.587 * chw[1] + 0.114 * chw[2])
        return (np.clip(gray, 0, 1) * 255).astype(np.uint8)

    from photo_slam_tpu.utils.math import rotmat_to_quat

    pose_of_time = trajectory(num)
    write_imu(mav, num, pose_of_time)

    for i in range(num):
        R, c_w0 = pose_of_time(i / 20.0)
        # cam1 center: offset along cam0's +x axis expressed in world.
        c_w1 = c_w0 + R.T @ np.array([BASELINE, 0.0, 0.0])
        ts = T0_NS + i * DT_NS
        cv2.imwrite(str(mav / "cam0" / "data" / f"{ts}.png"),
                    render_gray(R, c_w0, rng_l, i))
        cv2.imwrite(str(mav / "cam1" / "data" / f"{ts}.png"),
                    render_gray(R, c_w1, rng_r, i))
        cam_csv.append(f"{ts},{ts}.png")
        # GT body pose (body == cam0): T_WB with R_WB = R^T, p = c_w0.
        q = np.asarray(rotmat_to_quat(jnp.asarray(R.T)))
        gt_csv.append(f"{ts},{c_w0[0]:.9f},{c_w0[1]:.9f},{c_w0[2]:.9f},"
                      f"{q[0]:.9f},{q[1]:.9f},{q[2]:.9f},{q[3]:.9f}")
        if i % 20 == 0:
            print(f"frame {i}/{num}", flush=True)

    for cam in ("cam0", "cam1"):
        (mav / cam / "data.csv").write_text("\n".join(cam_csv) + "\n")
    (mav / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_csv) + "\n")
    print(f"wrote {num} stereo pairs -> {out}", flush=True)


if __name__ == "__main__":
    main()
