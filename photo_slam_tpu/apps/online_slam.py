"""Shared online-SLAM app driver + per-dataset CLI entry points.

These mirror the reference example mains (reference: examples/replica_rgbd.cpp,
tum_rgbd.cpp, tum_mono.cpp, euroc_stereo.cpp): load a sequence, run the
tracker thread and the Gaussian mapper concurrently, save trajectories,
per-keyframe metrics and the final map.

The frontend here is the ground-truth-pose tracker (datasets ship GT
trajectories); a live feature-based tracker plugs in through the same
MappingOperation queue.
"""
from __future__ import annotations

import argparse
import json
import threading
import time
from pathlib import Path

import numpy as np

from photo_slam_tpu.config import Config, dataset_config, load_reference_yaml
from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType
from photo_slam_tpu.tracking.gt_tracker import GroundTruthTracker
from photo_slam_tpu.utils.math import se3_inverse, se3_matrix


def save_trajectory_tum(path, keyframes) -> None:
    """Camera trajectory in TUM format: t tx ty tz qx qy qz qw (camera-to-
    world), the format the reference's trajectory savers emit for evaluation
    (reference: ORB-SLAM3/src/System.cc SaveTrajectoryTUM)."""
    lines = []
    for fid, kf in sorted(keyframes.items()):
        twc = se3_inverse(se3_matrix(kf.quat, kf.trans))
        from photo_slam_tpu.utils.math import rotmat_to_quat_numpy
        q = rotmat_to_quat_numpy(twc[:3, :3])
        t = twc[:3, 3]
        lines.append(f"{fid} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                     f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")


def _make_tracker(frontend: str, dataset, sensor: SensorType,
                  keyframe_every: int, num_keypoints: int,
                  async_mapping: bool = True, use_imu: bool = False):
    if frontend == "gt":
        return GroundTruthTracker(dataset.camera,
                                  keyframe_every=keyframe_every,
                                  num_keypoints=num_keypoints)
    if frontend == "vo":
        from photo_slam_tpu.tracking.vo_tracker import OrbVoTracker
        return OrbVoTracker(dataset.camera)
    from photo_slam_tpu.tracking.frontend import SlamFrontend
    sensor_name = {SensorType.MONOCULAR: "mono", SensorType.STEREO: "stereo",
                   SensorType.RGBD: "rgbd"}[sensor]
    imu_calib = getattr(dataset, "imu_calib", None)
    if use_imu and imu_calib is None:
        raise ValueError("--imu requested but the dataset has no IMU "
                         "channel/calibration (expected mav0/imu0)")
    return SlamFrontend(dataset.camera, sensor=sensor_name,
                        num_features=max(num_keypoints, 1000),
                        async_local_mapping=async_mapping,
                        use_imu=use_imu, imu_calib=imu_calib)


def run_online(dataset, sensor: SensorType, cfg: Config, out_dir,
               keyframe_every: int = 10, num_keypoints: int = 800,
               max_iterations=None, threaded: bool = True,
               frontend: str = "slam", viewer: bool = False,
               viewer_port: int = 8090, batch: int = 1,
               async_mapping: bool = True,
               use_imu: bool = False) -> GaussianMapper:
    """Drive a sequence through tracker + mapper (reference:
    examples/replica_rgbd.cpp main). `frontend` selects the tracking stack:
    "slam" (full feature frontend: local map + local BA + loop closing),
    "vo" (plain ORB+PnP odometry), or "gt" (dataset ground-truth poses)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    mapper = GaussianMapper(cfg, sensor, result_dir=out)
    mapper.add_camera(dataset.camera)
    tracker = _make_tracker(frontend, dataset, sensor, keyframe_every,
                            num_keypoints, async_mapping=async_mapping,
                            use_imu=use_imu)

    server = None
    if viewer:
        from photo_slam_tpu.viewer.server import ViewerServer
        server = ViewerServer(mapper, port=viewer_port)
        server.frontend = tracker
        server.start()
        print(f"[online_slam] viewer at http://127.0.0.1:{server.port}/")

    # Stream frames through the tracker while recording GT for ATE.
    gt_poses: list = []
    stamps: list = []

    def frames_with_gt():
        for i, fr in enumerate(dataset.frames()):
            gt_poses.append(se3_matrix(fr.quat_wxyz, fr.trans)
                            if fr.quat_wxyz is not None else None)
            stamps.append(fr.timestamp if fr.timestamp is not None
                          else float(i))
            yield fr

    t0 = time.time()
    if threaded:
        # Tracker runs in its own thread like the reference's main/tracking
        # thread vs the mapper thread (reference: examples/replica_rgbd.cpp:112).
        # A tracker crash must still flip `done`, or the mapper waits on the
        # queue forever; the exception is re-raised after join.
        tracker_error: list[BaseException] = []

        def run_tracker():
            try:
                tracker.run(frames_with_gt(), mapper.queue.push)
            except BaseException as e:  # noqa: BLE001
                tracker_error.append(e)
                tracker.done = True

        th = threading.Thread(target=run_tracker, daemon=True)
        th.start()
        mapper.run(is_tracker_done=lambda: tracker.done,
                   live_kf_ids=lambda: tracker.live_kf_ids,
                   max_iterations=max_iterations, batch=batch)
        th.join()
        if tracker_error:
            raise tracker_error[0]
    else:
        tracker.run(frames_with_gt(), mapper.queue.push)
        mapper.run(is_tracker_done=lambda: True,
                   live_kf_ids=lambda: tracker.live_kf_ids,
                   max_iterations=max_iterations, batch=batch)
    wall = time.time() - t0
    if server is not None:
        server.stop()

    # Trajectory outputs: the reference's 5-file set + ATE RMSE when the
    # tracker estimated poses and GT is available.
    from photo_slam_tpu.utils.trajectory import save_all_formats
    ate = None
    est_tcw = getattr(tracker, "trajectory", None)
    kf_stamps = []
    kf_tcw = []
    for fid, kf in sorted(mapper.scene.keyframes.items()):
        kf_stamps.append(float(fid))
        kf_tcw.append(se3_matrix(kf.quat, kf.trans))
    if est_tcw:
        n = min(len(est_tcw), len(stamps))
        save_all_formats(out, stamps[:n], est_tcw[:n], kf_stamps, kf_tcw)
        gts = [g for g, e in zip(gt_poses[:n], est_tcw[:n])
               if g is not None]
        ests = [e for g, e in zip(gt_poses[:n], est_tcw[:n])
                if g is not None]
        if len(gts) >= 3:
            from photo_slam_tpu.utils.evaluate import ate_rmse
            gt_pos = np.stack([se3_inverse(g)[:3, 3] for g in gts])
            est_pos = np.stack([se3_inverse(e)[:3, 3] for e in ests])
            try:
                ate = float(ate_rmse(est_pos, gt_pos))
            except Exception:
                ate = None
    else:
        # GT frontend: keyframe poses are the trajectory.
        save_all_formats(out, kf_stamps, kf_tcw, kf_stamps, kf_tcw)

    from photo_slam_tpu.utils.profiling import device_memory_stats
    # Per-frame tracking time + device-memory artifacts (reference:
    # examples/replica_rgbd.cpp:164-172 TrackingTime.txt, :235-249
    # GpuPeakUsageMB.txt).
    track_times = getattr(tracker, "track_times", [])
    if track_times:
        (out / "TrackingTime.txt").write_text(
            "\n".join(f"{t:.6f}" for t in track_times) + "\n")
    mem = device_memory_stats()
    peak = mem.get("peak_bytes_in_use") or mem.get("bytes_in_use")
    (out / "GpuPeakUsageMB.txt").write_text(
        f"{(peak or 0) / (1 << 20):.1f}\n")
    (out / "run_summary.json").write_text(json.dumps({
        "wall_seconds": wall,
        "frontend": frontend,
        "iterations": mapper.trainer.iteration,
        "iters_per_sec": mapper.trainer.iteration / max(wall, 1e-9),
        "num_keyframes": len(mapper.scene.keyframes),
        "num_gaussians": mapper.trainer.metrics.num_live,
        "ema_loss": mapper.trainer.ema_loss,
        "ate_rmse": ate,
        "loops_closed": getattr(tracker, "num_loops_closed", 0),
        "imu_initialized": getattr(tracker, "imu_initialized", None),
        "scale_refinements": getattr(tracker, "num_scale_refinements",
                                     None),
        "mean_tracking_ms": (1000.0 * float(np.mean(track_times))
                             if track_times else None),
        # GpuPeakUsageMB-equivalent (reference: examples/replica_rgbd.cpp:235)
        "device_memory": device_memory_stats(),
    }, indent=2))
    print(f"[online_slam] {mapper.trainer.iteration} iters, "
          f"{len(mapper.scene.keyframes)} kfs, "
          f"{mapper.trainer.metrics.num_live} gaussians, "
          f"ate={ate}, {wall:.1f}s -> {out}")
    if not mapper.scene.keyframes:
        # Tracking produced nothing — surface it as a failure instead of an
        # empty "successful" run (the feature frontend needs trackable
        # texture; --frontend gt always works on GT-pose datasets).
        raise SystemExit(
            "[online_slam] ERROR: no keyframes were produced; tracking "
            f"failed on every frame (frontend={frontend}). Check image "
            "texture/resolution or rerun with --frontend gt.")
    return mapper


def _common_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="sequence directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cfg", default=None, help="gaussian_mapper yaml")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--keyframe-every", type=int, default=10)
    ap.add_argument("--frontend", choices=("slam", "vo", "gt"),
                    default="slam",
                    help="tracking stack: full feature SLAM (default), "
                         "plain ORB+PnP odometry, or ground-truth poses")
    ap.add_argument("--viewer", action="store_true",
                    help="serve the live web viewer during the run "
                         "(reference examples launch their viewer thread, "
                         "examples/replica_rgbd.cpp:120)")
    ap.add_argument("--viewer-port", type=int, default=8090)
    ap.add_argument("--batch", type=int, default=1,
                    help="multi-view batched training: B keyframes per "
                         "optimization step (shards over a device mesh)")
    ap.add_argument("--imu", action="store_true",
                    help="visual-inertial tracking (IMU_MONOCULAR / "
                         "IMU_STEREO roles): preintegrate the dataset's "
                         "IMU channel and run the visual-inertial "
                         "initialization (scale + gravity + biases; "
                         "reference: ORB-SLAM3 LocalMapping::InitializeIMU)."
                         " Requires a dataset with an IMU channel (EuRoC "
                         "mav0/imu0) and frontend=slam")
    ap.add_argument("--async-mapping", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="run the SLAM frontend's local mapping (cull + "
                         "local BA + loop verification) on its own thread, "
                         "the reference's LocalMapping-thread architecture "
                         "(ORB-SLAM3/src/System.cc:194-213); "
                         "--no-async-mapping keeps it on the tracking "
                         "thread")
    return ap


def replica_rgbd(argv=None):
    from photo_slam_tpu.io.datasets import ReplicaDataset
    args = _common_parser().parse_args(argv)
    cfg = (load_reference_yaml(args.cfg) if args.cfg
           else dataset_config("replica_rgbd"))
    ds = ReplicaDataset(args.data)
    return run_online(ds, SensorType.RGBD, cfg, args.out,
                      keyframe_every=args.keyframe_every,
                      max_iterations=args.iters, frontend=args.frontend,
                      viewer=args.viewer, viewer_port=args.viewer_port,
                      batch=args.batch, async_mapping=args.async_mapping,
                      use_imu=args.imu)


def replica_mono(argv=None):
    from photo_slam_tpu.io.datasets import ReplicaDataset
    args = _common_parser().parse_args(argv)
    cfg = (load_reference_yaml(args.cfg) if args.cfg
           else dataset_config("replica_mono"))
    ds = ReplicaDataset(args.data,
                        load_depth_maps=(args.frontend == "gt"))
    # Monocular: the tracker still triangulates sparse keypoints (from GT
    # depth, standing in for ORB triangulation) but the mapper runs the
    # monocular densification path.
    return run_online(ds, SensorType.MONOCULAR, cfg, args.out,
                      keyframe_every=args.keyframe_every,
                      max_iterations=args.iters, frontend=args.frontend,
                      viewer=args.viewer, viewer_port=args.viewer_port,
                      batch=args.batch, async_mapping=args.async_mapping,
                      use_imu=args.imu)


def tum_rgbd(argv=None):
    from photo_slam_tpu.io.datasets import TumDataset
    from photo_slam_tpu.models.camera import PINHOLE, Camera
    ap = _common_parser()
    ap.add_argument("--fx", type=float, default=517.3)
    ap.add_argument("--fy", type=float, default=516.5)
    ap.add_argument("--cx", type=float, default=318.6)
    ap.add_argument("--cy", type=float, default=255.3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args(argv)
    cfg = (load_reference_yaml(args.cfg) if args.cfg
           else dataset_config("tum_rgbd"))
    cam = Camera(camera_id=0, model_id=PINHOLE, width=args.width,
                 height=args.height, fx=args.fx, fy=args.fy, cx=args.cx,
                 cy=args.cy)
    ds = TumDataset(args.data, cam)
    return run_online(ds, SensorType.RGBD, cfg, args.out,
                      keyframe_every=args.keyframe_every,
                      max_iterations=args.iters, frontend=args.frontend,
                      viewer=args.viewer, viewer_port=args.viewer_port,
                      batch=args.batch, async_mapping=args.async_mapping,
                      use_imu=args.imu)


def tum_mono(argv=None):
    from photo_slam_tpu.io.datasets import TumDataset
    from photo_slam_tpu.models.camera import PINHOLE, Camera
    ap = _common_parser()
    ap.add_argument("--fx", type=float, default=535.4)
    ap.add_argument("--fy", type=float, default=539.2)
    ap.add_argument("--cx", type=float, default=320.1)
    ap.add_argument("--cy", type=float, default=247.6)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args(argv)
    cfg = (load_reference_yaml(args.cfg) if args.cfg
           else dataset_config("tum_mono"))
    cam = Camera(camera_id=0, model_id=PINHOLE, width=args.width,
                 height=args.height, fx=args.fx, fy=args.fy, cx=args.cx,
                 cy=args.cy)
    # Monocular: depth maps (when present) only seed sparse keypoints, the
    # mapper runs the monocular neighbor-depth densification path.
    ds = TumDataset(args.data, cam, with_depth=(args.frontend == "gt"))
    return run_online(ds, SensorType.MONOCULAR, cfg, args.out,
                      keyframe_every=args.keyframe_every,
                      max_iterations=args.iters, frontend=args.frontend,
                      viewer=args.viewer, viewer_port=args.viewer_port,
                      batch=args.batch, async_mapping=args.async_mapping,
                      use_imu=args.imu)


def euroc_stereo(argv=None):
    from photo_slam_tpu.io.datasets import EurocDataset
    from photo_slam_tpu.models.camera import PINHOLE, Camera
    ap = _common_parser()
    ap.add_argument("--bf", type=float, default=47.9)  # baseline * fx
    args = ap.parse_args(argv)
    cfg = (load_reference_yaml(args.cfg) if args.cfg
           else dataset_config("euroc_stereo"))
    # Fallback intrinsics only: with sensor.yaml calibration present the
    # loader rectifies and derives the camera itself.
    cam = Camera(camera_id=0, model_id=PINHOLE, width=752, height=480,
                 fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                 stereo_bf=args.bf)
    ds = EurocDataset(args.data, cam)
    return run_online(ds, SensorType.STEREO, cfg, args.out,
                      keyframe_every=args.keyframe_every,
                      max_iterations=args.iters, frontend=args.frontend,
                      viewer=args.viewer, viewer_port=args.viewer_port,
                      batch=args.batch, async_mapping=args.async_mapping,
                      use_imu=args.imu)


if __name__ == "__main__":
    import sys

    entry = sys.argv[1] if len(sys.argv) > 1 else "replica_rgbd"
    fn = {"replica_rgbd": replica_rgbd, "replica_mono": replica_mono,
          "tum_rgbd": tum_rgbd, "tum_mono": tum_mono,
          "euroc_stereo": euroc_stereo}[entry]
    fn(sys.argv[2:])
