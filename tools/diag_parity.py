"""Diagnose tests/test_frontend.py::TestMappingQualityParity — SLAM-driven
mapping PSNR vs GT-driven. Prints the op-stream differences (keyframe count,
pose error per KF, points pushed) and both PSNRs.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_parity.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from tests.test_frontend import (W, H, make_sequence, textured_world,
                                 render_frame)
from photo_slam_tpu.tracking.frontend import SlamFrontend
from photo_slam_tpu.tracking.gt_tracker import GroundTruthTracker
from photo_slam_tpu.utils.math import se3_inverse, rotmat_to_quat
from photo_slam_tpu.utils.evaluate import ate_rmse
from photo_slam_tpu.ops.losses import psnr


def run_mapper(cam, push_ops, iters=50):
    from photo_slam_tpu.config import Config
    from photo_slam_tpu.mapper.mapper import GaussianMapper, SensorType

    cfg = Config()
    cfg.renderer.initial_capacity = 8192
    cfg.mapper.min_num_initial_map_kfs = 2
    cfg.mapper.do_gaus_pyramid_training = False
    cfg.opt.densify_from_iter = 10000
    mapper = GaussianMapper(cfg, SensorType.RGBD)
    mapper.add_camera(cam)
    ops = []
    def push(op):
        ops.append(op)
        mapper.queue.push(op)
    push_ops(push)
    n_kf = sum(len(op.keyframes) for op in ops)
    n_pts = sum(0 if op.positions is None else len(op.positions)
                for op in ops)
    print(f"  ops={len(ops)} kf-updates={n_kf} points-pushed={n_pts}")
    mapper.run(is_tracker_done=lambda: True, max_iterations=iters)
    print(f"  mapper: live={mapper.trainer.metrics.num_live} "
          f"iter={mapper.trainer.iteration} "
          f"ema_loss={mapper.trainer.metrics.ema_loss:.4f} "
          f"kfs={len(mapper.scene.keyframes)}")
    return mapper


def main():
    cam, frames, gt = (lambda tr: make_sequence(tr))(
        [np.array([0.05 * i, 0.015 * i, 0.0]) for i in range(10)])

    def push_gt(push):
        tr = GroundTruthTracker(cam, keyframe_every=1)
        tr.run(iter(frames), push)

    fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                      kf_tracked_ratio=2.0, enable_loop_closing=False)

    def push_slam(push):
        fe.run(iter(frames), push)

    print("[GT-driven]")
    m_gt = run_mapper(cam, push_gt)
    print("[SLAM-driven]")
    m_slam = run_mapper(cam, push_slam)

    est = np.stack([se3_inverse(t)[:3, 3] for t in fe.trajectory])
    gt_pos = np.stack([se3_inverse(t)[:3, 3] for t in gt])
    print(f"frontend ATE {ate_rmse(est, gt_pos):.4f} m")
    # Per-KF pose error inside the SLAM map (what the mapper consumed).
    for kfid, kf in sorted(fe.map.keyframes.items()):
        fid = int(kf.fid) if hasattr(kf, "fid") else kfid
        err = np.abs(fe.map.keyframes[kfid].tcw
                     - gt[min(fid, len(gt) - 1)]).max()
        print(f"  kf {kfid} fid={getattr(kf, 'fid', '?')} pose_err~{err:.4f}")

    world = textured_world(seed=0)
    t_test = np.array([0.22, 0.07, 0.02])
    gt_img = render_frame(world, np.eye(3), t_test, cam)
    quat = np.asarray(rotmat_to_quat(jnp.asarray(np.eye(3))))
    img_gt = m_gt.render_from_pose(quat, t_test, W, H)
    img_slam = m_slam.render_from_pose(quat, t_test, W, H)
    p_gt = float(psnr(jnp.asarray(img_gt), jnp.asarray(gt_img)))
    p_slam = float(psnr(jnp.asarray(img_slam), jnp.asarray(gt_img)))
    print(f"PSNR gt-driven {p_gt:.2f} dB, slam-driven {p_slam:.2f} dB, "
          f"gap {p_gt - p_slam:.2f}")
    # Also score on a TRAINING view (kf 0 pose) to separate "bad fit" from
    # "bad held-out generalization".
    img_gt0 = m_gt.render_from_pose(quat, np.zeros(3), W, H)
    img_slam0 = m_slam.render_from_pose(quat, np.zeros(3), W, H)
    gt_img0 = render_frame(world, np.eye(3), np.zeros(3), cam)
    print(f"train-view PSNR gt-driven "
          f"{float(psnr(jnp.asarray(img_gt0), jnp.asarray(gt_img0))):.2f}, "
          f"slam-driven "
          f"{float(psnr(jnp.asarray(img_slam0), jnp.asarray(gt_img0))):.2f}")


if __name__ == "__main__":
    main()
