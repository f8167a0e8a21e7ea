"""Diagnose the 400-frame multi-loop stress failure: run ONE excursion
(0 -> +1.3 rad -> 0, 200 frames) of tests/test_frontend_stress.py::
TestLongMultiLoop with the loop-closing gate telemetry printed at every
keyframe, so the failing gate (retrieval / covis-normalized minScore /
descriptor vote / PnP) is visible.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_multiloop.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2

from tests.test_frontend_stress import (_cyl_frame, _full_cylinder_world,
                                        _ate_rmse)
from tests.test_frontend import make_camera
from photo_slam_tpu.tracking.frontend import SlamFrontend


def main():
    cv2.setRNGSeed(11)
    cam = make_camera()
    world = _full_cylinder_world()
    leg = 100
    yaws = np.concatenate([
        np.linspace(0.0, 1.3, leg),
        np.linspace(1.3, 0.0, leg),
    ])
    centers = np.stack([0.25 * np.sin(yaws), np.zeros_like(yaws),
                        0.25 * (np.cos(yaws) - 1.0)], 1)
    fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=3,
                      kf_tracked_ratio=2.0, ba_window=4,
                      enable_loop_closing=True)
    gt_all = []
    last_kf = -1
    for i, (yaw, c) in enumerate(zip(yaws, centers)):
        fr, gt = _cyl_frame(world, cam, yaw, center=c)
        fe.process_frame(fr)
        gt_all.append(gt)
        if fe.last_kfid != last_kf:
            last_kf = fe.last_kfid
            dbg = dict(getattr(fe, "loop_debug", {}) or {})
            print(f"frame {i:3d} yaw {yaw:+.2f} kf {last_kf:3d} "
                  f"kfs={len(fe.map.keyframes)} "
                  f"trained={fe.kfdb.trained} dbg={dbg}", flush=True)
        if fe.num_loops_closed:
            print(f"*** LOOP CLOSED at frame {i} (total "
                  f"{fe.num_loops_closed})", flush=True)
    fe.flush()
    fe.close()
    ate = _ate_rmse(fe.trajectory, np.array(gt_all))
    print(f"final: loops={fe.num_loops_closed} ATE={ate:.4f} "
          f"kfs={len(fe.map.keyframes)}")
    # Post-mortem on the final keyframe (a true revisit of kf 0): what does
    # the LIVE database think of the true match?
    from photo_slam_tpu.tracking.frontend import match_descriptors
    q = fe.last_kfid
    print(f"kfdb.score({q}, 0) = {fe.kfdb.score(q, 0):.4f}")
    print(f"kfdb.score({q}, 1) = {fe.kfdb.score(q, 1):.4f}")
    hits = fe.kfdb.query(q, topk=10)
    print(f"query({q}) no-exclude top10: "
          f"{[(k, round(s, 3)) for k, s in hits]}")
    ia, _ = match_descriptors(fe._loop_db[q], fe._loop_db[0],
                              max_dist=45, ratio=0.85)
    print(f"ratio-test matches _loop_db[{q}] vs _loop_db[0]: {len(ia)}")
    n0 = fe.map.keyframes.get(0)
    nq = fe.map.keyframes.get(q)
    if n0 is not None and nq is not None:
        ia2, _ = match_descriptors(nq.desc, n0.desc, max_dist=45,
                                   ratio=0.85)
        print(f"ratio-test matches node{q}.desc vs node0.desc: {len(ia2)}")
        print(f"node0 kps={len(n0.desc)} nodeq kps={len(nq.desc)} "
              f"tcw_q=\n{nq.tcw}")


if __name__ == "__main__":
    main()
