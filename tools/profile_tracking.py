"""Frontend-only tracking profiler: runs SlamFrontend over a Replica-format
sequence with NO mapper/TPU attached and reports per-frame wall time plus a
stage breakdown (ORB extraction / local-map matching / PnP+motion BA /
keyframe work) — the budget behind run_summary.json's mean_tracking_ms
(reference: the real-time tracking thread, examples/replica_rgbd.cpp:133-173).

Usage: python tools/profile_tracking.py [data_dir] [n_frames] [--async]

--async runs local mapping (cull + local BA + loop verify) on the worker
thread, the app default — the keyframe-tail stages then cost the tracking
thread almost nothing and their totals report WORKER time.
"""
import sys
import time

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    async_mode = "--async" in sys.argv
    data = args[0] if args else "/tmp/synth_replica"
    n_frames = int(args[1]) if len(args) > 1 else 120

    from photo_slam_tpu.io.datasets import ReplicaDataset
    from photo_slam_tpu.tracking.frontend import SlamFrontend

    ds = ReplicaDataset(data)
    fe = SlamFrontend(ds.camera, sensor="rgbd", num_features=1000,
                      async_local_mapping=async_mode)

    # Wrap the stage methods with timers.
    stages = {"extract": 0.0, "track_local_map": 0.0, "pose": 0.0,
              "create_kf": 0.0, "local_ba": 0.0, "detect_loop": 0.0}
    counts = dict.fromkeys(stages, 0)

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stages[name] += time.perf_counter() - t0
            counts[name] += 1
            return out
        return inner

    fe._extract = wrap("extract", fe._extract)
    fe._track_local_map = wrap("track_local_map", fe._track_local_map)
    fe._pose_from_matches = wrap("pose", fe._pose_from_matches)
    fe._create_keyframe = wrap("create_kf", fe._create_keyframe)
    fe._run_local_ba = wrap("local_ba", fe._run_local_ba)
    fe._detect_loop = wrap("detect_loop", fe._detect_loop)

    n = 0
    for fr in ds.frames():
        fe.process_frame(fr)
        n += 1
        if n >= n_frames:
            break
    fe.flush()
    fe.close()

    tt = np.array(fe.track_times) * 1000.0
    print(f"frames={n} kfs={len(fe.map.keyframes)} "
          f"points={int(fe.map.alive.sum())} async={async_mode}")
    print(f"per-frame ms: mean {tt.mean():.1f}  median "
          f"{np.median(tt):.1f}  p90 {np.percentile(tt, 90):.1f}  "
          f"max {tt.max():.1f}")
    for k, v in stages.items():
        print(f"  {k:<18} total {v * 1000:8.1f} ms  "
              f"({counts[k]} calls, {1000 * v / max(counts[k], 1):6.2f} "
              f"ms/call)")


if __name__ == "__main__":
    main()
