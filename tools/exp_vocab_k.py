"""Why does the 400-frame multi-loop retrieval fail? Hypothesis: vocab_k=256
words over 300 descriptors/KF gives DENSE tf histograms -> flat L1 scores.
Render the out-and-back cylinder leg, extract frontend ORB descriptors, and
measure (a) the direct ratio-test match count between the true revisit pair,
(b) retrieval rank of the true match under vocab_k in {256, 1024, 4096}.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_vocab_k.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cv2

from tests.test_frontend_stress import _cyl_frame, _full_cylinder_world
from tests.test_frontend import make_camera
from photo_slam_tpu.tracking.frontend import SlamFrontend, match_descriptors
from photo_slam_tpu.tracking.vocab import KeyframeDatabase


def main():
    cv2.setRNGSeed(11)
    cam = make_camera()
    world = _full_cylinder_world()
    # The multi-loop trajectory's first leg + the return tail.
    leg = 100
    yaws = np.concatenate([np.linspace(0.0, 1.3, leg),
                           np.linspace(1.3, 0.0, leg)])
    centers = np.stack([0.25 * np.sin(yaws), np.zeros_like(yaws),
                        0.25 * (np.cos(yaws) - 1.0)], 1)
    fe = SlamFrontend(cam, sensor="rgbd", enable_loop_closing=False)
    sel = list(range(0, 2 * leg, 3))   # the keyframe cadence of the test
    descs = {}
    for i in sel:
        fr, _ = _cyl_frame(world, cam, yaws[i], center=centers[i])
        fr = fe._rectify_frame(fr)
        px, desc, resp = fe._extract(fr)
        d = desc[np.argsort(-resp)][:300] if resp is not None else desc[:300]
        descs[i] = np.ascontiguousarray(d)
        print(f"rendered {i} yaw {yaws[i]:+.2f} n_desc {len(desc)}",
              flush=True)

    q = 198 if 198 in descs else sel[-1]
    true_i = 0
    ia, _ = match_descriptors(descs[q], descs[true_i], max_dist=45,
                              ratio=0.85)
    print(f"\nratio-test matches query(frame {q}, yaw {yaws[q]:+.2f}) vs "
          f"true match frame 0: {len(ia)}")
    ia2, _ = match_descriptors(descs[q], descs[sel[38]], max_dist=45,
                               ratio=0.85)
    print(f"ratio-test matches query vs distractor frame {sel[38]} "
          f"(yaw {yaws[sel[38]]:+.2f}): {len(ia2)}")

    for k in (256, 1024, 4096):
        db = KeyframeDatabase(vocab_k=k, seed=0)
        for j, i in enumerate(sel[:-1]):
            db.add(j, descs[i])
        qd = descs[q]
        hits = db.query(qd, topk=10)
        frames_of = {j: sel[j] for j in range(len(sel))}
        hit_frames = [(frames_of[h], round(s, 3)) for h, s in hits[:6]]
        # rank of the true match (frame 0 == kf 0)
        all_hits = db.query(qd, topk=len(sel))
        rank = next((r for r, (h, _) in enumerate(all_hits) if h == 0), -1)
        print(f"k={k}: true-match rank {rank}, top hits (frame, score): "
              f"{hit_frames}")


if __name__ == "__main__":
    main()
