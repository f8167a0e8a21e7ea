"""Multi-map recovery + monocular gauge watchdog (the role of ORB-SLAM3's
Atlas: a fresh map is spawned when tracking is lost beyond relocalization,
and merged back on a later loop-style detection — reference:
ORB-SLAM3/src/Atlas.cc, LoopClosing::MergeLocal), plus the covisibility
local-BA window (reference: Optimizer.cc:1116 LocalBundleAdjustment
optimizes the covisible set, not the most recent keyframes).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from photo_slam_tpu.mapper.mapping_ops import OprType  # noqa: E402
from photo_slam_tpu.tracking.frontend import SlamFrontend  # noqa: E402
from photo_slam_tpu.tracking.gt_tracker import Frame  # noqa: E402
from tests.test_frontend import (H, W, make_camera,  # noqa: E402
                                 make_sequence, render_frame,
                                 textured_world, PLANE_Z)


def _blank_frame(i):
    return Frame(image=np.zeros((3, H, W), np.float32), quat_wxyz=None,
                 trans=None, depth=np.full((H, W), PLANE_Z, np.float32),
                 filename=f"blank{i}")


class TestMultiMap:
    @pytest.mark.slow
    def test_submap_spawn_and_merge_on_revisit(self):
        """Tracking dies mid-sequence (blank frames); the frontend must keep
        mapping the second half in a fresh sub-map and stitch it onto the
        first map when the camera revisits known territory."""
        cam = make_camera()
        world = textured_world(seed=7)
        xs = [0.06 * i for i in range(6)]
        frames_a, gts_a = [], []
        for i, x in enumerate(xs):
            t = np.array([x, 0.0, 0.0])
            img = render_frame(world, np.eye(3), t, cam)
            frames_a.append(Frame(
                image=img, quat_wxyz=np.array([1.0, 0, 0, 0]), trans=t,
                depth=np.full((H, W), PLANE_Z, np.float32), filename=f"a{i}"))
            gts_a.append(t)
        # Phase B: revisit near the start, but WITHOUT ground-truth pose —
        # the sub-map is seeded at the last-known (end-of-A) pose, so the
        # merge has a genuine offset to correct.
        frames_b, gts_b = [], []
        for i, x in enumerate([0.03 + 0.06 * i for i in range(5)]):
            t = np.array([x, 0.0, 0.0])
            img = render_frame(world, np.eye(3), t, cam)
            frames_b.append(Frame(
                image=img, quat_wxyz=None, trans=None,
                depth=np.full((H, W), PLANE_Z, np.float32), filename=f"b{i}"))
            gts_b.append(t)

        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=4,
                          enable_loop_closing=True,
                          loop_min_score=40, loop_min_inliers=20)
        fe.submap_after_lost = 5
        for fr in frames_a:
            fe.process_frame(fr)
        n_main = len(fe.map.keyframes)
        assert n_main >= 4

        for i in range(7):
            fe.process_frame(_blank_frame(i))
        assert len(fe._old_maps) == 1, "sub-map was not spawned"
        assert len(fe.map.keyframes) == 0

        ops = []
        for fr in frames_b:
            ops.extend(fe.process_frame(fr))
        # The second half WAS mapped (keyframes + LocalMappingBA ops kept
        # flowing while in the sub-map)...
        assert any(o.kind == OprType.LOCAL_MAPPING_BA for o in ops)
        # ...and the revisit merged the maps.
        assert fe.num_maps_merged == 1, "maps were not merged"
        assert not fe._old_maps
        assert len(fe.map.keyframes) > n_main
        merge_ops = [o for o in ops if o.kind == OprType.LOOP_CLOSING_BA]
        assert merge_ops, "merge emitted no LoopClosingBA op"

        # After the merge the sub-map keyframes sit at their true poses
        # (phase B revisits phase A's viewpoints; the world is shared).
        sub_ids = sorted(k.kfid for k in merge_ops[0].keyframes)
        # Frame convention: (quat, trans) IS world->camera, so the GT tcw
        # translation equals +t. Tracking after the merge continues on the
        # merged map.
        last_errs = []
        for kfid, t_gt in zip(sub_ids, gts_b):
            kf = fe.map.keyframes.get(kfid)
            if kf is None:
                continue
            last_errs.append(np.linalg.norm(kf.tcw[:3, 3] - t_gt))
        assert last_errs and np.median(last_errs) < 0.05, (
            f"merged sub-map poses off: {last_errs}")

    def test_mono_scale_watchdog_emits_scale_refinement(self):
        """When the monocular gauge drifts far from unit median depth the
        frontend renormalizes its whole world (pure gauge change) and emits
        a ScaleRefinement op for the mapper (consumer:
        mapper._apply_scale_refinement)."""
        trans = [np.array([0.05 * i, 0.0, 0.0]) for i in range(6)]
        cam, frames, _ = make_sequence(trans, seed=3)
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=3,
                          enable_loop_closing=False)
        for fr in frames:
            fe.process_frame(fr)
        assert len(fe.map.keyframes) >= 3

        # Inflate the whole world 10x (consistent gauge change).
        n = fe.map._n
        fe.map.xyz[:n] *= 10.0
        for kf in fe.map.keyframes.values():
            kf.tcw[:3, 3] *= 10.0
        fe.tcw[:3, 3] *= 10.0
        fe.sensor = "mono"

        op = fe._maybe_normalize_scale()
        assert op is not None and op.kind == OprType.SCALE_REFINEMENT
        assert abs(op.scale * 10.0 * PLANE_Z - 1.0) < 0.3
        z = (fe.map.xyz[:n][fe.map.alive[:n]] @ fe.tcw[:3, :3].T
             + fe.tcw[:3, 3])[:, 2]
        assert abs(float(np.median(z)) - 1.0) < 0.05
        # Back inside the band: no repeated emission.
        assert fe._maybe_normalize_scale() is None


class TestCovisibilityWindow:
    def test_revisit_reoptimizes_old_keyframe(self):
        """Out-and-back: the keyframe created back at the start is covisible
        with the FIRST keyframes, not the recent ones. Its local BA must
        include (and improve) a perturbed old keyframe that a recency
        window would never touch."""
        xs = ([0.06 * i for i in range(7)]
              + [0.36 - 0.09 * i for i in range(4)])
        trans = [np.array([x, 0.0, 0.0]) for x in xs[:-1]]
        cam, frames, gt = make_sequence(trans + [np.array([0.0, 0.0, 0.0])],
                                        seed=5)
        fe = SlamFrontend(cam, sensor="rgbd", kf_min_interval=1,
                          kf_tracked_ratio=2.0, ba_window=6,
                          enable_loop_closing=False)
        for fr in frames[:-1]:
            fe.process_frame(fr)
        assert len(fe.map.keyframes) >= 8

        # Perturb an OLD keyframe observing the start region; it is far
        # outside any recency window by now.
        old_id = sorted(fe.map.keyframes)[1]
        gt_tcw = np.eye(4)
        gt_tcw[:3, 3] = trans[1]  # (quat, trans) IS world->camera
        kf_old = fe.map.keyframes[old_id]
        err0 = np.linalg.norm(kf_old.tcw[:3, 3] - gt_tcw[:3, 3])
        kf_old.tcw = kf_old.tcw.copy()
        kf_old.tcw[:3, 3] += np.array([0.04, -0.03, 0.02])
        err_pert = np.linalg.norm(kf_old.tcw[:3, 3] - gt_tcw[:3, 3])
        assert err_pert > err0 + 0.03

        fe.process_frame(frames[-1])  # new keyframe back at the start
        err_after = np.linalg.norm(
            fe.map.keyframes[old_id].tcw[:3, 3] - gt_tcw[:3, 3])
        # The map's own consensus sits at err0 from GT (accumulated SLAM
        # drift); re-optimization can only pull the keyframe back toward
        # the consensus, so score the recovered fraction of the injected
        # perturbation, not the absolute GT error.
        recovered = (err_pert - err_after) / (err_pert - err0)
        assert recovered > 0.6, (
            f"old keyframe not re-optimized: base {err0:.4f}, perturbed "
            f"{err_pert:.4f} -> {err_after:.4f} (recovered {recovered:.2f})")
