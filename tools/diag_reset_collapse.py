"""Diagnose the opacity-reset map collapse seen in the r4a 30k soak.

The benchmark protocol never resets opacity (reference yaml
opacity_reset_interval: 0), but the offline train_colmap path follows the
3DGS schedule (reset every 3000, reference gaussian_parameters.h:74) — and
the r4a protocol run with that schedule collapsed irrecoverably at the first
reset (held-out 31 dB -> 8 dB, live 263k -> 34k, monotone pruning).

This tool reproduces the event window at reduced scale with DENSE telemetry:
every densify event logs live count, prune/clone/split/drop counts, opacity
percentiles of the live set, and the screen/world prune split, so the death
spiral's mechanism is visible (opacity non-recovery? 20px screen prune?
world-size prune? scale inflation?).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/diag_reset_collapse.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench

RESET_AT = 1200
END_AT = 2600
DENSIFY_EVERY = 100
DENSIFY_FROM = 300
# DIAG_SCREEN_PRUNE=1 reproduces the r4a soak's (erroneous, 3DGS-train.py
# style) 20px screen prune active right after the reset; =0 is the reference
# protocol (prune_big_point_after_iter: 30000 -> never during this window).
SCREEN_PRUNE = bool(int(__import__("os").environ.get("DIAG_SCREEN_PRUNE",
                                                     "1")))


def main():
    import jax
    import jax.numpy as jnp

    from photo_slam_tpu.mapper.trainer import (densify_step,
                                               opacity_reset_step, train_step)
    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.models import optimizer as optim
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.losses import psnr as psnr_fn
    from photo_slam_tpu.ops.render import RenderSettings, render
    from photo_slam_tpu.utils.math import inverse_sigmoid

    n = 100_000
    width, height = 600, 340
    fovx = 1.2
    rng = np.random.RandomState(0)
    pts, _ = bench.room_scene(n, rng)
    cap = n
    cap_train = n * 3 // 2

    settings = RenderSettings(
        width=width, height=height,
        tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width),
        sh_degree=3, mode="pallas",
        max_tiles_per_gaussian=6, max_per_tile=1024)
    bg = jnp.zeros(3)

    atlas = bench.photo_atlas()
    gt_cols = bench.photo_colors(pts, atlas)
    gt_state = gm.create_from_pcd(pts, gt_cols, sh_degree=3, capacity=cap)
    gt_state = gt_state._replace(params=gt_state.params._replace(
        opacity_logit=jnp.full_like(gt_state.params.opacity_logit,
                                    float(inverse_sigmoid(jnp.float32(0.85))))))

    def make_cam(yaw, tx, ty, tz):
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        return build_camera_matrices(R, np.array([tx, ty, tz]), 0.01, 100.0,
                                     fovx, fovx * height / width)

    views = [make_cam(0.12 * (i - 5), 0.2 * (i % 4 - 1.5), 0.1 * (i % 3 - 1),
                      0.3 * (i % 3)) for i in range(12)]
    test_cam = make_cam(0.05, -0.15, 0.06, 0.2)

    @jax.jit
    def _render(p, l, c):
        sc, qu, op = gm.activated(p)
        return render(p.xyz, sc, qu, op, c, settings, bg,
                      shs=gm.sh_features(p), live_mask=l).image

    gt_views = [_render(gt_state.params, gt_state.live, c) for c in views]
    gt_test = _render(gt_state.params, gt_state.live, test_cam)
    del gt_state

    m_sub = 60_000
    sel = rng.choice(n, m_sub, replace=False)
    init_pts = pts[sel] + rng.randn(m_sub, 3).astype(np.float32) * 0.01
    state = gm.create_from_pcd(init_pts, np.full((m_sub, 3), 0.5, np.float32),
                               sh_degree=3, capacity=cap_train)
    opt_state = optim.init_adam(state.params)
    lrs = optim.LearningRates.create(1.6e-4, 2.5e-3, 0.05, 5e-3, 1e-3)
    lam = jnp.float32(0.2)
    mask = jnp.ones((height, width), jnp.float32)
    extent = 1.1 * float(np.percentile(
        np.linalg.norm(pts - pts.mean(0), axis=1), 95))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def live_stats(state):
        p = state.params
        live = state.live
        opac = jax.nn.sigmoid(p.opacity_logit[:, 0])
        smax = jnp.max(jnp.exp(p.log_scales), axis=-1)
        nl = jnp.maximum(jnp.sum(live), 1)

        def masked_pct(x, q):
            big = jnp.where(live, x, jnp.inf)
            srt = jnp.sort(big)
            idx = jnp.clip((q * nl.astype(jnp.float32) / 100.0).astype(
                jnp.int32), 0, x.shape[0] - 1)
            return srt[idx]

        return {
            "live": jnp.sum(live),
            "op_p10": masked_pct(opac, 10.0), "op_p50": masked_pct(opac, 50.0),
            "op_p90": masked_pct(opac, 90.0),
            "sm_p50": masked_pct(smax, 50.0), "sm_p99": masked_pct(smax, 99.0),
            "n_op_below_005": jnp.sum(live & (opac < 0.005)),
            "n_sm_big": jnp.sum(live & (smax > 0.1 * extent)),
            "n_r2d_big": jnp.sum(live & (state.max_radii2d > 20.0)),
        }

    t0 = time.time()
    for i in range(1, END_AT + 1):
        v = (i - 1) % len(views)
        state, opt_state, m = train_step(state, opt_state, views[v],
                                         gt_views[v], mask, lrs, bg, lam,
                                         settings)
        pre = None
        if i >= RESET_AT - 200 and i % DENSIFY_EVERY == 0:
            pre = {k: float(x) for k, x in
                   jax.device_get(live_stats(state)).items()}
        if DENSIFY_FROM < i and i % DENSIFY_EVERY == 0:
            key, sub = jax.random.split(key)
            state, opt_state, info = densify_step(
                state, opt_state, sub, jnp.float32(max(extent, 1.0)),
                grad_threshold=2e-4, min_opacity=0.005,
                max_screen_size=(20 if (SCREEN_PRUNE and i > RESET_AT)
                                 else 0),
                percent_dense=0.01)
            if pre is not None:
                ho = float(psnr_fn(_render(state.params, state.live,
                                           test_cam), gt_test))
                rec = {"iter": i, "loss": round(float(m["loss"]), 4),
                       "psnr": round(ho, 2),
                       "cloned": int(info.num_cloned),
                       "split": int(info.num_split),
                       "pruned": int(info.num_pruned),
                       "dropped": int(info.num_dropped)}
                rec.update({k: (round(v2, 4) if isinstance(v2, float) else v2)
                            for k, v2 in pre.items()})
                print(json.dumps(rec), flush=True)
        if i == RESET_AT:
            state, opt_state = opacity_reset_step(state, opt_state)
            print(f"### opacity reset at iter {i} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    ho = float(psnr_fn(_render(state.params, state.live, test_cam), gt_test))
    print(json.dumps({"final_iter": END_AT, "final_psnr": round(ho, 2),
                      "live": int(gm.num_live(state)),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
