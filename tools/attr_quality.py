"""Attribution of the 30k clean-train quality ceiling (VERDICT r5 item 1).

The clean-train control (tools/quality_soak_30k.py, SOAK_CLEAN=1) landed at
29.85 dB held-out — below the ~33 dB bar that would have cleared the
pipeline. This tool isolates WHERE the remaining dB live, using the final
30k checkpoint and the exact soak protocol world:

  1. train-view PSNR vs held-out PSNR — the reference's own per-keyframe
     psnr.txt machinery scores TRAINING keyframes
     (reference: src/gaussian_mapper.cpp:1607-1656), so the held-out number
     carries a view-sparsity generalization gap the reference never pays
     (24 training cameras for a whole room vs ~2000 Replica frames);
  2. k_dup sensitivity — production binning clips each Gaussian's footprint
     to max_tiles_per_gaussian=6 tiles; scoring with 16 isolates clipping;
  3. matmul precision — scoring renders with float32 matmuls isolates the
     bf16 MXU default;
  4. GT-world render fidelity — the PSNR of the production-config render of
     the GT WORLD itself against its exact render bounds what the render
     path (not the fit) can lose.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/attr_quality.py
Output: results/quality30k_clean/attribution.json
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from tools.quality_soak_30k import load_ckpt

OUT = Path(os.environ.get(
    "SOAK_OUT",
    str(Path(__file__).resolve().parent.parent / "results"
        / "quality30k_clean")))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = Path(os.environ.get("SOAK_JAX_CACHE",
                                    "/tmp/soak30k_jax_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.losses import psnr as psnr_fn
    from photo_slam_tpu.ops.losses import ssim
    from photo_slam_tpu.ops.render import RenderSettings, render
    from photo_slam_tpu.utils.math import inverse_sigmoid

    ckpts = sorted(OUT.glob("ckpt_*.npz"))
    assert ckpts, f"no checkpoints under {OUT}"
    state, _, it, _ = load_ckpt(ckpts[-1])
    log(f"[attr] loaded {ckpts[-1].name} (iter {it}, "
        f"live {int(gm.num_live(state))})")

    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    rng = np.random.RandomState(0)
    pts, _ = bench.room_scene(n, rng)
    rng.rand(3, height, width)

    def make_settings(k_dup, max_per_tile=1024, passes=1, cap2=512,
                      compact=128):
        return RenderSettings(
            width=width, height=height,
            tan_fovx=float(np.tan(fovx / 2)),
            tan_fovy=float(np.tan(fovx / 2) * height / width),
            sh_degree=3, mode="pallas",
            max_tiles_per_gaussian=k_dup, max_per_tile=max_per_tile,
            overflow_passes=passes, overflow_capacity=cap2,
            overflow_compact=compact)

    bg = jnp.zeros(3)
    atlas = bench.photo_atlas()
    gt_cols = bench.photo_colors(pts, atlas)
    gt_state = gm.create_from_pcd(pts, gt_cols, sh_degree=3, capacity=n)
    gt_state = gt_state._replace(params=gt_state.params._replace(
        opacity_logit=jnp.full_like(gt_state.params.opacity_logit,
                                    float(inverse_sigmoid(jnp.float32(0.85))))))

    cam0 = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                 fovx, fovx * height / width)
    settings = make_settings(6)

    @jax.jit
    def probe(p, l):
        sc, qu, op = gm.activated(p)
        res = render(p.xyz, sc, qu, op, cam0, settings, bg,
                     shs=gm.sh_features(p), live_mask=l)
        return res.num_overflow_tiles, res.max_tile_depth

    over_tiles, max_depth = (int(x) for x in probe(gt_state.params,
                                                   gt_state.live))

    def _ceil_to(x, m):
        return ((x + m - 1) // m) * m

    compact = _ceil_to(max(over_tiles + over_tiles // 4, 32), 8)
    cap2 = max(512, _ceil_to((max_depth - 1024) * 5 // 4, 128))
    exact6 = make_settings(6, passes=2, cap2=cap2, compact=compact)
    exact16 = make_settings(16, passes=2, cap2=cap2, compact=compact)

    def make_cam(yaw, tx, ty, tz):
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        return build_camera_matrices(R, np.array([tx, ty, tz]), 0.01, 100.0,
                                     fovx, fovx * height / width)

    view_params = [(0.09 * (i - 11), 0.22 * (i % 5 - 2), 0.1 * (i % 3 - 1),
                    0.35 * (i % 4)) for i in range(24)]
    views = [make_cam(*vp) for vp in view_params]
    test_cams = [make_cam(0.05, -0.15, 0.06, 0.2),
                 make_cam(-0.35, 0.3, -0.05, 0.7)]

    def renderer(st):
        @jax.jit
        def fn(p, l, cam_i):
            sc, qu, op = gm.activated(p)
            return render(p.xyz, sc, qu, op, cam_i, st, bg,
                          shs=gm.sh_features(p), live_mask=l).image
        return fn

    r6 = renderer(exact6)
    r16 = renderer(exact16)
    score = jax.jit(lambda a, b: (psnr_fn(a, b), ssim(a, b)))

    report = {"ckpt_iter": it, "live": int(gm.num_live(state))}
    t0 = time.time()

    # GT targets (exact, k_dup=6 — the soak's own scoring path).
    gt_tests = [np.asarray(r6(gt_state.params, gt_state.live, c))
                for c in test_cams]
    train_idx = [0, 5, 11, 17, 23]
    gt_train = [np.asarray(r6(gt_state.params, gt_state.live, views[i]))
                for i in train_idx]

    # 1. held-out (baseline reproduction) vs train-view PSNR.
    ho = [float(score(r6(state.params, state.live, c), jnp.asarray(g))[0])
          for c, g in zip(test_cams, gt_tests)]
    tv = [float(score(r6(state.params, state.live, views[i]),
                      jnp.asarray(g))[0])
          for i, g in zip(train_idx, gt_train)]
    report["held_out_psnr_db"] = round(float(np.mean(ho)), 3)
    report["train_view_psnr_db"] = round(float(np.mean(tv)), 3)
    report["generalization_gap_db"] = round(
        float(np.mean(tv) - np.mean(ho)), 3)
    log(f"[attr] held-out {np.mean(ho):.2f} dB, train-view "
        f"{np.mean(tv):.2f} dB (gap {np.mean(tv) - np.mean(ho):.2f} dB) "
        f"({time.time() - t0:.0f}s)")

    # 2. k_dup clipping: score the SAME params with k_dup=16 on both sides.
    gt_tests16 = [np.asarray(r16(gt_state.params, gt_state.live, c))
                  for c in test_cams]
    ho16 = [float(score(r16(state.params, state.live, c),
                        jnp.asarray(g))[0])
            for c, g in zip(test_cams, gt_tests16)]
    report["held_out_psnr_kdup16_db"] = round(float(np.mean(ho16)), 3)
    log(f"[attr] held-out at k_dup=16: {np.mean(ho16):.2f} dB "
        f"(k_dup=6 clipping effect "
        f"{np.mean(ho16) - np.mean(ho):+.2f} dB)")

    # 3. f32 matmuls on the scoring render.
    with jax.default_matmul_precision("float32"):
        rf32 = renderer(exact6)
        hof32 = [float(score(rf32(state.params, state.live, c),
                             jnp.asarray(g))[0])
                 for c, g in zip(test_cams, gt_tests)]
    report["held_out_psnr_f32_db"] = round(float(np.mean(hof32)), 3)
    log(f"[attr] held-out with f32 matmuls: {np.mean(hof32):.2f} dB "
        f"(bf16 effect {np.mean(hof32) - np.mean(ho):+.2f} dB)")

    # 4. render-path fidelity bound: production 1-pass render of the GT
    # world vs its exact render (not a fit property at all).
    r1pass = renderer(make_settings(6))
    fid = [float(score(r1pass(gt_state.params, gt_state.live, c),
                       jnp.asarray(g))[0])
           for c, g in zip(test_cams, gt_tests)]
    report["gt_render_1pass_vs_exact_db"] = round(float(np.mean(fid)), 3)
    log(f"[attr] GT-world 1-pass vs exact: {np.mean(fid):.2f} dB")

    report["wall_s"] = round(time.time() - t0, 1)
    with open(OUT / "attribution.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
