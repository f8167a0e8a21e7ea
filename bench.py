"""Benchmark: photorealistic splat-render FPS + online train throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline = the 30 FPS real-time rendering north star from BASELINE.md
(the reference's headline claim is real-time photorealistic rendering;
its per-keyframe render_time machinery is src/gaussian_mapper.cpp:1582-1597).

Also measured and reported in "extra":
  * train_iters_per_sec — full train step (render->loss->backward->Adam) at
    the same scale; the reference trains online at one step per mapper-loop
    pass (src/gaussian_mapper.cpp:614-774), so this is the metric that
    gates online mapping.
  * overflow / psnr_vs_exact — per-tile capacity overflow of the production
    config and the PSNR of its image against an overflow-free render
    (max_per_tile large enough for overflow=0), bounding the error that the
    static tile capacity introduces.
  * mapping_psnr_db — the quality north star: a fresh model trained against
    renders of a ground-truth splat room (the reference's protocol in
    miniature: photometric optimization from a sparse noisy init,
    src/gaussian_mapper.cpp:614-774) and scored by PSNR on a HELD-OUT view.
    Reuses the same compiled render/train programs, so it costs training
    wall-clock only.

Scene: 300k Gaussians (a converged-map scale for Replica-class scenes),
1200x680 render — the Replica camera resolution the reference benchmarks.
Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def room_scene(n, rng):
    """Room-scale SURFACE cloud (like a converged Replica map): walls/floor/
    ceiling of an 8x3x12 m room plus two spheres; surfaces give realistic
    per-pixel depth complexity (~tens of overlapping splats)."""

    def sample_box(m):
        w, h, d = 8.0, 3.0, 12.0
        faces = []
        per = m // 5
        for sx in (-w / 2, w / 2):
            faces.append(np.stack([
                np.full(per, sx), rng.uniform(-h / 2, h / 2, per),
                rng.uniform(0.2, d, per)], 1))
        for sy in (-h / 2, h / 2):
            faces.append(np.stack([
                rng.uniform(-w / 2, w / 2, per),
                np.full(per, sy), rng.uniform(0.2, d, per)], 1))
        faces.append(np.stack([
            rng.uniform(-w / 2, w / 2, m - 4 * per),
            rng.uniform(-h / 2, h / 2, m - 4 * per),
            np.full(m - 4 * per, 12.0)], 1))
        return np.concatenate(faces)

    def sample_sphere(m, center, radius):
        v = rng.randn(m, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return center + radius * v

    pts = np.concatenate([
        sample_box(n - 60_000),
        sample_sphere(30_000, np.array([-1.0, -0.7, 4.0]), 0.8),
        sample_sphere(30_000, np.array([1.5, 0.2, 6.5]), 1.1),
    ]).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return pts, cols


def main():
    import jax
    import jax.numpy as jnp

    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.models import optimizer as optim
    from photo_slam_tpu.mapper.trainer import train_step
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.losses import psnr as psnr_fn
    from photo_slam_tpu.ops.render import RenderSettings, render

    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    rng = np.random.RandomState(0)
    pts, cols = room_scene(n, rng)

    cap = n  # serving-style render: exact capacity, no growth headroom
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=cap)

    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                fovx, fovx * height / width)

    def make_settings(max_per_tile):
        return RenderSettings(
            width=width, height=height,
            tan_fovx=float(np.tan(fovx / 2)),
            tan_fovy=float(np.tan(fovx / 2) * height / width),
            sh_degree=3,
            mode="pallas",
            max_tiles_per_gaussian=6,
            max_per_tile=max_per_tile,
        )

    settings = make_settings(1024)
    bg = jnp.zeros(3)

    def forward_fn(settings):
        @jax.jit
        def forward(params, live):
            scales, quats, opac = gm.activated(params)
            shs = gm.sh_features(params)
            res = render(params.xyz, scales, quats, opac, cam, settings, bg,
                         shs=shs, live_mask=live)
            return res.image, res.num_clipped, res.num_overflow
        return forward

    forward = forward_fn(settings)
    log(f"[bench] compiling render: N={n} cap={cap} {width}x{height} "
        f"on {jax.devices()[0]}")
    t0 = time.time()
    img, clipped, overflow = forward(state.params, state.live)
    img.block_until_ready()
    clipped, overflow = int(clipped), int(overflow)
    log(f"[bench] compile+first render {time.time() - t0:.1f}s, "
        f"clipped={clipped} overflow={overflow} "
        f"mean={float(img.mean()):.4f}")

    # Warmup then measure FPS.
    for _ in range(3):
        img, _, _ = forward(state.params, state.live)
    img.block_until_ready()
    iters = 30
    t0 = time.time()
    for _ in range(iters):
        img, _, _ = forward(state.params, state.live)
    img.block_until_ready()
    dt = time.time() - t0
    fps = iters / dt
    log(f"[bench] {iters} renders in {dt:.3f}s -> {fps:.2f} FPS "
        f"({1000 * dt / iters:.1f} ms/frame)")

    # Overflow error bound: render with enough per-tile capacity for
    # overflow=0 and measure the production config's PSNR against it, plus
    # the 2-pass overflow-continuation option (exact continuation of
    # overflowed tiles; ops/tiled.render_pallas).
    psnr_vs_exact = None
    fps_2pass = None
    psnr_2pass = None
    if overflow > 0:
        exact_fwd = forward_fn(make_settings(4096))
        img_exact, _, ov2 = exact_fwd(state.params, state.live)
        psnr_vs_exact = float(psnr_fn(img, img_exact))
        log(f"[bench] exact render overflow={int(ov2)}, production-config "
            f"PSNR vs exact = {psnr_vs_exact:.2f} dB")
        two_pass = forward_fn(make_settings(1024)._replace(
            overflow_passes=2, overflow_capacity=512))
        img2, _, ov3 = two_pass(state.params, state.live)
        img2.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            img2, _, _ = two_pass(state.params, state.live)
        img2.block_until_ready()
        fps_2pass = iters / (time.time() - t0)
        psnr_2pass = float(psnr_fn(img2, img_exact))
        log(f"[bench] 2-pass overflow continuation: {fps_2pass:.2f} FPS, "
            f"overflow={int(ov3)}, PSNR vs exact = {psnr_2pass:.2f} dB")

    # Train throughput: full step (render/loss/grad/stats/Adam).
    opt_state = optim.init_adam(state.params)
    lrs = optim.LearningRates.create(1.6e-4, 2.5e-3, 0.05, 5e-3, 1e-3)
    gt = jnp.asarray(rng.rand(3, height, width).astype(np.float32))
    mask = jnp.ones((height, width), jnp.float32)
    lam = jnp.float32(0.2)
    t0 = time.time()
    state, opt_state, m = train_step(state, opt_state, cam, gt, mask, lrs,
                                     bg, lam, settings)
    jax.block_until_ready(m["loss"])
    log(f"[bench] train_step compile+first {time.time() - t0:.1f}s")
    for _ in range(3):
        state, opt_state, m = train_step(state, opt_state, cam, gt, mask,
                                         lrs, bg, lam, settings)
    jax.block_until_ready(m["loss"])
    k = 20
    t0 = time.time()
    for _ in range(k):
        state, opt_state, m = train_step(state, opt_state, cam, gt, mask,
                                         lrs, bg, lam, settings)
    jax.block_until_ready(m["loss"])
    tps = k / (time.time() - t0)
    log(f"[bench] train_step: {tps:.2f} iters/s "
        f"({1000 / tps:.1f} ms/iter) N={n}")

    # ---- Quality north star: train a fresh model against GT-splat renders,
    # score a held-out view. Same settings -> no new compiles.
    gt_state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=cap)
    from photo_slam_tpu.utils.math import inverse_sigmoid
    gt_state = gt_state._replace(params=gt_state.params._replace(
        opacity_logit=jnp.full_like(gt_state.params.opacity_logit,
                                    float(inverse_sigmoid(jnp.float32(0.85))))))

    def make_cam(yaw, tx, ty, tz):
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        return build_camera_matrices(R, np.array([tx, ty, tz]), 0.01, 100.0,
                                     fovx, fovx * height / width)

    views = [make_cam(0.12 * (i - 5), 0.25 * (i % 3 - 1),
                      0.12 * (i % 2), 0.4 * (i % 4 == 0))
             for i in range(12)]
    test_cam = make_cam(0.05, -0.15, 0.06, 0.2)

    @jax.jit
    def _render_cam(p, l, cam_i):
        sc, qu, op = gm.activated(p)
        return render(p.xyz, sc, qu, op, cam_i, settings, bg,
                      shs=gm.sh_features(p), live_mask=l).image

    def render_with(st, cam_i):
        return _render_cam(st.params, st.live, cam_i)

    gt_views = [jnp.asarray(render_with(gt_state, c)) for c in views]
    gt_test = jnp.asarray(render_with(gt_state, test_cam))

    # Fresh model: subsampled noisy geometry, gray colors.
    m_sub = 150_000
    sel = rng.choice(n, m_sub, replace=False)
    init_pts = pts[sel] + rng.randn(m_sub, 3).astype(np.float32) * 0.01
    init_cols = np.full((m_sub, 3), 0.5, np.float32)
    tr_state = gm.create_from_pcd(init_pts, init_cols, sh_degree=3,
                                  capacity=cap)
    tr_opt = optim.init_adam(tr_state.params)
    quality_iters = 1200
    t0 = time.time()
    for i in range(quality_iters):
        v = i % len(views)
        tr_state, tr_opt, m = train_step(tr_state, tr_opt, views[v],
                                         gt_views[v], mask, lrs, bg, lam,
                                         settings)
    jax.block_until_ready(m["loss"])
    test_img = render_with(tr_state, test_cam)
    mapping_psnr = float(psnr_fn(test_img, gt_test))
    log(f"[bench] quality: {quality_iters} iters in {time.time()-t0:.1f}s, "
        f"held-out view PSNR {mapping_psnr:.2f} dB")

    print(json.dumps({
        "metric": "render_fps_1200x680_300k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "train_iters_per_sec": round(tps, 2),
            "binning_clipped": clipped,
            "binning_overflow": overflow,
            "psnr_vs_exact_db": (None if psnr_vs_exact is None
                                 else round(psnr_vs_exact, 2)),
            "fps_2pass_overflow": (None if fps_2pass is None
                                   else round(fps_2pass, 2)),
            "psnr_2pass_vs_exact_db": (None if psnr_2pass is None
                                       else round(psnr_2pass, 2)),
            "mapping_psnr_db": round(mapping_psnr, 2),
        },
    }))


if __name__ == "__main__":
    main()
