"""Benchmark: photorealistic splat-render FPS on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = the 30 FPS real-time rendering north star from BASELINE.md
(the reference's headline claim is real-time photorealistic rendering;
its per-keyframe render_time machinery is src/gaussian_mapper.cpp:1582-1597).

Scene: 200k Gaussians (a converged-map scale for Replica-class scenes),
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


def main():
    import jax
    import jax.numpy as jnp

    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.render import RenderSettings, render

    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    rng = np.random.RandomState(0)

    # Room-scale SURFACE cloud (like a converged Replica map): points sampled
    # on the walls/floor/ceiling of an 8x6x3 m room plus two spheres, camera
    # inside looking forward. Surfaces give realistic per-pixel depth
    # complexity (~tens of overlapping splats, not hundreds).
    def sample_box(m):
        w, h, d = 8.0, 3.0, 12.0  # x extent, y extent, z depth
        faces = []
        per = m // 5
        # left/right walls
        for sx in (-w / 2, w / 2):
            faces.append(np.stack([
                np.full(per, sx), rng.uniform(-h / 2, h / 2, per),
                rng.uniform(0.2, d, per)], 1))
        # floor / ceiling
        for sy in (-h / 2, h / 2):
            faces.append(np.stack([
                rng.uniform(-w / 2, w / 2, per),
                np.full(per, sy), rng.uniform(0.2, d, per)], 1))
        # back wall
        faces.append(np.stack([
            rng.uniform(-w / 2, w / 2, m - 4 * per),
            rng.uniform(-h / 2, h / 2, m - 4 * per),
            np.full(m - 4 * per, d)], 1))
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

    cap = n  # serving-style render: exact capacity, no growth headroom
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=cap)
    # Scale init via KNN gives realistic on-screen footprints.

    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                fovx, fovx * height / width)
    settings = RenderSettings(
        width=width, height=height,
        tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width),
        sh_degree=3,
        mode="pallas",
        max_tiles_per_gaussian=12,
        max_per_tile=1024,
    )
    bg = jnp.zeros(3)

    @jax.jit
    def forward(params, live):
        scales, quats, opac = gm.activated(params)
        shs = gm.sh_features(params)
        res = render(params.xyz, scales, quats, opac, cam, settings, bg,
                     shs=shs, live_mask=live)
        return res.image, res.num_clipped, res.num_overflow

    log(f"[bench] compiling render: N={n} cap={cap} {width}x{height} "
        f"on {jax.devices()[0]}")
    t0 = time.time()
    img, clipped, overflow = forward(state.params, state.live)
    img.block_until_ready()
    log(f"[bench] compile+first render {time.time() - t0:.1f}s, "
        f"clipped={int(clipped)} overflow={int(overflow)} "
        f"mean={float(img.mean()):.4f}")

    # Warmup then measure.
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

    print(json.dumps({
        "metric": "render_fps_1200x680_300k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
