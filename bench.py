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

    n = 200_000
    width, height = 1200, 680
    fovx = 1.2
    rng = np.random.RandomState(0)

    # Room-scale cloud: points spread through the frustum with distance-scaled
    # extents so screen-space radii look like a converged map (a few px).
    z = rng.uniform(1.5, 12.0, n)
    x = rng.uniform(-0.9, 0.9, n) * z * np.tan(fovx / 2)
    y = rng.uniform(-0.9, 0.9, n) * z * np.tan(fovx / 2) * height / width
    pts = np.stack([x, y, z], 1).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)

    cap = gm.round_capacity(n, minimum=n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=cap)
    # Scale init via KNN gives realistic on-screen footprints.

    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                fovx, fovx * height / width)
    settings = RenderSettings(
        width=width, height=height,
        tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width),
        sh_degree=3,
        max_tiles_per_gaussian=16,
        max_per_tile=1024,
        tiles_per_chunk=32,
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

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        img, _, _ = forward(state.params, state.live)
    img.block_until_ready()
    dt = time.time() - t0
    fps = iters / dt
    log(f"[bench] {iters} renders in {dt:.3f}s -> {fps:.2f} FPS "
        f"({1000 * dt / iters:.1f} ms/frame)")

    print(json.dumps({
        "metric": "render_fps_1200x680_200k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
