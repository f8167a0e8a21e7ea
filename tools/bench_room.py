"""Room-scene render benchmark with tunable binning knobs (diagnostics)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render


def room_scene(n=300_000, seed=0):
    rng = np.random.RandomState(seed)

    def sample_box(m):
        w, h, d = 8.0, 3.0, 12.0
        per = m // 5
        faces = []
        for sx in (-w / 2, w / 2):
            faces.append(np.stack([np.full(per, sx),
                                   rng.uniform(-h / 2, h / 2, per),
                                   rng.uniform(0.2, d, per)], 1))
        for sy in (-h / 2, h / 2):
            faces.append(np.stack([rng.uniform(-w / 2, w / 2, per),
                                   np.full(per, sy),
                                   rng.uniform(0.2, d, per)], 1))
        faces.append(np.stack([rng.uniform(-w / 2, w / 2, m - 4 * per),
                               rng.uniform(-h / 2, h / 2, m - 4 * per),
                               np.full(m - 4 * per, d)], 1))
        return np.concatenate(faces)

    def sphere(m, c, r):
        v = rng.randn(m, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return c + r * v

    pts = np.concatenate([
        sample_box(n - 60_000),
        sphere(30_000, np.array([-1.0, -0.7, 4.0]), 0.8),
        sphere(30_000, np.array([1.5, 0.2, 6.5]), 1.1),
    ]).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return pts, cols


def main():
    kdup = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mpt = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    pts, cols = room_scene(n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    settings = RenderSettings(
        width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
        mode="pallas", max_tiles_per_gaussian=kdup, max_per_tile=mpt)
    bg = jnp.zeros(3)

    @jax.jit
    def fwd(params, live):
        s, q, o = gm.activated(params)
        shs = gm.sh_features(params)
        r = render(params.xyz, s, q, o, cam, settings, bg, shs=shs,
                   live_mask=live)
        return r.image, r.num_clipped, r.num_overflow

    img, cl, ov = fwd(state.params, state.live)
    img.block_until_ready()
    for _ in range(3):
        img, _, _ = fwd(state.params, state.live)
    img.block_until_ready()
    K = 30
    t0 = time.time()
    for _ in range(K):
        img, _, _ = fwd(state.params, state.live)
    img.block_until_ready()
    dt = time.time() - t0
    print(f"kdup={kdup} K={mpt}: {K / dt:.2f} FPS ({1000 * dt / K:.1f} ms) "
          f"clipped={int(cl)} overflow={int(ov)} mean={float(img.mean()):.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
