"""Quick pallas-path benchmark on the current default device (diagnostics)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings, render


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    width, height = 1200, 680
    fovx = 1.2
    rng = np.random.RandomState(0)
    z = rng.uniform(1.5, 12.0, n)
    x = rng.uniform(-0.9, 0.9, n) * z * np.tan(fovx / 2)
    y = rng.uniform(-0.9, 0.9, n) * z * np.tan(fovx / 2) * height / width
    pts = np.stack([x, y, z], 1).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    cap = gm.round_capacity(n, minimum=n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=cap)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    settings = RenderSettings(
        width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
        mode=mode, max_tiles_per_gaussian=16, max_per_tile=1024,
        tiles_per_chunk=32)
    bg = jnp.zeros(3)

    @jax.jit
    def fwd(params, live):
        s, q, o = gm.activated(params)
        shs = gm.sh_features(params)
        r = render(params.xyz, s, q, o, cam, settings, bg, shs=shs,
                   live_mask=live)
        return r.image

    @jax.jit
    def fwd_bwd(params, live, gt):
        def loss(p):
            s, q, o = gm.activated(p)
            shs = gm.sh_features(p)
            r = render(p.xyz, s, q, o, cam, settings, bg, shs=shs,
                       live_mask=live)
            return jnp.mean((r.image - gt) ** 2)
        return jax.grad(loss)(params).xyz

    t0 = time.time()
    img = fwd(state.params, state.live)
    img.block_until_ready()
    print(f"[{mode}] compile+first: {time.time() - t0:.1f}s "
          f"mean={float(img.mean()):.4f}", file=sys.stderr)
    for _ in range(3):
        img = fwd(state.params, state.live)
    img.block_until_ready()
    K = 20
    t0 = time.time()
    for _ in range(K):
        img = fwd(state.params, state.live)
    img.block_until_ready()
    dt = time.time() - t0
    print(f"[{mode}] render: {K / dt:.2f} FPS ({1000 * dt / K:.1f} ms/frame)",
          file=sys.stderr)

    gt = jnp.zeros((3, height, width))
    t0 = time.time()
    g = fwd_bwd(state.params, state.live, gt)
    g.block_until_ready()
    print(f"[{mode}] fwd+bwd compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr)
    K = 10
    t0 = time.time()
    for _ in range(K):
        g = fwd_bwd(state.params, state.live, gt)
    g.block_until_ready()
    dt = time.time() - t0
    print(f"[{mode}] fwd+bwd: {K / dt:.2f} steps/s ({1000 * dt / K:.1f} ms)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
