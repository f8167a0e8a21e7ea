"""Full train-step benchmark on the room scene (diagnostics)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.config import Config
from photo_slam_tpu.mapper.trainer import GaussianTrainer, train_step
from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.models import optimizer as optim
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.render import RenderSettings
from bench_room import room_scene  # noqa: E402  (tools/ sibling)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    width, height = 1200, 680
    fovx = 1.2
    pts, cols = room_scene(n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    opt_state = optim.init_adam(state.params)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    settings = RenderSettings(
        width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
        mode=mode, max_tiles_per_gaussian=8, max_per_tile=1024,
        tiles_per_chunk=32)
    lrs = optim.LearningRates.create(1.6e-4, 2.5e-3, 0.05, 5e-3, 1e-3)
    gt = jnp.asarray(np.random.RandomState(1).rand(3, height, width)
                     .astype(np.float32))
    mask = jnp.ones((height, width), jnp.float32)
    bg = jnp.zeros(3)
    lam = jnp.float32(0.2)

    t0 = time.time()
    state, opt_state, m = train_step(state, opt_state, cam, gt, mask, lrs,
                                     bg, lam, settings)
    jax.block_until_ready(m["loss"])
    print(f"[{mode}] train_step compile+first {time.time() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}", file=sys.stderr)

    for _ in range(3):
        state, opt_state, m = train_step(state, opt_state, cam, gt, mask,
                                         lrs, bg, lam, settings)
    jax.block_until_ready(m["loss"])
    K = 20
    t0 = time.time()
    for _ in range(K):
        state, opt_state, m = train_step(state, opt_state, cam, gt, mask,
                                         lrs, bg, lam, settings)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    print(f"[{mode}] train_step: {K / dt:.2f} iters/s "
          f"({1000 * dt / K:.1f} ms/iter) N={n}", file=sys.stderr)


if __name__ == "__main__":
    main()
