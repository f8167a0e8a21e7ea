"""Stage-by-stage render profiling on the real chip (diagnostics only)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops import binning as bin_mod
from photo_slam_tpu.ops import preprocess as prep_mod
from photo_slam_tpu.ops import tiled as tiled_mod
from photo_slam_tpu.ops.camera_math import build_camera_matrices


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt * 1000:8.2f} ms", file=sys.stderr, flush=True)
    return out


def main():
    n = 200_000
    width, height = 1200, 680
    fovx = 1.2
    k_dup = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k_tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 32
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
    tanx = float(np.tan(fovx / 2))
    tany = tanx * height / width
    scales, quats, opac = gm.activated(state.params)
    shs = gm.sh_features(state.params)

    prep_fn = jax.jit(lambda xyz, s, q, sh_: prep_mod.preprocess(
        xyz, s, q, cam.viewmatrix, cam.full_proj, cam.cam_center,
        width, height, tanx, tany, sh_degree=3, shs=sh_,
        live_mask=state.live))
    prep = timeit("preprocess", prep_fn, state.params.xyz, scales, quats, shs)

    bin_fn = jax.jit(lambda p: bin_mod.bin_gaussians(
        p.means2d, p.depths, p.radii, p.visible, width, height,
        max_tiles_per_gaussian=k_dup, max_per_tile=k_tile))
    binning = timeit(f"binning (k_dup={k_dup})", bin_fn, prep)
    print(f"  clipped={int(binning.num_clipped)} "
          f"overflow={int(binning.num_overflow)} "
          f"max_count={int(binning.tile_counts.max())} "
          f"mean_count={float(binning.tile_counts.mean()):.0f}",
          file=sys.stderr)

    blend_fn = jax.jit(lambda p, b, o: tiled_mod.render_binned(
        p, o, b, width, height, jnp.zeros(3), tiles_per_chunk=chunk,
        k_dup=k_dup))
    timeit(f"blend (K={k_tile},chunk={chunk})", blend_fn, prep, binning, opac)

    full = jax.jit(lambda xyz, s, q, sh_, o: tiled_mod.render_tiled(
        prep_fn(xyz, s, q, sh_), o, width, height, jnp.zeros(3),
        max_tiles_per_gaussian=k_dup, max_per_tile=k_tile,
        tiles_per_chunk=chunk)[0].image)
    timeit("full render", full, state.params.xyz, scales, quats, shs, opac)

    # Sub-stages of binning
    def sort_only(p):
        order = jnp.argsort(jnp.where(p.visible, p.depths, jnp.inf))
        return order
    timeit("depth argsort (N)", jax.jit(sort_only), prep)

    def big_sort(p):
        nn = p.means2d.shape[0]
        ids = jax.random.randint(jax.random.PRNGKey(0), (nn * k_dup,), 0,
                                 3226).astype(jnp.int32)
        vals = jnp.arange(nn * k_dup, dtype=jnp.int32)
        s = jax.lax.sort((ids, vals), num_keys=1, is_stable=True)
        return s[0]
    timeit(f"flat stable sort ({n * k_dup / 1e6:.1f}M)", jax.jit(big_sort), prep)


if __name__ == "__main__":
    main()
