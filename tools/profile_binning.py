"""Stage-level timing of bin_gaussians + blend saturation stats.

Splits the binning step (the render forward's largest cost after the blend
kernel) into its primitives — key build, the big sort, boundary search, and
the tile_lists window gather — and reports how early the blend's
transmittance saturates per tile (bounds what the kernel's early exit can
save). Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_binning.py [k_dup]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.ops.binning import bin_gaussians, compute_rects, tile_grid
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.preprocess import preprocess, tight_extents
from bench_room import room_scene


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.time() - t0) / reps * 1000:8.2f} ms",
          flush=True)
    return out


def main():
    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    k_dup = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_per_tile = 1024
    tile = 32
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy

    pts, cols = room_scene(n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    params = state.params
    sc, qu, op = gm.activated(params)
    prep = jax.jit(lambda p: preprocess(
        p.xyz, gm.activated(p)[0], gm.activated(p)[1], cam.viewmatrix,
        cam.full_proj, cam.cam_center, width, height,
        float(np.tan(fovx / 2)), float(np.tan(fovx / 2) * height / width),
        sh_degree=3, shs=gm.sh_features(p), live_mask=state.live))(params)
    ext = tight_extents(prep.conics, op, prep.radii)

    full = jax.jit(lambda pr, e: bin_gaussians(
        pr.means2d, pr.depths, pr.radii, pr.visible, width, height,
        tile=tile, max_tiles_per_gaussian=k_dup, max_per_tile=max_per_tile,
        extents=e))
    binning = timeit(f"bin_gaussians total (k={k_dup})", full, prep, ext)

    # --- primitives ----------------------------------------------------
    depth_bits = 31 - max(1, (num_tiles + 1)).bit_length()

    def build_keys(pr, e):
        x0, y0, x1, y1 = compute_rects(pr.means2d, pr.radii, width, height,
                                       tile, extents=e)
        depth_code = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(jnp.maximum(pr.depths, 0.0),
                                         jnp.int32), 31 - depth_bits)
        slots = jnp.arange(k_dup, dtype=jnp.int32)
        rw = jnp.maximum(x1 - x0, 1)
        sx = x0[:, None] + slots[None, :] % rw[:, None]
        sy = y0[:, None] + slots[None, :] // rw[:, None]
        valid = slots[None, :] < ((x1 - x0) * (y1 - y0))[:, None]
        tid = (sy * gx + sx).astype(jnp.int32)
        sentinel = jnp.int32(num_tiles) << depth_bits
        return jnp.where(valid, (tid << depth_bits) | depth_code[:, None],
                         sentinel).reshape(-1)

    keys = timeit("  key build", jax.jit(build_keys), prep, ext)
    ents = jnp.arange(n * k_dup, dtype=jnp.int32)
    sort_fn = jax.jit(lambda k, e: jax.lax.sort((k, e), num_keys=1,
                                                is_stable=False))
    sk, se = timeit(f"  sort ({n * k_dup / 1e6:.1f}M)", sort_fn, keys, ents)
    bounds_fn = jax.jit(lambda s: jnp.searchsorted(
        s, jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits,
        side="left").astype(jnp.int32))
    bounds = timeit("  boundary search", bounds_fn, sk)
    starts = bounds[:-1]
    counts = jnp.minimum(bounds[1:] - starts, max_per_tile)

    def window_gather(s, st):
        idx = st[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
        idx = jnp.clip(idx, 0, s.shape[0] - 1)
        return jnp.take(s, idx)

    timeit("  tile_lists window gather", jax.jit(window_gather), se, starts)

    # --- blend saturation stats ---------------------------------------
    from photo_slam_tpu.ops.render import RenderSettings, render
    settings = RenderSettings(width=width, height=height,
                              tan_fovx=float(np.tan(fovx / 2)),
                              tan_fovy=float(np.tan(fovx / 2) * height / width),
                              sh_degree=3, mode="pallas",
                              max_tiles_per_gaussian=k_dup,
                              max_per_tile=max_per_tile)
    res = render(params.xyz, sc, qu, op, cam, settings, jnp.zeros(3),
                 shs=gm.sh_features(params), live_mask=state.live)
    nc = np.asarray(res.n_contrib)  # [H, W] contributors counted per pixel
    ft = np.asarray(res.final_T)
    cnts = np.asarray(counts)
    print(f"tile counts: mean={cnts.mean():.0f} p50={np.percentile(cnts, 50):.0f} "
          f"p90={np.percentile(cnts, 90):.0f} max={cnts.max()}", flush=True)
    print(f"n_contrib px: mean={nc.mean():.0f} p90={np.percentile(nc, 90):.0f} "
          f"max={nc.max()}", flush=True)
    print(f"final_T: mean={ft.mean():.3f} frac>1e-4={np.mean(ft > 1e-4):.3f}",
          flush=True)


if __name__ == "__main__":
    main()
