"""Sweep blend-backward kernel variants at bench shapes: group size x
merged-moment-matmul, reporting ms per call (reps=50). Also re-measures the
forward kernel and the end-to-end grad step with the best setting applied.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd_sweep.py
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = Path(os.environ.get("SOAK_JAX_CACHE",
                                    "/tmp/soak30k_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops import preprocess as prep_mod
    from photo_slam_tpu.ops import tiled as tiled_mod
    from photo_slam_tpu.ops.binning import bin_gaussians, tile_grid
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.pallas import blend as blend_mod
    from photo_slam_tpu.ops.pallas.blend import (FEAT, TILE_PS,
                                                 _blend_bwd_call,
                                                 pallas_blend)
    from photo_slam_tpu.ops.preprocess import tight_extents

    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    k_dup, per_tile = 6, 1024
    rng = np.random.RandomState(0)
    pts, cols = bench.room_scene(n, rng)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                fovx, fovx * height / width)
    sc, qu, op = gm.activated(state.params)
    prep = prep_mod.preprocess(
        state.params.xyz, sc, qu, cam.viewmatrix, cam.full_proj,
        cam.cam_center, width, height, float(np.tan(fovx / 2)),
        float(np.tan(fovx / 2) * height / width), sh_degree=3,
        shs=gm.sh_features(state.params), live_mask=state.live)
    tile = TILE_PS
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy
    binning = bin_gaussians(prep.means2d, prep.depths, prep.radii,
                            prep.visible, width, height, tile=tile,
                            max_tiles_per_gaussian=k_dup,
                            max_per_tile=per_tile,
                            extents=tight_extents(prep.conics, op,
                                                  prep.radii))
    feat = jnp.concatenate([prep.means2d, prep.conics, op[:, None], prep.rgb,
                            jnp.zeros((n, FEAT - 9), jnp.float32)], -1)
    data_tiles = jax.block_until_ready(jax.jit(
        lambda f: tiled_mod.entry_gather(
            f, binning.tile_lists, binning.sorted_entries,
            binning.sorted_tiles, binning.starts, binning.tile_counts,
            binning.entry_counts, k_dup))(feat))
    color, final_t, n_contrib = jax.block_until_ready(jax.jit(
        lambda d: pallas_blend(d, binning.tile_counts, gx, num_tiles))(
        data_tiles))
    g_color = jnp.ones_like(color) * 1e-3
    g_t = jnp.ones_like(final_t) * 1e-3
    nc_max = jnp.max(n_contrib.reshape(num_tiles, -1), axis=-1)
    counts_eff = jnp.minimum(binning.tile_counts, nc_max).astype(jnp.int32)

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t1) / reps * 1000.0

    results = {}
    ref = None
    sweep = [(64, "0", "roll"), (64, "0", "mxu"), (128, "0", "mxu"),
             (32, "0", "mxu"), (64, "1", "mxu")]
    for group, merge, ladder in sweep:
        os.environ["PS_BWD_GROUP"] = str(group)
        os.environ["PS_BWD_MERGE"] = merge
        os.environ["PS_BWD_LADDER"] = ladder
        fn = jax.jit(lambda d, gc, gtt: _blend_bwd_call(
            d, counts_eff, final_t, n_contrib, gc, gtt, gx, num_tiles))
        out = jax.block_until_ready(fn(data_tiles, g_color, g_t))
        if ref is None:
            ref = np.asarray(out)
        else:
            err = np.abs(np.asarray(out) - ref).max() / (
                np.abs(ref).max() + 1e-9)
            assert err < 1e-4, (
                f"variant g{group} m{merge} {ladder} diverged {err}")
        ms = timeit(fn, data_tiles, g_color, g_t)
        results[f"g{group}_m{merge}_{ladder}"] = round(ms, 2)
        log(f"[sweep] group={group} merge={merge} ladder={ladder}: "
            f"{ms:.2f} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
