"""Backward-pass attribution at bench shapes (VERDICT r5 item 3).

BENCH_r04: fwd 17.67 ms, bwd 29.42 ms (loss fwd+bwd 47.1 ms) at
300k / 1200x680 / k_dup 6 / per_tile 1024. This tool splits the 29.4 ms
between (a) the pallas blend backward kernel, (b) the entry_gather
sort-routed transpose, (c) the preprocess-chain AD (cov2D/SH/cov3D + feature
pack), and (d) the image-space loss backward (L1+SSIM), each timed as an
isolated jitted program at identical shapes, reps >= 50.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bwd.py
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
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops import preprocess as prep_mod
    from photo_slam_tpu.ops import tiled as tiled_mod
    from photo_slam_tpu.ops.binning import bin_gaussians, tile_grid
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.losses import l1_loss, ssim
    from photo_slam_tpu.ops.pallas.blend import (FEAT, TILE_PS, _blend_bwd_call,
                                                 pallas_blend)
    from photo_slam_tpu.ops.preprocess import tight_extents
    from photo_slam_tpu.ops.render import RenderSettings, render

    n = 300_000
    width, height = 1200, 680
    fovx = 1.2
    k_dup, per_tile = 6, 1024
    rng = np.random.RandomState(0)
    pts, cols = bench.room_scene(n, rng)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0,
                                fovx, fovx * height / width)
    settings = RenderSettings(
        width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
        mode="pallas", max_tiles_per_gaussian=k_dup, max_per_tile=per_tile)
    bg = jnp.zeros(3)
    gt = jnp.asarray(rng.rand(3, height, width).astype(np.float32))
    live = state.live

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t1) / reps * 1000.0

    report = {}

    # Baseline: loss forward and full grad.
    def loss_of(p):
        sc, qu, op = gm.activated(p)
        res = render(p.xyz, sc, qu, op, cam, settings, bg,
                     shs=gm.sh_features(p), live_mask=live)
        return (0.8 * l1_loss(res.image, gt)
                + 0.2 * (1.0 - ssim(res.image, gt)))

    fwd_fn = jax.jit(loss_of)
    grad_fn = jax.jit(jax.value_and_grad(loss_of))
    ms_fwd = timeit(fwd_fn, state.params)
    ms_grad = timeit(grad_fn, state.params)
    report["fwd_ms"] = round(ms_fwd, 2)
    report["grad_ms"] = round(ms_grad, 2)
    report["bwd_ms"] = round(ms_grad - ms_fwd, 2)
    log(f"[bwd] loss fwd {ms_fwd:.2f} ms, fwd+bwd {ms_grad:.2f} ms, "
        f"bwd {ms_grad - ms_fwd:.2f} ms")

    # Precompute the binning + packed tiles once (host-visible residuals).
    sc, qu, op = gm.activated(state.params)
    prep = prep_mod.preprocess(
        state.params.xyz, sc, qu, cam.viewmatrix, cam.full_proj,
        cam.cam_center, width, height, settings.tan_fovx, settings.tan_fovy,
        sh_degree=3, shs=gm.sh_features(state.params), live_mask=live)
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

    # (a) blend kernel: fwd alone, then bwd alone.
    gather_fn = jax.jit(lambda f: tiled_mod.entry_gather(
        f, binning.tile_lists, binning.sorted_entries, binning.sorted_tiles,
        binning.starts, binning.tile_counts, binning.entry_counts, k_dup))
    data_tiles = jax.block_until_ready(gather_fn(feat))
    ms_gather_fwd = timeit(gather_fn, feat)

    blend_fwd = jax.jit(lambda d: pallas_blend(d, binning.tile_counts, gx,
                                               num_tiles))
    color, final_t, n_contrib = jax.block_until_ready(blend_fwd(data_tiles))
    ms_blend_fwd = timeit(blend_fwd, data_tiles)

    g_color = jnp.ones_like(color) * 1e-3
    g_t = jnp.ones_like(final_t) * 1e-3
    nc_max = jnp.max(n_contrib.reshape(num_tiles, -1), axis=-1)
    counts_eff = jnp.minimum(binning.tile_counts, nc_max).astype(jnp.int32)
    blend_bwd = jax.jit(lambda d, gc, gtt: _blend_bwd_call(
        d, counts_eff, final_t, n_contrib, gc, gtt, gx, num_tiles))
    d_data = jax.block_until_ready(blend_bwd(data_tiles, g_color, g_t))
    ms_blend_bwd = timeit(blend_bwd, data_tiles, g_color, g_t)

    # (b) entry_gather transpose alone.
    def eg_vjp(gd):
        _, vjp = jax.vjp(lambda f: tiled_mod.entry_gather(
            f, binning.tile_lists, binning.sorted_entries,
            binning.sorted_tiles, binning.starts, binning.tile_counts,
            binning.entry_counts, k_dup), feat)
        return vjp(gd)[0]

    eg_bwd = jax.jit(eg_vjp)
    d_feat = jax.block_until_ready(eg_bwd(d_data))
    ms_eg_bwd = timeit(eg_bwd, d_data)

    # (c) preprocess chain (params -> packed feat) fwd + vjp.
    def prep_feat(p):
        sc_, qu_, op_ = gm.activated(p)
        pr = prep_mod.preprocess(
            p.xyz, sc_, qu_, cam.viewmatrix, cam.full_proj, cam.cam_center,
            width, height, settings.tan_fovx, settings.tan_fovy, sh_degree=3,
            shs=gm.sh_features(p), live_mask=live)
        return jnp.concatenate([pr.means2d, pr.conics, op_[:, None], pr.rgb,
                                jnp.zeros((n, FEAT - 9), jnp.float32)], -1)

    prep_fwd = jax.jit(prep_feat)
    jax.block_until_ready(prep_fwd(state.params))
    ms_prep_fwd = timeit(prep_fwd, state.params)

    def prep_vjp(gd):
        _, vjp = jax.vjp(prep_feat, state.params)
        return vjp(gd)[0]

    prep_bwd = jax.jit(prep_vjp)
    jax.block_until_ready(prep_bwd(d_feat))
    ms_prep_grad = timeit(prep_bwd, d_feat)

    # (d) image loss fwd+bwd.
    def img_loss(img):
        return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

    img = jnp.asarray(rng.rand(3, height, width).astype(np.float32))
    loss_grad = jax.jit(jax.grad(img_loss))
    jax.block_until_ready(loss_grad(img))
    ms_loss_grad = timeit(loss_grad, img)

    report.update({
        "gather_fwd_ms": round(ms_gather_fwd, 2),
        "blend_fwd_ms": round(ms_blend_fwd, 2),
        "blend_bwd_ms": round(ms_blend_bwd, 2),
        "entry_gather_bwd_ms": round(ms_eg_bwd, 2),
        "prep_fwd_ms": round(ms_prep_fwd, 2),
        "prep_fwd_plus_bwd_ms": round(ms_prep_grad, 2),
        "img_loss_fwd_plus_bwd_ms": round(ms_loss_grad, 2),
    })
    log(f"[bwd] gather fwd {ms_gather_fwd:.2f} | blend fwd "
        f"{ms_blend_fwd:.2f} bwd {ms_blend_bwd:.2f} | eg transpose "
        f"{ms_eg_bwd:.2f} | prep fwd {ms_prep_fwd:.2f} fwd+bwd "
        f"{ms_prep_grad:.2f} | img loss f+b {ms_loss_grad:.2f}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
