"""Component-level timing of the train step at bench scale (diagnostics).

Times each stage of the pipeline in isolation so kernel work can be
prioritized: binning, the packed-entry gather + its transpose, the pallas
blend forward/backward, SSIM, preprocess AD, and the Adam update.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from photo_slam_tpu.models import gaussian_model as gm
from photo_slam_tpu.models import optimizer as optim
from photo_slam_tpu.ops import losses
from photo_slam_tpu.ops.binning import bin_gaussians, tile_grid
from photo_slam_tpu.ops.camera_math import build_camera_matrices
from photo_slam_tpu.ops.preprocess import preprocess
from photo_slam_tpu.ops.render import RenderSettings, render
from photo_slam_tpu.ops.tiled import entry_gather
from photo_slam_tpu.ops.pallas.blend import FEAT, TILE_PS, pallas_blend
from bench_room import room_scene


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    width, height = 1200, 680
    fovx = 1.2
    k_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    max_per_tile = 1024
    print(f"[profile] building scene N={n}", flush=True)
    pts, cols = room_scene(n)
    print("[profile] create_from_pcd (KNN scale init)...", flush=True)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    jax.block_until_ready(state.params.xyz)
    print("[profile] setup done", flush=True)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    settings = RenderSettings(
        width=width, height=height, tan_fovx=float(np.tan(fovx / 2)),
        tan_fovy=float(np.tan(fovx / 2) * height / width), sh_degree=3,
        mode="pallas", max_tiles_per_gaussian=k_dup,
        max_per_tile=max_per_tile)
    bg = jnp.zeros(3)
    live = state.live
    params = state.params
    scales, quats, opac = gm.activated(params)
    shs = gm.sh_features(params)

    tile = TILE_PS
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy

    prep_fn = jax.jit(lambda p: preprocess(
        p.xyz, gm.activated(p)[0], gm.activated(p)[1],
        cam.viewmatrix, cam.full_proj, cam.cam_center,
        width, height, settings.tan_fovx, settings.tan_fovy,
        sh_degree=3, shs=gm.sh_features(p), live_mask=live))
    prep = timeit("preprocess fwd", prep_fn, params)

    bin_fn = jax.jit(lambda pr: bin_gaussians(
        pr.means2d, pr.depths, pr.radii, pr.visible, width, height,
        tile=tile, max_tiles_per_gaussian=k_dup, max_per_tile=max_per_tile))
    binning = timeit("binning", bin_fn, prep)
    print(f"  clipped={int(binning.num_clipped)} "
          f"overflow={int(binning.num_overflow)} "
          f"total_entries={int(jnp.sum(binning.tile_counts))}")

    opacities = gm.activated(params)[2]
    feat = jnp.concatenate([
        prep.means2d, prep.conics, opacities[:, None], prep.rgb,
        jnp.zeros((n, FEAT - 9), jnp.float32)], axis=-1)

    gather_fn = jax.jit(lambda f, b: entry_gather(
        f, b.tile_lists, b.sorted_entries, b.sorted_tiles, b.starts,
        b.tile_counts, b.entry_counts, k_dup))
    data_tiles = timeit("entry_gather fwd", gather_fn, feat, binning)

    gather_vjp = jax.jit(lambda f, b: jax.vjp(
        lambda ff: entry_gather(ff, b.tile_lists, b.sorted_entries,
                                b.sorted_tiles, b.starts, b.tile_counts,
                                b.entry_counts, k_dup), f)[1](data_tiles))
    timeit("entry_gather bwd (transpose)", gather_vjp, feat, binning)

    blend_fn = jax.jit(lambda d, c: pallas_blend(d, c, gx, num_tiles))
    color, final_t, n_contrib = timeit("pallas_blend fwd", blend_fn,
                                       data_tiles, binning.tile_counts)

    g_out = (jnp.ones_like(color), jnp.ones_like(final_t))

    def blend_grad(d, c):
        outs, vjp = jax.vjp(
            lambda dd: pallas_blend(dd, c, gx, num_tiles)[:2], d)
        return vjp(g_out)

    timeit("pallas_blend fwd+bwd", jax.jit(blend_grad), data_tiles,
           binning.tile_counts)

    # --- transpose internals -------------------------------------------
    n_entries = n * k_dup
    se = binning.sorted_entries
    timeit("  argsort(sorted_entries)",
           jax.jit(lambda s: jnp.argsort(s).astype(jnp.int32)), se)
    inv = jnp.argsort(se).astype(jnp.int32)
    st = binning.sorted_tiles
    starts = binning.starts
    tc = binning.tile_counts
    timeit("  tile/slot lookup",
           jax.jit(lambda i: (jnp.take(st, i),
                              i - jnp.take(starts, jnp.clip(jnp.take(st, i),
                                                            0, num_tiles - 1)))),
           inv)
    g_flat = jnp.zeros((num_tiles * max_per_tile, FEAT), jnp.float32)
    t_idx = jnp.clip(jnp.take(st, inv), 0, num_tiles - 1)
    k_idx = inv - jnp.take(starts, t_idx)
    gidx = jnp.clip(t_idx * max_per_tile + k_idx, 0,
                    num_tiles * max_per_tile - 1)
    timeit("  row gather [E,16]",
           jax.jit(lambda g, i: jnp.take(g, i, axis=0)), g_flat, gidx)
    rows = jnp.zeros((n_entries, FEAT), jnp.float32)
    timeit("  reshape-sum to [N,16]",
           jax.jit(lambda r: r.reshape(n, k_dup, FEAT).sum(axis=1)), rows)

    gt = jnp.asarray(np.random.RandomState(1).rand(3, height, width)
                     .astype(np.float32))
    img = jnp.asarray(np.random.RandomState(2).rand(3, height, width)
                      .astype(np.float32))
    ssim_fn = jax.jit(jax.value_and_grad(lambda a: losses.ssim(a, gt)))
    timeit("ssim fwd+bwd", ssim_fn, img)
    l1_fn = jax.jit(jax.value_and_grad(lambda a: losses.l1_loss(a, gt)))
    timeit("l1 fwd+bwd", l1_fn, img)

    # Full render fwd (jit, no grad)
    rend_fn = jax.jit(lambda p: render(
        p.xyz, gm.activated(p)[0], gm.activated(p)[1], gm.activated(p)[2],
        cam, settings, bg, shs=gm.sh_features(p), live_mask=live).image)
    timeit("render fwd (full)", rend_fn, params)

    # Full loss grad
    def loss_fn(p):
        sc, qu, op = gm.activated(p)
        res = render(p.xyz, sc, qu, op, cam, settings, bg,
                     shs=gm.sh_features(p), live_mask=live)
        return (0.8 * losses.l1_loss(res.image, gt)
                + 0.2 * (1.0 - losses.ssim(res.image, gt)))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    timeit("full loss fwd+bwd", grad_fn, params)

    # Adam
    opt_state = optim.init_adam(params)
    lrs = optim.LearningRates.create(1.6e-4, 2.5e-3, 0.05, 5e-3, 1e-3)
    _, grads = jax.jit(jax.value_and_grad(
        lambda p: jnp.sum(jnp.square(p.xyz)) * 0))(params)
    adam_fn = jax.jit(lambda p, g, o: optim.adam_step(p, g, o, lrs, live))
    timeit("adam step", adam_fn, params, grads, opt_state)


if __name__ == "__main__":
    main()
