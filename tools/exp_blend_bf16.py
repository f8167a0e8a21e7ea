"""Experiment: blend forward kernel with bf16 inner math.

tools/exp_vpu_dtype.py measured bf16 elementwise at ~1.8x f32 throughput on
the v5e VPU (exp is dtype-neutral). The blend kernels are VPU-op-bound
(~27 ops per entry-pixel pair), so running the quadratic/alpha/select chain
in bf16 should approach that factor. Precision: pixel coords must be
TILE-LOCAL (bf16 at x~1200 quantizes to 8 px; at local ~32 it is ~0.1 px),
the transmittance carry and color accumulators stay f32.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_blend_bf16.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photo_slam_tpu.ops.pallas.blend import (ALPHA_MAX, ALPHA_MIN, FEAT,
                                             T_EPS, TILE_PS, PIX_SUB,
                                             PIX_LANE, _blend_fwd_call)

GROUP = 64


def _fwd_kernel_bf16(counts_ref, tiles_x_ref, ids_ref, data_ref, color_ref,
                     t_ref, n_ref):
    g = pl.program_id(0)
    count = counts_ref[g]
    tiles_x = tiles_x_ref[0]
    t = ids_ref[g]
    # TILE-LOCAL pixel coords in bf16 (0..32 — exact in bf16 up to 1/8 px).
    p = (jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 0) * 128
         + jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 1))
    lx = (p % TILE_PS).astype(jnp.bfloat16)
    ly = (p // TILE_PS).astype(jnp.bfloat16)
    tx = (t % tiles_x).astype(jnp.float32) * TILE_PS
    ty = (t // tiles_x).astype(jnp.float32) * TILE_PS

    fzero = jnp.zeros((PIX_SUB, PIX_LANE), jnp.float32)
    init = (fzero, fzero, fzero,
            jnp.ones((PIX_SUB, PIX_LANE), jnp.float32),   # T stays f32
            jnp.zeros((PIX_SUB, PIX_LANE), jnp.int32),
            jnp.ones((PIX_SUB, PIX_LANE), jnp.float32))

    def gaussian_step(d, k, carry):
        cr, cg, cb, T, nc, alive_f = carry
        alive = alive_f > 0.0
        # Scalar part in f32 (exact), vector part in bf16.
        mx = (d[0] - tx).astype(jnp.bfloat16)
        my = (d[1] - ty).astype(jnp.bfloat16)
        dx = mx - lx
        dy = my - ly
        power = (-0.5 * (d[2].astype(jnp.bfloat16) * dx * dx
                         + d[4].astype(jnp.bfloat16) * dy * dy)
                 - d[3].astype(jnp.bfloat16) * dx * dy)
        alpha = jnp.minimum(jnp.bfloat16(ALPHA_MAX),
                            d[5].astype(jnp.bfloat16) * jnp.exp(power))
        contrib = (alive & (k < count) & (power <= 0)
                   & (alpha >= jnp.bfloat16(ALPHA_MIN)))
        alpha_f = alpha.astype(jnp.float32)
        test_T = T * (1.0 - alpha_f)
        done_now = contrib & (test_T < T_EPS)
        ok = contrib & ~done_now
        w = jnp.where(ok, alpha_f * T, 0.0)
        cr = cr + w * d[6]
        cg = cg + w * d[7]
        cb = cb + w * d[8]
        T = jnp.where(ok, test_T, T)
        nc = jnp.where(ok, k + 1, nc)
        alive_f = jnp.where(done_now, 0.0, alive_f)
        return cr, cg, cb, T, nc, alive_f

    def chunk_cond(state):
        k0, carry = state
        return (k0 < count) & (jnp.max(carry[5]) > 0.0)

    def chunk_body(state):
        k0, carry = state
        rows = data_ref[0, pl.ds(k0, GROUP)]
        for i in range(GROUP):
            carry = gaussian_step(rows[i], k0 + i, carry)
        return k0 + GROUP, carry

    _, (cr, cg, cb, T, nc, _) = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), init))
    color_ref[0, 0] = cr
    color_ref[0, 1] = cg
    color_ref[0, 2] = cb
    t_ref[0] = T
    n_ref[0] = nc


def call_bf16(data_tiles, counts, tiles_x, num_tiles):
    k = data_tiles.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((1, k, FEAT), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 3, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel_bf16,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, PIX_SUB, PIX_LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.int32),
        ],
    )(counts, jnp.full((1,), tiles_x, jnp.int32),
      jnp.arange(num_tiles, dtype=jnp.int32), data_tiles)


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.time() - t0) / reps * 1000:8.2f} ms",
          flush=True)
    return out


def main():
    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops.binning import bin_gaussians, tile_grid
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.preprocess import preprocess, tight_extents
    from photo_slam_tpu.ops.tiled import entry_gather
    from bench_room import room_scene

    n = 300_000
    width, height, fovx = 1200, 680, 1.2
    pts, cols = room_scene(n)
    state = gm.create_from_pcd(pts, cols, sh_degree=3, capacity=n)
    cam = build_camera_matrices(np.eye(3), np.zeros(3), 0.01, 100.0, fovx,
                                fovx * height / width)
    p = state.params
    sc, qu, op = gm.activated(p)
    prep = jax.jit(lambda: preprocess(
        p.xyz, sc, qu, cam.viewmatrix, cam.full_proj, cam.cam_center,
        width, height, float(np.tan(fovx / 2)),
        float(np.tan(fovx / 2) * height / width), sh_degree=3,
        shs=gm.sh_features(p), live_mask=state.live))()
    extents = jax.jit(lambda: tight_extents(prep.conics, op, prep.radii))()
    feat = jnp.concatenate([prep.means2d, prep.conics, op[:, None], prep.rgb,
                            jnp.zeros((n, FEAT - 9), jnp.float32)], -1)
    gx, gy = tile_grid(width, height, 32)
    t32 = gx * gy
    b = jax.jit(lambda: bin_gaussians(
        prep.means2d, prep.depths, prep.radii, prep.visible, width, height,
        tile=32, max_tiles_per_gaussian=6, max_per_tile=1024,
        extents=extents))()
    data = jax.jit(lambda: entry_gather(
        feat, b.tile_lists, b.sorted_entries, b.sorted_tiles, b.starts,
        b.tile_counts, b.entry_counts, 6))()
    print(f"entries={int(jnp.sum(b.tile_counts))}", flush=True)

    cur = jax.jit(lambda d, c: _blend_fwd_call(d, c, gx, t32))
    o32 = timeit("f32 production fwd kernel", cur, data, b.tile_counts)
    bf = jax.jit(lambda d, c: call_bf16(d, c, gx, t32))
    obf = timeit("bf16 inner-math fwd kernel", bf, data, b.tile_counts)

    a = np.asarray(o32[0])
    c = np.asarray(obf[0])
    mse = float(np.mean((a - c) ** 2))
    print(f"color PSNR bf16-vs-f32: {10 * np.log10(1.0 / max(mse, 1e-12)):.2f} dB"
          f"  maxT diff {np.abs(np.asarray(o32[1]) - np.asarray(obf[1])).max():.2e}"
          f"  nc diff {np.abs(np.asarray(o32[2]) - np.asarray(obf[2])).max()}",
          flush=True)


if __name__ == "__main__":
    main()
