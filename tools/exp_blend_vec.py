"""Experiment: group-vectorized blend forward kernel vs the production
per-gaussian-unrolled kernel (ops/pallas/blend._fwd_kernel).

The production kernel processes one Gaussian at a time against the (8,128)
pixel tile — per Gaussian it issues ~16 scalar extracts + ~24 vector ops and
carries a serial T-dependency. The vectorized variant processes G=64
Gaussians as [G, 1024] arrays: no scalar extraction, exp on big batches, the
per-gaussian color FMAs become ONE MXU matmul, and the transmittance chain
becomes a log2(G) doubling prefix product. Same early-exit granularity
(group-level), identical semantics (ok_k = contrib_k & (S_k >= eps) — see
ops/dense.py docstring for why the prefix form is exact).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photo_slam_tpu.ops.pallas.blend import (ALPHA_MAX, ALPHA_MIN, FEAT,
                                             PIX_LANE, PIX_SUB, T_EPS,
                                             TILE_PS, _blend_fwd_call)

GRP = 64
P = PIX_SUB * PIX_LANE


def _fwd_kernel_vec(counts_ref, tiles_x_ref, data_ref, color_ref, t_ref,
                    n_ref):
    g = pl.program_id(0)
    count = counts_ref[g]
    tiles_x = tiles_x_ref[0]
    t = g  # identity tile ids for the experiment
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (GRP, P), 1)
    pxv = tx * TILE_PS + (pix % TILE_PS).astype(jnp.float32)
    pyv = ty * TILE_PS + (pix // TILE_PS).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (GRP, P), 0)

    ones_row = jnp.ones((1, P), jnp.float32)
    init = (jnp.zeros((3, P), jnp.float32),   # color
            ones_row,                          # T carry
            jnp.zeros((1, P), jnp.int32),      # n_contrib
            ones_row,                          # alive
            jnp.int32(0))

    def cond(state):
        _, T, _, alive, k0 = state
        return (k0 < count) & (jnp.max(alive) > 0.0)

    def body(state):
        color, T, nc, alive, k0 = state
        rows = data_ref[0, pl.ds(k0, GRP)]          # [GRP, 16]
        mx = rows[:, 0:1]
        my = rows[:, 1:2]
        ca = rows[:, 2:3]
        cb = rows[:, 3:4]
        cc = rows[:, 4:5]
        op = rows[:, 5:6]
        dx = mx - pxv
        dy = my - pyv
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        contrib = ((alive > 0.0) & (rowi + k0 < count) & (power <= 0.0)
                   & (alpha >= ALPHA_MIN))
        om = jnp.where(contrib, 1.0 - alpha, 1.0)
        # Inclusive prefix product along the gaussian axis (doubling).
        s_loc = om
        shift = 1
        while shift < GRP:
            rolled = pltpu.roll(s_loc, shift, 0)
            s_loc = s_loc * jnp.where(rowi >= shift, rolled, 1.0)
            shift *= 2
        S = T * s_loc
        t_prev = S / om
        ok = contrib & (S >= T_EPS)
        w = jnp.where(ok, alpha * t_prev, 0.0)
        color = color + jax.lax.dot_general(
            rows[:, 6:9], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        nc = jnp.maximum(nc, jnp.max(jnp.where(ok, rowi + k0 + 1, 0),
                                     axis=0, keepdims=True))
        # Mosaic has no reduce_prod: total product of the APPLIED (1-alpha)
        # factors via the same doubling ladder, last row = full product.
        omp = jnp.where(ok, om, 1.0)
        shift = 1
        while shift < GRP:
            omp = omp * jnp.where(rowi >= shift,
                                  pltpu.roll(omp, shift, 0), 1.0)
            shift *= 2
        T = T * omp[GRP - 1:GRP, :]
        dead = jnp.max(jnp.where(contrib & (S < T_EPS), 1.0, 0.0), axis=0,
                       keepdims=True)
        alive = jnp.where(dead > 0.0, 0.0, alive)
        return color, T, nc, alive, k0 + GRP

    color, T, nc, _, _ = jax.lax.while_loop(cond, body, init)
    color_ref[0, 0] = color[0].reshape(PIX_SUB, PIX_LANE)
    color_ref[0, 1] = color[1].reshape(PIX_SUB, PIX_LANE)
    color_ref[0, 2] = color[2].reshape(PIX_SUB, PIX_LANE)
    t_ref[0] = T.reshape(PIX_SUB, PIX_LANE)
    n_ref[0] = nc.reshape(PIX_SUB, PIX_LANE)


def blend_vec(data_tiles, counts, tiles_x, num_tiles):
    k = data_tiles.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((1, k, FEAT), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 3, PIX_SUB, PIX_LANE),
                         lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel_vec,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, PIX_SUB, PIX_LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.int32),
        ],
    )(counts, jnp.full((1,), tiles_x, jnp.int32), data_tiles)


def make_data(num_tiles, k, gx, seed=0, density=0.6):
    rng = np.random.RandomState(seed)
    data = np.zeros((num_tiles, k, FEAT), np.float32)
    counts = np.minimum((rng.rand(num_tiles) * k * 1.2).astype(np.int32), k)
    for t in range(num_tiles):
        c = counts[t]
        tx, ty = t % gx, t // gx
        data[t, :c, 0] = tx * 32 + rng.rand(c) * 32        # mean x
        data[t, :c, 1] = ty * 32 + rng.rand(c) * 32        # mean y
        inv_s2 = 1.0 / rng.uniform(2.0, 40.0, c)           # conic
        data[t, :c, 2] = inv_s2
        data[t, :c, 4] = inv_s2 * rng.uniform(0.5, 2.0, c)
        data[t, :c, 3] = 0.0
        # Low opacities: the production workload's tight-extent entries keep
        # per-pixel transmittance alive for hundreds of entries (no early
        # exit) — high alphas here would let BOTH kernels exit after one
        # group and measure nothing.
        data[t, :c, 5] = rng.uniform(0.01, 0.1, c)         # opacity
        data[t, :c, 6:9] = rng.rand(c, 3)
    return jnp.asarray(data), jnp.asarray(counts)


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.time() - t0) / reps * 1000:8.2f} ms",
          flush=True)
    return out


def real_data(n=300_000):
    """The production workload: room scene -> preprocess -> binning ->
    entry_gather, exactly profile_train's pipeline."""
    from photo_slam_tpu.models import gaussian_model as gm
    from photo_slam_tpu.ops.binning import bin_gaussians
    from photo_slam_tpu.ops.camera_math import build_camera_matrices
    from photo_slam_tpu.ops.preprocess import preprocess, tight_extents
    from photo_slam_tpu.ops.tiled import entry_gather
    from bench_room import room_scene

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
    binning = jax.jit(lambda: bin_gaussians(
        prep.means2d, prep.depths, prep.radii, prep.visible, width, height,
        tile=32, max_tiles_per_gaussian=6, max_per_tile=1024,
        extents=tight_extents(prep.conics, op, prep.radii)))()
    feat = jnp.concatenate([prep.means2d, prep.conics, op[:, None],
                            prep.rgb,
                            jnp.zeros((n, FEAT - 9), jnp.float32)], -1)
    data = entry_gather(feat, binning.tile_lists, binning.sorted_entries,
                        binning.sorted_tiles, binning.starts,
                        binning.tile_counts, binning.entry_counts, 6)
    gx = -(-width // 32)
    return data, binning.tile_counts, gx, binning.tile_counts.shape[0]


def main():
    gx, gy, k = 38, 22, 1024
    num_tiles = gx * gy
    data, counts = make_data(num_tiles, k, gx)
    cur = jax.jit(lambda d, c: _blend_fwd_call(d, c, gx, num_tiles))
    vec = jax.jit(lambda d, c: blend_vec(d, c, gx, num_tiles))
    o1 = timeit("current fwd kernel (synthetic)", cur, data, counts)
    o2 = timeit("vectorized fwd kernel (synthetic)", vec, data, counts)
    for a, b, name in zip(o1, o2, ("color", "T", "nc")):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        print(f"max |d {name}| = {d.max():.3e}")

    data, counts, gx2, nt2 = real_data()
    print(f"real workload: entries={int(jnp.sum(counts))} tiles={nt2}",
          flush=True)
    cur2 = jax.jit(lambda d, c: _blend_fwd_call(d, c, gx2, nt2))
    vec2 = jax.jit(lambda d, c: blend_vec(d, c, gx2, nt2))
    r1 = timeit("current fwd kernel (real)", cur2, data, counts)
    r2 = timeit("vectorized fwd kernel (real)", vec2, data, counts)
    for a, b, name in zip(r1, r2, ("color", "T", "nc")):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        print(f"real max |d {name}| = {d.max():.3e}")


if __name__ == "__main__":
    main()
