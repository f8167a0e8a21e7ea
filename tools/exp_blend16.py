"""Experiment: 16x16-binned, quadrant-packed blend forward kernel.

The production kernel bins at 32x32 (one [8,128] f32 vreg per tile), so a
Gaussian touching any part of a tile pays math on all 1024 pixels. Measured
on the bench scene the footprint sum is 84M px but the 32-tile entry-pixel
pairs are 511M (6.1x quantization waste); binning at 16x16 cuts pairs to
265M even after packing 2x2 adjacent 16-tiles into one [8,128] program
(work per program = max of the 4 subtile counts).

Packing: sublane band 2q..2q+1 of the [8,128] vreg = quadrant q's 256
pixels (16x16). The per-entry data slab is pre-expanded in XLA to
[B, K, 8, 16] (quadrant rows repeated 2x along sublanes), so the kernel
loads [8,16] per entry k and broadcasts [8,1] column slices against the
[8,128] pixel arrays — each sublane band blends its own quadrant's entry
stream simultaneously, per-pair math identical to the production kernel.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_blend16.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photo_slam_tpu.ops.pallas.blend import (ALPHA_MAX, ALPHA_MIN, FEAT,
                                             T_EPS, _blend_fwd_call)

GROUP = 64


def _fwd_kernel16(counts_ref, data_ref, color_ref, t_ref, n_ref):
    g = pl.program_id(0)
    c0 = counts_ref[4 * g]
    c1 = counts_ref[4 * g + 1]
    c2 = counts_ref[4 * g + 2]
    c3 = counts_ref[4 * g + 3]
    count_max = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))

    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    p_loc = (rowi % 2) * 128 + lane           # 0..255 within the quadrant
    lx = (p_loc % 16).astype(jnp.float32)     # quadrant-local pixel coords
    ly = (p_loc // 16).astype(jnp.float32)
    # Entry means arrive pre-shifted to quadrant-local coords (XLA side),
    # so the kernel needs no tile/quadrant origin at all.
    count_vec = jnp.where(rowi < 2, c0,
                          jnp.where(rowi < 4, c1,
                                    jnp.where(rowi < 6, c2, c3)))

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (zero, zero, zero,
            jnp.ones((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.int32),
            jnp.ones((8, 128), jnp.float32))

    def gaussian_step(d, k, carry):
        cr, cg, cb, T, nc, alive_f = carry
        alive = alive_f > 0.0
        dx = d[:, 0:1] - lx
        dy = d[:, 1:2] - ly
        power = (-0.5 * (d[:, 2:3] * dx * dx + d[:, 4:5] * dy * dy)
                 - d[:, 3:4] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, d[:, 5:6] * jnp.exp(power))
        contrib = (alive & (k < count_vec) & (power <= 0.0)
                   & (alpha >= ALPHA_MIN))
        test_T = T * (1.0 - alpha)
        done_now = contrib & (test_T < T_EPS)
        ok = contrib & ~done_now
        w = jnp.where(ok, alpha * T, 0.0)
        cr = cr + w * d[:, 6:7]
        cg = cg + w * d[:, 7:8]
        cb = cb + w * d[:, 8:9]
        T = jnp.where(ok, test_T, T)
        nc = jnp.where(ok, k + 1, nc)
        alive_f = jnp.where(done_now, 0.0, alive_f)
        return cr, cg, cb, T, nc, alive_f

    def chunk_cond(state):
        k0, carry = state
        return (k0 < count_max) & (jnp.max(carry[5]) > 0.0)

    def chunk_body(state):
        k0, carry = state
        rows = data_ref[0, pl.ds(k0, GROUP)]   # [GROUP, 8, 16]
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


def _bwd_kernel16(counts_ref, data_ref, tab_ref, ft_ref, n_ref, gc_ref,
                  gt_ref, d_data_ref, p_scr, w_scr, o_scr):
    g = pl.program_id(0)
    c0 = counts_ref[4 * g]
    c1 = counts_ref[4 * g + 1]
    c2 = counts_ref[4 * g + 2]
    c3 = counts_ref[4 * g + 3]
    count_max = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))

    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    p_loc = (rowi % 2) * 128 + lane
    lx = (p_loc % 16).astype(jnp.float32)
    ly = (p_loc // 16).astype(jnp.float32)
    count_vec = jnp.where(rowi < 2, c0,
                          jnp.where(rowi < 4, c1,
                                    jnp.where(rowi < 6, c2, c3)))

    gr = gc_ref[0, 0]
    gg = gc_ref[0, 1]
    gb = gc_ref[0, 2]
    gT = gt_ref[0]
    T_final = ft_ref[0]
    n_contrib = n_ref[0]

    # Quadrant-local moment basis: identical [2,128] pattern for every band,
    # flattened to [8, 256] (sublane->lane merge).
    r2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
    l2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    pl2 = r2 * 128 + l2
    lx2 = (pl2 % 16).astype(jnp.float32)
    ly2 = (pl2 // 16).astype(jnp.float32)
    one2 = jnp.ones((2, 128), jnp.float32)
    zero2 = jnp.zeros((2, 128), jnp.float32)
    basis_m = jnp.stack([one2, lx2, ly2, lx2 * lx2, lx2 * ly2, ly2 * ly2,
                         zero2, zero2]).reshape(8, 256)

    group = GROUP
    zero = jnp.zeros((8, 128), jnp.float32)
    init = (T_final, zero, zero, zero)

    def gaussian_step(d, k, carry):
        T_behind, Br, Bg, Bb = carry
        dx = d[:, 0:1] - lx
        dy = d[:, 1:2] - ly
        power = (-0.5 * (d[:, 2:3] * dx * dx + d[:, 4:5] * dy * dy)
                 - d[:, 3:4] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, d[:, 5:6] * jnp.exp(power))
        valid = ((power <= 0.0) & (alpha >= ALPHA_MIN) & (k < n_contrib)
                 & (k < count_vec))
        one_minus = jnp.maximum(1.0 - alpha, 0.01)
        T_k = jnp.where(valid, T_behind / one_minus, T_behind)
        aT = jnp.where(valid, alpha * T_k, 0.0)
        dC_dalpha_r = T_k * d[:, 6:7] - Br / one_minus
        dC_dalpha_g = T_k * d[:, 7:8] - Bg / one_minus
        dC_dalpha_b = T_k * d[:, 8:9] - Bb / one_minus
        dTN_dalpha = -T_final / one_minus
        dL_dalpha = jnp.where(
            valid,
            gr * dC_dalpha_r + gg * dC_dalpha_g + gb * dC_dalpha_b
            + gT * dTN_dalpha, 0.0)
        exp_p = jnp.exp(power)
        not_clamped = d[:, 5:6] * exp_p < ALPHA_MAX
        dL_dalpha = jnp.where(not_clamped, dL_dalpha, 0.0)
        dL_dopac = dL_dalpha * exp_p
        dL_dpower = dL_dopac * d[:, 5:6]
        Br = Br + aT * d[:, 6:7]
        Bg = Bg + aT * d[:, 7:8]
        Bb = Bb + aT * d[:, 8:9]
        return (dL_dpower, aT, dL_dopac), (T_k, Br, Bg, Bb)

    num_groups = (count_max + group - 1) // group

    def group_body(gi, carry):
        k0 = (num_groups - 1 - gi) * group
        rows = data_ref[0, pl.ds(k0, group)]      # [group, 8, 16]
        for i in reversed(range(group)):
            (f_p, f_w, f_o), carry = gaussian_step(rows[i], k0 + i, carry)
            p_scr[i] = f_p
            w_scr[i] = f_w
            o_scr[i] = f_o

        nt = (((1,), (1,)), ((), ()))
        for q in range(4):
            p_q = p_scr[:, 2 * q:2 * q + 2, :].reshape(group, 256)
            w_q = w_scr[:, 2 * q:2 * q + 2, :].reshape(group, 256)
            o_q = o_scr[:, 2 * q:2 * q + 2, :].reshape(group, 256)
            basis_c = jnp.stack([
                gr[2 * q:2 * q + 2], gg[2 * q:2 * q + 2],
                gb[2 * q:2 * q + 2], one2, zero2, zero2, zero2,
                zero2]).reshape(8, 256)
            moments = jax.lax.dot_general(
                p_q, basis_m, nt, preferred_element_type=jnp.float32)
            cw = jax.lax.dot_general(
                w_q, basis_c, nt, preferred_element_type=jnp.float32)
            co = jax.lax.dot_general(
                o_q, basis_c, nt, preferred_element_type=jnp.float32)

            d_q = tab_ref[0, pl.ds(k0, group), q]   # [group, 16]
            mx = d_q[:, 0:1]
            my = d_q[:, 1:2]
            S0 = moments[:, 0:1]
            Sx = moments[:, 1:2]
            Sy = moments[:, 2:3]
            Sxx = moments[:, 3:4]
            Sxy = moments[:, 4:5]
            Syy = moments[:, 5:6]
            ex = mx * S0 - Sx
            ey = my * S0 - Sy
            d_mx = -(d_q[:, 2:3] * ex + d_q[:, 3:4] * ey)
            d_my = -(d_q[:, 4:5] * ey + d_q[:, 3:4] * ex)
            d_A = -0.5 * (mx * ex - mx * Sx + Sxx)
            d_B = -(my * ex - mx * Sy + Sxy)
            d_C = -0.5 * (my * ey - my * Sy + Syy)
            d_opac = co[:, 3:4]
            pad = jnp.zeros((group, FEAT - 9), jnp.float32)
            out_rows = jnp.concatenate(
                [d_mx, d_my, d_A, d_B, d_C, d_opac, cw[:, 0:1], cw[:, 1:2],
                 cw[:, 2:3], pad], axis=1)
            d_data_ref[0, pl.ds(k0, group), q] = out_rows
        return carry

    d_data_ref[...] = jnp.zeros(d_data_ref.shape, d_data_ref.dtype)
    jax.lax.fori_loop(0, num_groups, group_body, init)


def blend16_bwd_call(slab, tab, counts_q, final_t, n_contrib, g_color, g_t,
                     num_blocks):
    k = slab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, k, 8, FEAT), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4, FEAT), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, 128), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, k, 4, FEAT), lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((GROUP, 8, 128), jnp.float32),
            pltpu.VMEM((GROUP, 8, 128), jnp.float32),
            pltpu.VMEM((GROUP, 8, 128), jnp.float32),
        ],
    )
    (d_data,) = pl.pallas_call(
        _bwd_kernel16,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_blocks, k, 4, FEAT),
                                        jnp.float32)],
    )(counts_q, slab, tab, final_t, n_contrib, g_color, g_t)
    return d_data


def blend16_call(slab, counts_q, num_blocks):
    k = slab.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, k, 8, FEAT), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, 3, 8, 128), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        grid_spec=grid_spec,
        kernel=_fwd_kernel16,
        out_shape=[
            jax.ShapeDtypeStruct((num_blocks, 3, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks, 8, 128), jnp.int32),
        ],
    )(counts_q, slab)


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

    # ---- production 32-path baseline
    gx32, gy32 = tile_grid(width, height, 32)
    t32 = gx32 * gy32
    b32 = jax.jit(lambda: bin_gaussians(
        prep.means2d, prep.depths, prep.radii, prep.visible, width, height,
        tile=32, max_tiles_per_gaussian=6, max_per_tile=1024,
        extents=extents))()
    data32 = jax.jit(lambda: entry_gather(
        feat, b32.tile_lists, b32.sorted_entries, b32.sorted_tiles,
        b32.starts, b32.tile_counts, b32.entry_counts, 6))()
    print(f"32-path: entries={int(jnp.sum(b32.tile_counts))} "
          f"overflow={int(b32.num_overflow)}", flush=True)
    cur = jax.jit(lambda d, c: _blend_fwd_call(d, c, gx32, t32))
    o32 = timeit("32-tile production fwd kernel", cur, data32,
                 b32.tile_counts)

    # ---- 16-path
    K16 = 768  # p99 tile count 833; VMEM block budget caps K (see notes)
    k_dup = 8
    gx16, gy16 = tile_grid(width, height, 16)
    bx, by = -(-gx16 // 2), -(-gy16 // 2)
    nb = bx * by
    b16 = jax.jit(lambda: bin_gaussians(
        prep.means2d, prep.depths, prep.radii, prep.visible, width, height,
        tile=16, max_tiles_per_gaussian=k_dup, max_per_tile=K16,
        extents=extents))()
    print(f"16-path: entries={int(jnp.sum(b16.tile_counts))} "
          f"overflow={int(b16.num_overflow)} "
          f"clipped={int(b16.num_clipped)}", flush=True)

    # Row-major 16-grid -> block-quadrant order.
    perm = np.full(nb * 4, 0, np.int32)
    valid_row = np.zeros(nb * 4, bool)
    for byi in range(by):
        for bxi in range(bx):
            for q in range(4):
                sy, sx = 2 * byi + q // 2, 2 * bxi + q % 2
                dst = (byi * bx + bxi) * 4 + q
                if sy < gy16 and sx < gx16:
                    perm[dst] = sy * gx16 + sx
                    valid_row[dst] = True
    perm_j = jnp.asarray(perm)
    vr = jnp.asarray(valid_row)

    def build_slab():
        lists_p = jnp.where(vr[:, None], b16.tile_lists[perm_j], -1)
        counts_p = jnp.where(vr, b16.tile_counts[perm_j], 0)
        d16 = entry_gather(feat, lists_p, b16.sorted_entries,
                           b16.sorted_tiles, b16.starts, counts_p,
                           b16.entry_counts, k_dup)   # [nb*4, K, 16]
        # Shift means to quadrant-local pixel coords so the kernel carries
        # no tile origins: subtract (16*sx, 16*sy) per row.
        ox = (16.0 * (perm % gx16)).astype(np.float32)
        oy = (16.0 * (perm // gx16)).astype(np.float32)
        shift = jnp.stack([jnp.asarray(ox), jnp.asarray(oy)], 1)
        d16 = d16.at[:, :, 0:2].add(-shift[:, None, :])
        slab = jnp.repeat(d16.reshape(nb, 4, K16, FEAT), 2, axis=1)
        slab = slab.transpose(0, 2, 1, 3)             # [nb, K, 8, 16]
        return slab, counts_p

    slab, counts_p = timeit("16-path slab build (gather+expand)",
                            jax.jit(build_slab), reps=20)
    o16 = timeit("16-tile quadrant-packed fwd kernel",
                 jax.jit(lambda s, c: blend16_call(s, c, nb)), slab,
                 counts_p)

    # ---- image comparison
    def img32(color):
        x = np.asarray(color).reshape(gy32, gx32, 3, 32, 32)
        return x.transpose(2, 0, 3, 1, 4).reshape(3, gy32 * 32, gx32 * 32)[
            :, :height, :width]

    def img16(color):
        x = np.asarray(color).reshape(by, bx, 3, 4, 2, 128)
        x = x.reshape(by, bx, 3, 2, 2, 16, 16)   # (qy,qx),(ly,lx)
        x = x.transpose(2, 0, 3, 5, 1, 4, 6).reshape(
            3, by * 32, bx * 32)
        return x[:, :height, :width]

    a = img32(o32[0])
    b = img16(o16[0])
    mse = float(np.mean((a - b) ** 2))
    print(f"PSNR 16-vs-32 path: {10 * np.log10(1.0 / max(mse, 1e-12)):.2f} "
          f"dB  (max |d| {np.abs(a - b).max():.2e})", flush=True)

    # ---- bwd kernel timing (raw counts both sides; relative numbers)
    from photo_slam_tpu.ops.pallas.blend import _blend_bwd_call, pallas_blend
    rngc = np.random.RandomState(3)
    gc32 = jnp.asarray(rngc.rand(t32, 3, 8, 128).astype(np.float32))
    gt32j = jnp.asarray(rngc.rand(t32, 8, 128).astype(np.float32))
    bwd32 = jax.jit(lambda d, c, ft, nc, gc, g_t: _blend_bwd_call(
        d, c, ft, nc, gc, g_t, gx32, t32))
    timeit("32-tile production bwd kernel", bwd32, data32, b32.tile_counts,
           o32[1], o32[2], gc32, gt32j)
    gc16 = jnp.asarray(rngc.rand(nb, 3, 8, 128).astype(np.float32))
    gt16j = jnp.asarray(rngc.rand(nb, 8, 128).astype(np.float32))
    tab16 = slab[:, :, ::2, :]   # un-expanded quadrant table [nb, K, 4, F]
    bwd16 = jax.jit(lambda s, tb, c, ft, nc, gc, g_t: blend16_bwd_call(
        s, tb, c, ft, nc, gc, g_t, nb))
    timeit("16-tile quadrant-packed bwd kernel", bwd16, slab, tab16,
           counts_p, o16[1], o16[2], gc16, gt16j)

    # ---- end-to-end gradient equivalence (feat grads through
    # gather -> blend -> image -> scalar loss, both paths)
    W = jnp.asarray(np.random.RandomState(11).rand(
        3, height, width).astype(np.float32))
    lists_p = jnp.where(vr[:, None], b16.tile_lists[perm_j], -1)
    counts_pp = jnp.where(vr, b16.tile_counts[perm_j], 0)
    ox = (16.0 * (perm % gx16)).astype(np.float32)
    oy = (16.0 * (perm // gx16)).astype(np.float32)
    shift = jnp.stack([jnp.asarray(ox), jnp.asarray(oy)], 1)

    @jax.custom_vjp
    def blend16_t(d16c):
        # d16c: [nb, K, 4, FEAT]; slab duplicates the quadrant axis onto
        # sublane pairs -> [nb, K, 8, FEAT].
        return blend16_call(jnp.repeat(d16c, 2, axis=2), counts_pp, nb)

    def b16_fwd(d16c):
        slab_ = jnp.repeat(d16c, 2, axis=2)
        out = blend16_call(slab_, counts_pp, nb)
        return out, (slab_, out[1], out[2])

    def b16_bwd(res, cts):
        slab_, ft, nc = res
        gc, g_t, _ = cts
        dd = blend16_bwd_call(slab_, slab_[:, :, ::2, :], counts_pp, ft, nc,
                              gc, g_t, nb)
        return (dd,)

    blend16_t.defvjp(b16_fwd, b16_bwd)

    def jimg16(color):
        x = color.reshape(by, bx, 3, 4, 256)
        x = x.reshape(by, bx, 3, 2, 2, 16, 16)
        x = x.transpose(2, 0, 3, 5, 1, 4, 6).reshape(3, by * 32, bx * 32)
        return x[:, :height, :width]

    def jimg32(color):
        x = color.reshape(gy32, gx32, 3, 32, 32)
        return x.transpose(2, 0, 3, 1, 4).reshape(
            3, gy32 * 32, gx32 * 32)[:, :height, :width]

    def loss32(f):
        d = entry_gather(f, b32.tile_lists, b32.sorted_entries,
                         b32.sorted_tiles, b32.starts, b32.tile_counts,
                         b32.entry_counts, 6)
        c, t, _ = pallas_blend(d, b32.tile_counts, gx32, t32)
        return jnp.sum(jimg32(c) * W) + 0.3 * jnp.sum(t)

    def loss16(f):
        d = entry_gather(f, lists_p, b16.sorted_entries, b16.sorted_tiles,
                         b16.starts, counts_pp, b16.entry_counts, k_dup)
        d = d.at[:, :, 0:2].add(-shift[:, None, :])
        d16c = d.reshape(nb, 4, K16, FEAT).transpose(0, 2, 1, 3)
        c, t, _ = blend16_t(d16c)
        return jnp.sum(jimg16(c) * W) + 0.3 * jnp.sum(t)

    g32 = jax.jit(jax.grad(loss32))(feat)
    g16 = jax.jit(jax.grad(loss16))(feat)
    d = np.abs(np.asarray(g32) - np.asarray(g16))
    scale = np.abs(np.asarray(g32)).max(axis=0) + 1e-9
    print("feat-grad rel diff per lane:",
          np.round(d.max(axis=0) / scale, 4)[:9], flush=True)


if __name__ == "__main__":
    main()
