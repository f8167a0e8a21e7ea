"""Pallas TPU tile-blend kernels: the hot path of the rasterizer.

Replaces the reference's per-tile CUDA blend kernels
(forward: cuda_rasterizer/forward.cu:261-374, backward:
cuda_rasterizer/backward.cu:398-557) with TPU-native kernels:

  * one grid step per 32x32 pixel tile — 1024 pixels live in exactly one
    [8, 128] f32 VPU register tile, so every per-Gaussian update is a handful
    of full-width vector ops;
  * per-tile Gaussian data arrives as a [K, 16] VMEM block, double-buffered
    across grid steps by the BlockSpec pipeline (the analog of the CUDA
    shared-memory batching);
  * transmittance compositing runs sequentially over Gaussians in registers —
    no multi-pass cumprod — with a tile-level early exit every EXIT_CHECK
    Gaussians once every pixel saturates (T < 1e-4);
  * the backward kernel re-traverses back-to-front exactly like the
    reference, reconstructing T from final_T and accumulating per-entry
    gradients into a [K, 16] output block; the scatter-add from tile entries
    back to Gaussians happens in XLA as the transpose of the gather that
    built the tiles (no atomics needed).

Packed entry layout (16 f32 lanes per Gaussian):
  0: mean2d.x   1: mean2d.y   2: conic.a   3: conic.b   4: conic.c
  5: opacity    6: r          7: g         8: b         9-15: unused
The same layout is the gradient layout in the backward pass.
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PS = 32          # pixel tile edge: 32*32 = 1024 px = one (8,128) f32 tile
PIX_SUB = 8
PIX_LANE = 128
FEAT = 16
EXIT_CHECK = 64       # early-exit poll period on TPU (Gaussians)
EXIT_CHECK_INTERPRET = 16  # smaller unroll for CPU interpret mode (tests)


def _exit_check() -> int:
    return EXIT_CHECK_INTERPRET if _use_interpret() else EXIT_CHECK


def _bwd_group() -> int:
    """Backward-traversal group size (sweepable via PS_BWD_GROUP)."""
    import os

    if _use_interpret():
        return EXIT_CHECK_INTERPRET
    return int(os.environ.get("PS_BWD_GROUP", str(EXIT_CHECK)))

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _pixel_coords(t, tiles_x):
    """Per-pixel (x, y) [8,128] register tiles for grid step t."""
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    p = (
        jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 0) * PIX_LANE
        + jax.lax.broadcasted_iota(jnp.int32, (PIX_SUB, PIX_LANE), 1)
    )
    px = tx * TILE_PS + (p % TILE_PS).astype(jnp.float32)
    py = ty * TILE_PS + (p // TILE_PS).astype(jnp.float32)
    return px, py


def _fwd_kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, color_ref, t_ref,
                n_ref):
    """Group-VECTORIZED forward blend: a chunk of G Gaussians is processed
    as [G, 1024] arrays — no per-Gaussian scalar extraction, exp/quadratic
    on full batches, the per-Gaussian color FMAs become ONE MXU matmul, and
    the serial transmittance chain becomes a log2(G) doubling prefix
    product. Same early-exit granularity (group level) and semantics as the
    per-Gaussian-unrolled kernel it replaces (measured 10.3 vs 11.9 ms at
    300k/1200x680, bitwise-matching n_contrib; the prefix form is exact:
    ok_k = contrib_k & (T * prod_{j<=k} om_j >= eps) == the sequential
    test_T check). The CUDA analog is forward.cu:261-374."""
    g = pl.program_id(0)
    count = counts_ref[g]
    tiles_x = tiles_x_ref[0]
    # ids_ref maps grid step -> actual tile id: identity for full renders,
    # the overflowed-tile subset for compact continuation passes.
    t = ids_ref[g]
    group = _exit_check()
    P = PIX_SUB * PIX_LANE
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (group, P), 1)
    pxv = tx * TILE_PS + (pix % TILE_PS).astype(jnp.float32)
    pyv = ty * TILE_PS + (pix // TILE_PS).astype(jnp.float32)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (group, P), 0)

    ones_row = jnp.ones((1, P), jnp.float32)
    # `alive` is carried as a float mask: Mosaic cannot yield i1 vectors
    # through loop carries.
    init = (jnp.zeros((3, P), jnp.float32),   # color
            ones_row,                          # T carry
            jnp.zeros((1, P), jnp.int32),      # n_contrib
            ones_row,                          # alive
            jnp.int32(0))

    def chunk_cond(state):
        _, T, _, alive, k0 = state
        return (k0 < count) & (jnp.max(alive) > 0.0)

    def chunk_body(state):
        color, T, nc, alive, k0 = state
        rows = data_ref[0, pl.ds(k0, group)]          # [G, 16]
        dx = rows[:, 0:1] - pxv
        dy = rows[:, 1:2] - pyv
        power = (-0.5 * (rows[:, 2:3] * dx * dx + rows[:, 4:5] * dy * dy)
                 - rows[:, 3:4] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, rows[:, 5:6] * jnp.exp(power))
        # k >= count is masked arithmetically — a lax.cond here becomes an
        # scf.if with vector results, which Mosaic cannot legalize.
        contrib = ((alive > 0.0) & (rowi + k0 < count) & (power <= 0.0)
                   & (alpha >= ALPHA_MIN))
        om = jnp.where(contrib, 1.0 - alpha, 1.0)
        # Inclusive prefix product along the gaussian axis (doubling).
        s_loc = om
        shift = 1
        while shift < group:
            s_loc = s_loc * jnp.where(rowi >= shift,
                                      pltpu.roll(s_loc, shift, 0), 1.0)
            shift *= 2
        S = T * s_loc                        # T after compositing entry k
        ok = contrib & (S >= T_EPS)
        w = jnp.where(ok, alpha * (S / om), 0.0)   # alpha * T_before_k
        # Color FMAs on the MXU; HIGHEST precision: the TPU default (bf16
        # 1-pass) costs ~1e-3 on composited colors, visible against the
        # sequential kernel's f32 accumulation.
        color = color + jax.lax.dot_general(
            rows[:, 6:9], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        nc = jnp.maximum(nc, jnp.max(jnp.where(ok, rowi + k0 + 1, 0),
                                     axis=0, keepdims=True))
        # T after the group = product of the APPLIED (1-alpha) factors. No
        # second ladder needed: S is monotone non-increasing over contrib
        # entries, and every contrib entry before the last ok one is itself
        # ok (S >= eps there), so min over ok of S IS T_in * prod of om over
        # exactly the applied entries — bitwise-identical to the omp ladder
        # this replaces, at the cost of one reduction instead of log2(G)
        # rolls.
        T = jnp.min(jnp.where(ok, S, T), axis=0, keepdims=True)
        dead = jnp.max(jnp.where(contrib & (S < T_EPS), 1.0, 0.0), axis=0,
                       keepdims=True)
        alive = jnp.where(dead > 0.0, 0.0, alive)
        return color, T, nc, alive, k0 + group

    color, T, nc, _, _ = jax.lax.while_loop(chunk_cond, chunk_body, init)
    color_ref[0, 0] = color[0].reshape(PIX_SUB, PIX_LANE)
    color_ref[0, 1] = color[1].reshape(PIX_SUB, PIX_LANE)
    color_ref[0, 2] = color[2].reshape(PIX_SUB, PIX_LANE)
    t_ref[0] = T.reshape(PIX_SUB, PIX_LANE)
    n_ref[0] = nc.reshape(PIX_SUB, PIX_LANE)


def _bwd_kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, final_t_ref,
                n_ref, g_color_ref, g_t_ref, d_data_ref):
    """Back-to-front gradient accumulation, group-VECTORIZED
    (reference: cuda_rasterizer/backward.cu:398-557).

    Derivation: C = sum_k c_k a_k T_k (+ T_N * bg outside the kernel),
    T_k = prod_{j<k}(1-a_j). With B_k = sum_{j>k} c_j a_j T_j (color behind k):
      dC/dc_k = a_k T_k
      dC/da_k = T_k c_k - B_k / (1 - a_k)
      dT_N/da_k = -T_N / (1 - a_k)      (for the final_T cotangent / bg term)
    Traversing groups of G entries back-to-front; WITHIN a group everything
    is vectorized as [G, 1024] arrays (the same shape discipline as the
    forward kernel): the serial per-entry carries become
      T_k  = T_in / suffix_prod_{j>=k}(1-a_j)   (suffix-product ladder)
      Bc_k = Bc_in + suffix_sum_{j>k}(aT_j g.c_j) (suffix-sum ladder)
    via log2(G) pltpu.roll doubling steps. Reconstruction by division is
    safe: the forward stops contributing at T < 1e-4, so every
    participating T is in [~1e-6, 1] and group suffix products never
    underflow. Masked entries carry om = 1 (exactly the serial "T unchanged
    when invalid" semantics).

    dL/da_k only ever consumes the cotangent-weighted dot products
    g·c_k = gr c_r + gg c_g + gb c_b and g·B_k, so the three per-channel
    behind-accumulators fold into ONE scalar-per-pixel accumulator
    Bc_k = g·B_k, and g·c is ONE [G,3]x[3,P] MXU matmul per group.

    Pixel reductions run on the MXU: per group of G Gaussians the three
    [G, P] field arrays (dL/dpower, alpha*T, dL/dopacity) feed matmuls
    against a per-tile moment basis {1, x, y, x^2, xy, y^2, g_r, g_g, g_b}
    (tile-LOCAL pixel coords, so the quadratic moments stay small and the
    expansion of (mx-px)^2 into moments does not cancel catastrophically)
    yielding all nine gradient components — replacing the CUDA backward's
    warp reductions + atomicAdd (backward.cu:398-557).
    """
    import os

    g = pl.program_id(0)
    count = counts_ref[g]
    tiles_x = tiles_x_ref[0]
    t = ids_ref[g]
    group = _bwd_group()
    # Measured (tools/exp_bwd_sweep.py, 300k/1200x680): group 64 + roll
    # ladders + separate moment matmuls is the optimum — 15.2 ms vs 18.8
    # (group 32), 15.5 (merged [3G,P] matmul) and 20.6 (exp/log "MXU"
    # ladders: the transcendentals are themselves VPU work, so nothing
    # offloads). The kernel is VPU-issue-bound on its elementwise +
    # roll-ladder work, not MXU-instruction-bound.
    merge_mm = os.environ.get("PS_BWD_MERGE", "0") == "1"
    use_mxu_ladders = os.environ.get("PS_BWD_LADDER", "roll") == "mxu"
    P = PIX_SUB * PIX_LANE
    # Tile-local pixel coordinates (0..TILE_PS): the moment basis. All
    # per-pixel arrays live as [1, P] rows broadcasting against [G, P].
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    lx = (pix % TILE_PS).astype(jnp.float32)
    ly = (pix // TILE_PS).astype(jnp.float32)
    tx = (t % tiles_x).astype(jnp.float32) * TILE_PS
    ty = (t // tiles_x).astype(jnp.float32) * TILE_PS
    pxv = tx + lx
    pyv = ty + ly
    rowi = jax.lax.broadcasted_iota(jnp.int32, (group, P), 0)

    # Inclusive-suffix triangular operator for the MXU ladders:
    # tri_suf[i, j] = 1 iff j >= i, so (tri_suf @ x)_i = sum_{j>=i} x_j.
    tri_suf = (jax.lax.broadcasted_iota(jnp.int32, (group, group), 1)
               >= jax.lax.broadcasted_iota(jnp.int32, (group, group), 0)
               ).astype(jnp.float32)

    gr = g_color_ref[0, 0].reshape(1, P)
    gg = g_color_ref[0, 1].reshape(1, P)
    gb = g_color_ref[0, 2].reshape(1, P)
    gT = g_t_ref[0].reshape(1, P)
    T_final = final_t_ref[0].reshape(1, P)
    n_contrib = n_ref[0].reshape(1, P)

    # Moment basis [8, P]: rows (1, lx, ly, lx^2, lx*ly, ly^2, 0, 0) and
    # color basis rows (gr, gg, gb, 1, 0, 0, 0, 0).
    one = jnp.ones((1, P), jnp.float32)
    zerov = jnp.zeros((1, P), jnp.float32)
    basis_m = jnp.concatenate([one, lx, ly, lx * lx, lx * ly, ly * ly,
                               zerov, zerov], axis=0)
    basis_c = jnp.concatenate([gr, gg, gb, one, zerov, zerov, zerov,
                               zerov], axis=0)

    # Carry: T_in = T_{k0+G} (transmittance before the tail), Bc_in = g.B
    # accumulated over entries already processed (indices >= k0+G).
    # gT*T_final is entry-independent: hoisted.
    gTT = gT * T_final
    init = (T_final, zerov)

    num_groups = (count + group - 1) // group
    nt = (((1,), (1,)), ((), ()))

    def group_body(gi, carry):
        T_in, Bc_in = carry
        k0 = (num_groups - 1 - gi) * group
        rows = data_ref[0, pl.ds(k0, group)]          # [G, 16]
        dx = rows[:, 0:1] - pxv
        dy = rows[:, 1:2] - pyv
        power = (-0.5 * (rows[:, 2:3] * dx * dx + rows[:, 4:5] * dy * dy)
                 - rows[:, 3:4] * dx * dy)
        exp_p = jnp.exp(power)
        raw_alpha = rows[:, 5:6] * exp_p
        alpha = jnp.minimum(ALPHA_MAX, raw_alpha)
        valid = ((power <= 0.0) & (alpha >= ALPHA_MIN)
                 & (rowi + k0 < n_contrib) & (rowi + k0 < count))
        om = jnp.where(valid, jnp.maximum(1.0 - alpha, 0.01), 1.0)

        # Inclusive suffix product S_k = prod_{j>=k} om_j (roll-up ladder).
        # The env-gated exp(TRI_SUF @ log(om)) MXU variant was measured
        # SLOWER (20.6 vs 15.2 ms): log+exp are VPU transcendentals, so the
        # "offload" adds VPU work instead of removing it. Kept gated for
        # re-measurement on future hardware.
        if use_mxu_ladders:
            S = jnp.exp(jax.lax.dot_general(
                tri_suf, jnp.log(om), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        else:
            S = om
            shift = 1
            while shift < group:
                S = S * jnp.where(rowi < group - shift,
                                  pltpu.roll(S, group - shift, 0), 1.0)
                shift *= 2
        T_k = T_in / S                                # T before entry k
        aT = jnp.where(valid, alpha * T_k, 0.0)
        # g.c per entry: ONE MXU matmul [G,3] x [3,P].
        gc = jax.lax.dot_general(
            rows[:, 6:9], jnp.concatenate([gr, gg, gb], axis=0),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        u = aT * gc
        # Inclusive suffix sum, then exclusive: Bex_k = sum_{j>k} u_j.
        if use_mxu_ladders:
            U = jax.lax.dot_general(
                tri_suf, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            U = u
            shift = 1
            while shift < group:
                U = U + jnp.where(rowi < group - shift,
                                  pltpu.roll(U, group - shift, 0), 0.0)
                shift *= 2
        Bc = Bc_in + U - u

        dL_dalpha = jnp.where(valid & (raw_alpha < ALPHA_MAX),
                              gc * T_k - (Bc + gTT) / om, 0.0)
        dL_dopac = dL_dalpha * exp_p
        dL_dpower = dL_dopac * rows[:, 5:6]

        # MXU reduction: moments[G,8] = fields @ basis^T over pixels.
        if merge_mm:
            # One [3G, P] x [P, 8] matmul instead of three [G, P] x [P, 8]:
            # the MXU output tile is mostly padding either way (8 of 128
            # lanes), so fusing the row axis cuts the instruction count.
            fields = jnp.concatenate([dL_dpower, aT, dL_dopac], axis=0)
            basis_all = jnp.concatenate(
                [one, lx, ly, lx * lx, lx * ly, ly * ly, gr, gg, gb],
                axis=0)
            allm = jax.lax.dot_general(
                fields, basis_all, nt, preferred_element_type=jnp.float32)
            moments = allm[0:group]            # cols 0..5 used
            cw = allm[group:2 * group, 6:9]    # rgb color weights
            cw = jnp.concatenate(
                [cw, allm[2 * group:3 * group, 0:1]], axis=1)
            co = cw[:, 3:4]                    # dL_dopac . 1
        else:
            moments = jax.lax.dot_general(
                dL_dpower, basis_m, nt, preferred_element_type=jnp.float32)
            cw = jax.lax.dot_general(
                aT, basis_c, nt, preferred_element_type=jnp.float32)
            co = jax.lax.dot_general(
                dL_dopac, basis_c, nt, preferred_element_type=jnp.float32)[
                :, 3:4]

        # Convert moments to gradient rows (tile-local mean coords).
        mx = rows[:, 0:1] - tx
        my = rows[:, 1:2] - ty
        S0 = moments[:, 0:1]
        Sx = moments[:, 1:2]
        Sy = moments[:, 2:3]
        Sxx = moments[:, 3:4]
        Sxy = moments[:, 4:5]
        Syy = moments[:, 5:6]
        ex = mx * S0 - Sx              # sum dL_dpower * dx
        ey = my * S0 - Sy              # sum dL_dpower * dy
        d_mx = -(rows[:, 2:3] * ex + rows[:, 3:4] * ey)
        d_my = -(rows[:, 4:5] * ey + rows[:, 3:4] * ex)
        d_A = -0.5 * (mx * ex - mx * Sx + Sxx)   # sum * dx^2 (see below)
        d_B = -(my * ex - mx * Sy + Sxy)          # sum * dx*dy
        d_C = -0.5 * (my * ey - my * Sy + Syy)    # sum * dy^2
        # dx^2 expansion: mx^2 S0 - 2 mx Sx + Sxx = mx*ex - mx*Sx + Sxx;
        # dx*dy: mx my S0 - mx Sy - my Sx + Sxy = my*ex - mx*Sy + Sxy.
        d_opac = co
        d_r = cw[:, 0:1]
        d_g = cw[:, 1:2]
        d_b = cw[:, 2:3]
        pad = jnp.zeros((group, FEAT - 9), jnp.float32)
        out_rows = jnp.concatenate(
            [d_mx, d_my, d_A, d_B, d_C, d_opac, d_r, d_g, d_b, pad], axis=1)
        d_data_ref[0, pl.ds(k0, group)] = out_rows
        # Group carries: T_{k0} = row 0's T (full-group suffix product
        # applied); Bc over all entries >= k0 = Bc_in + full suffix sum.
        return T_k[0:1], Bc_in + U[0:1]

    d_data_ref[...] = jnp.zeros(d_data_ref.shape, d_data_ref.dtype)
    jax.lax.fori_loop(0, num_groups, group_body, init)


def _use_interpret() -> bool:
    plat = jax.devices()[0].platform
    kind = getattr(jax.devices()[0], "device_kind", "")
    return not (plat in ("tpu", "axon") or "TPU" in str(kind))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_blend(data_tiles: jnp.ndarray, counts: jnp.ndarray,
                 tiles_x: int, num_tiles: int,
                 tile_ids: jnp.ndarray | None = None):
    """Blend packed per-tile Gaussian entries.

    Args:
      data_tiles: [T, K, 16] float32 packed entries (layout in module doc).
      counts: [T] int32 valid entries per tile (depth-sorted prefixes).
      tiles_x: tiles per image row (static).
      num_tiles: T (static) — number of BLOCKS processed; with `tile_ids`
        given, block i rasterizes image tile tile_ids[i] (the compact
        overflow-continuation path runs only the overflowed subset).

    Returns (color [T, 3, 8, 128], final_T [T, 8, 128],
             n_contrib [T, 8, 128]).
    Background is NOT composited here — callers add final_T * bg, which also
    routes the background gradient through the final_T cotangent.
    """
    color, final_t, n_contrib = _blend_fwd_call(data_tiles, counts, tiles_x,
                                                num_tiles, tile_ids)
    return color, final_t, n_contrib


def _tile_ids_or_iota(tile_ids, num_tiles):
    if tile_ids is None:
        return jnp.arange(num_tiles, dtype=jnp.int32)
    return tile_ids.astype(jnp.int32)


def _blend_fwd_call(data_tiles, counts, tiles_x, num_tiles, tile_ids=None):
    k = data_tiles.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, FEAT), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, color_ref, t_ref,
               n_ref):
        _fwd_kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, color_ref,
                    t_ref, n_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, PIX_SUB, PIX_LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_SUB, PIX_LANE), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(counts, jnp.full((1,), tiles_x, jnp.int32),
      _tile_ids_or_iota(tile_ids, num_tiles), data_tiles)


def _blend_bwd_call(data_tiles, counts, final_t, n_contrib, g_color, g_t,
                    tiles_x, num_tiles, tile_ids=None):
    k = data_tiles.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, FEAT), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX_SUB, PIX_LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, FEAT), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, ft_ref, n_ref,
               gc_ref, gt_ref, d_data_ref):
        _bwd_kernel(counts_ref, tiles_x_ref, ids_ref, data_ref, ft_ref,
                    n_ref, gc_ref, gt_ref, d_data_ref)

    (d_data,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, k, FEAT), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(counts, jnp.full((1,), tiles_x, jnp.int32),
      _tile_ids_or_iota(tile_ids, num_tiles), data_tiles, final_t,
      n_contrib, g_color, g_t)
    return d_data


def _fwd_rule(data_tiles, counts, tiles_x, num_tiles, tile_ids=None):
    color, final_t, n_contrib = _blend_fwd_call(data_tiles, counts, tiles_x,
                                                num_tiles, tile_ids)
    return (color, final_t, n_contrib), (data_tiles, counts, final_t,
                                         n_contrib, tile_ids)


def _bwd_rule(tiles_x, num_tiles, residuals, cotangents):
    import numpy as np

    data_tiles, counts, final_t, n_contrib, tile_ids = residuals
    g_color, g_t, _g_n = cotangents
    # Entries past the last contributor of any pixel in the tile have zero
    # gradient — bound the backward traversal by the tile's max n_contrib
    # (the reference starts each pixel at its own n_contrib,
    # backward.cu:418-427; saturated tiles skip most of the list).
    nc_max = jnp.max(n_contrib.reshape(num_tiles, -1), axis=-1)
    counts_eff = jnp.minimum(counts, nc_max).astype(jnp.int32)
    d_data = _blend_bwd_call(data_tiles, counts_eff, final_t, n_contrib,
                             g_color, g_t, tiles_x, num_tiles, tile_ids)
    # counts/tile_ids are integer-typed: float0 cotangents.
    out = [d_data, np.zeros(counts.shape, dtype=jax.dtypes.float0)]
    if tile_ids is not None:
        out.append(np.zeros(tile_ids.shape, dtype=jax.dtypes.float0))
    else:
        out.append(None)
    return tuple(out)


pallas_blend.defvjp(_fwd_rule, _bwd_rule)
