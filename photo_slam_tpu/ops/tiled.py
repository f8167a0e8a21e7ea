"""Tiled renderer: per-tile alpha blending over binned Gaussian lists.

TPU analog of the reference render kernel (reference:
cuda_rasterizer/forward.cu:261-374): where CUDA launches one 16x16 thread
block per tile with shared-memory batching, here tiles are processed as a
batched vectorized blend — [tiles_chunk, K, pixels] elementwise work on the
VPU plus one weighted-sum matmul per tile on the MXU. The per-pixel
early-exit becomes a prefix mask over the cumulative transmittance (exact
semantics; see ops/dense.py docstring).

Differentiable by JAX AD; `jax.checkpoint` bounds backward memory by
recomputing the per-chunk alpha tensor instead of storing it (the reference
does the same thing manually by re-traversing tiles back-to-front in
cuda_rasterizer/backward.cu:398-557).
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from photo_slam_tpu.ops.binning import TILE, TileBinning, bin_gaussians, tile_grid
from photo_slam_tpu.ops.dense import ALPHA_MAX, ALPHA_MIN, T_EPS, RenderOutput
from photo_slam_tpu.ops.preprocess import Preprocessed


# Static capacity for overflow-dropped entry enumeration in the sort-routed
# transpose below; runs past it fall back to the permutation-inverse route
# (a lax.cond picks at runtime, so correctness never depends on the cap).
# 2^17 = 2.7x the worst overflow observed at bench scale (47,982 dropped at
# 300k/1200x680); every dropped entry is a zero-payload row appended to the
# HBM-bandwidth-bound transpose sort, so the cap is kept tight.
_DROP_CAP = 1 << 17

# The packed FEAT=16 entry layout uses lanes 0..8 (mean2d, conic, opacity,
# rgb — ops/pallas/blend.py module doc); lanes 9..15 are zero padding whose
# gradient is identically zero (the blend backward writes zeros there and
# the feat pack discards them). render_pallas passes route_lanes=10 (9 used,
# rounded even for int32 bf16-pair packing) so the gradient transposes below
# route only gradient-carrying bytes — the sort payload and stencil
# reduction are HBM-bandwidth-bound, so dropping 6/16 of the bytes is a
# direct win (VERDICT r4 next-item 3). route_lanes=None routes everything
# (the generic contract).
ROUTE_LANES_PACKED = 10


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def entry_gather(feat: jnp.ndarray, entry_lists: jnp.ndarray,
                 sorted_entries: jnp.ndarray, sorted_tiles: jnp.ndarray,
                 starts: jnp.ndarray, tile_counts: jnp.ndarray,
                 entry_counts, k_dup: int, slot_offset: int = 0,
                 route_lanes: int | None = None):
    """Gather per-Gaussian rows by ENTRY id with a scatter-free transpose.

    entry_lists hold unique entry ids (gaussian * k_dup + slot, -1 invalid).
    The naive VJP of feat[lists // k_dup] is a scatter-add, which XLA
    serializes on TPU (~90 ms/frame at Replica scale) even with unique
    indices. Two scatter-free transposes replace the CUDA backward's
    atomicAdd accumulation (cuda_rasterizer/backward.cu:398-557):

    MAIN route (slot_offset == 0, `entry_counts` given): the gradient rows
    ride as SORT PAYLOAD, keyed by their entry id — sorts move data at
    bandwidth rates where big row gathers are latency-bound (~7-12 ns/row).
    Entry ids gid*k_dup+slot sorted ascending group into per-gaussian
    segments whose lengths are exactly entry_counts (binning emits slots
    0..entry_counts-1), PROVIDED overflow-dropped entries (valid stream
    positions past a tile's K window) are present too — they carry zero
    gradient and are appended via one cheap 1-operand sort of the stream.
    Segment starts are then cumsum(entry_counts)-entry_counts — no
    searchsorted, no scatter — and a k_dup-tap stencil sum + ONE [N]-row
    gather finishes. Measured 9.5 ms vs 17.5 ms at 300k/1200x680 production
    shapes (tools/exp_route.py F2).

    FALLBACK route (continuation windows, or dropped entries exceeding the
    static cap): invert the binning permutation with pure gathers —
      inv  = argsort(sorted_entries)      # entry id -> sorted position
      t    = sorted_tiles[inv]            # its tile (precomputed in binning)
      k    = inv - starts[t]              # slot within the tile's list
      grad = g[t, k] summed over each Gaussian's k_dup slots (MXU reduce)
    """
    idx = jnp.where(entry_lists >= 0, entry_lists // k_dup, 0)
    return feat[idx]


def _entry_gather_fwd(feat, entry_lists, sorted_entries, sorted_tiles, starts,
                      tile_counts, entry_counts, k_dup, slot_offset=0,
                      route_lanes=None):
    out = entry_gather(feat, entry_lists, sorted_entries, sorted_tiles,
                       starts, tile_counts, entry_counts, k_dup, slot_offset,
                       route_lanes)
    return out, (feat.shape, entry_lists, sorted_entries, sorted_tiles,
                 starts, tile_counts, entry_counts)


def _entry_gather_bwd(k_dup, slot_offset, route_lanes, residuals, g):
    import numpy as np

    (feat_shape, entry_lists, sorted_entries, sorted_tiles, starts,
     tile_counts, entry_counts) = residuals
    n, d = feat_shape
    num_tiles, k_max = entry_lists.shape
    e_total = sorted_entries.shape[0]
    t_k = num_tiles * k_max
    du = d if route_lanes is None else min(route_lanes, d)
    g_flat = g.reshape(-1, d)[:, :du]  # [T*K, du]

    # Stream-side slot-within-tile, computed WITHOUT per-element random
    # gathers (XLA lowers large 1D gathers on TPU to ~12ns/element loops —
    # measured 44ms at Replica scale):
    #   starts_stream[i] = starts[tile at sorted position i], a piecewise-
    #   constant monotone expansion of `starts`, built with one TINY
    #   scatter-add (num_tiles deltas; empty tiles collide at the same
    #   position, which scatter-ADD handles) and a cumsum over the stream.
    iota = jnp.arange(e_total, dtype=jnp.int32)
    t = sorted_tiles

    def _starts_stream(limit):
        deltas = jnp.diff(starts)
        ss = jnp.zeros(limit, jnp.int32).at[starts[1:]].add(
            deltas, mode="drop")
        return jnp.cumsum(ss)

    def fallback_route(g_flat):
        slot_k = iota - _starts_stream(e_total) - slot_offset
        # Rows past a tile's count are zero in the kernel output, so only
        # the hard window bounds and the sentinel tile need masking.
        # slot_offset selects the continuation window [offset, offset+k_max)
        # of each tile's stream segment (multi-pass overflow rendering).
        valid = (t < num_tiles) & (slot_k >= 0) & (slot_k < k_max)
        ridx = jnp.where(valid, t * k_max + slot_k, jnp.int32(-1))
        # Route row indices back to entry order with ONE sort
        # (sorted_entries is a permutation of arange, so the sorted key
        # collapses to iota and the payload lands at ptr[e]).
        _, ptr = jax.lax.sort((sorted_entries, ridx), num_keys=1,
                              is_stable=False)
        ok = ptr >= 0
        # Route the gradient rows in bf16: the gather and the k_dup
        # reduction are HBM-bandwidth-bound, and halving the bytes halves
        # them. Each routed element is rounded once to bf16 (~0.4% relative)
        # before an f32 accumulation — noise far below the single-view
        # stochastic gradient noise Adam already absorbs.
        rows = jnp.take(g_flat.astype(jnp.bfloat16), jnp.where(ok, ptr, 0),
                        axis=0)  # [n*k_dup, du]
        rows = jnp.where(ok[:, None], rows, jnp.bfloat16(0))
        # k_dup reduction on the MXU: [n, k_dup*du] x stacked identities. The
        # axis-1 sum of a [n, k_dup, du] view lowers to slow VPU shuffles;
        # the matmul accumulates in f32.
        sel = jnp.tile(jnp.eye(du, dtype=jnp.bfloat16), (k_dup, 1))
        return jax.lax.dot_general(
            rows.reshape(n, k_dup * du), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if slot_offset == 0 and entry_counts is not None and du % 2 == 0:
        INT_MAX = jnp.int32(2**31 - 1)
        drop_cap = min(_DROP_CAP, e_total)
        # Every emitted entry is either within its tile's K window or
        # dropped, so the dropped count needs NO stream pass:
        n_dropped = jnp.sum(entry_counts) - jnp.sum(tile_counts)
        # The dropped-id compaction sort only needs the stream PREFIX of
        # t_k + drop_cap positions: valid entries occupy a stream prefix,
        # at most t_k of them are in-table, so a dropped entry at position
        # >= t_k + drop_cap implies n_dropped > drop_cap — which routes to
        # the fallback anyway. Trims the 1-operand sort from e_total (n *
        # k_dup) rows to ~t_k + drop_cap (1.8M -> 0.99M at bench shapes).
        pfx = min(t_k + drop_cap, e_total)
        slot_p = iota[:pfx] - _starts_stream(pfx)
        dropped = (t[:pfx] < num_tiles) & (slot_p >= k_max)
        dkeys = jnp.sort(jnp.where(dropped, sorted_entries[:pfx], INT_MAX))
        dkeys = dkeys[:drop_cap]

        def sort_route(g_flat):
            # Pack each bf16 gradient row into du/2 int32 payload lanes and
            # sort by entry id (invalid table slots -> INT_MAX, landing past
            # every real segment with gid sentinel n, never read).
            rows = g_flat.astype(jnp.bfloat16)
            packed = jax.lax.bitcast_convert_type(
                rows.reshape(t_k, du // 2, 2), jnp.int32)
            keys_tab = entry_lists.reshape(-1)
            keys_tab = jnp.where(keys_tab < 0, INT_MAX, keys_tab)
            keys_all = jnp.concatenate([keys_tab, dkeys])
            zpad = jnp.zeros((drop_cap,), jnp.int32)
            ops = [keys_all] + [jnp.concatenate([packed[:, i], zpad])
                                for i in range(du // 2)]
            out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
            rows_s = jax.lax.bitcast_convert_type(
                jnp.stack(out[1:], axis=1), jnp.bfloat16).reshape(-1, du)
            keys_s = out[0]
            gid_s = jnp.where(keys_s == INT_MAX, jnp.int32(n),
                              keys_s // k_dup)
            # Stencil segment-sum: total[q] = sum_{j<k_dup} rows[q+j] while
            # gid stays equal — one fused elementwise pass, no shuffles.
            m = t_k + drop_cap
            total = rows_s.astype(jnp.float32)
            for j in range(1, k_dup):
                r_j = jnp.concatenate(
                    [rows_s[j:], jnp.zeros((j, du), jnp.bfloat16)], 0)
                g_j = jnp.concatenate(
                    [gid_s[j:], jnp.full((j,), n, jnp.int32)], 0)
                total = total + jnp.where((g_j == gid_s)[:, None],
                                          r_j.astype(jnp.float32), 0.0)
            cum = jnp.cumsum(entry_counts)
            seg_start = jnp.minimum(cum - entry_counts, m - 1)
            outr = jnp.take(total, seg_start, axis=0)
            return jnp.where((entry_counts > 0)[:, None], outr, 0.0)

        d_feat = jax.lax.cond(n_dropped <= drop_cap, sort_route,
                              fallback_route, g_flat)
    else:
        d_feat = fallback_route(g_flat)
    if du < d:
        d_feat = jnp.pad(d_feat, ((0, 0), (0, d - du)))

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    d_counts = None if entry_counts is None else f0(entry_counts)
    return (d_feat, f0(entry_lists), f0(sorted_entries), f0(sorted_tiles),
            f0(starts), f0(tile_counts), d_counts)


entry_gather.defvjp(_entry_gather_fwd, _entry_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def entry_gather_windows(feat, entry_lists, window_starts, counts,
                         sorted_entries, k_dup: int,
                         route_lanes: int | None = None):
    """entry_gather for R arbitrary stream windows — the compact overflow
    continuation gathers ONLY the overflowed tiles' windows instead of a
    full [T, K] table. entry_lists [R, K] (-1 invalid), window_starts [R]
    stream position of each window's first entry, counts [R] valid lengths
    (windows are disjoint: each lies inside its tile's stream segment)."""
    idx = jnp.where(entry_lists >= 0, entry_lists // k_dup, 0)
    return feat[idx]


def _egw_fwd(feat, entry_lists, window_starts, counts, sorted_entries,
             k_dup, route_lanes=None):
    out = entry_gather_windows(feat, entry_lists, window_starts, counts,
                               sorted_entries, k_dup, route_lanes)
    return out, (feat.shape, entry_lists.shape, window_starts, counts,
                 sorted_entries)


def _egw_bwd(k_dup, route_lanes, residuals, g):
    """Transpose via the same scatter-free route as entry_gather: build the
    stream-position -> gradient-row map for the R windows with a TINY
    boundary scatter (2R deltas) + cumsum, then one sort routes rows to
    entry order."""
    import numpy as np

    (feat_shape, lists_shape, window_starts, counts,
     sorted_entries) = residuals
    n, d = feat_shape
    r_blocks, k_max = lists_shape
    e_total = sorted_entries.shape[0]
    du = d if route_lanes is None else min(route_lanes, d)
    g_flat = g.reshape(-1, d)[:, :du]

    ws = jnp.minimum(window_starts.astype(jnp.int32), e_total)
    we = jnp.minimum(ws + counts.astype(jnp.int32), e_total)
    c_val = jnp.arange(r_blocks, dtype=jnp.int32) * k_max - ws
    base = jnp.zeros(e_total + 1, jnp.int32).at[ws].add(c_val, mode="drop")
    base = base.at[we].add(-c_val, mode="drop")
    ind = jnp.zeros(e_total + 1, jnp.int32).at[ws].add(1, mode="drop")
    ind = ind.at[we].add(-1, mode="drop")
    base = jnp.cumsum(base)[:e_total]
    ind = jnp.cumsum(ind)[:e_total]
    iota = jnp.arange(e_total, dtype=jnp.int32)
    ridx = jnp.where(ind > 0, iota + base, jnp.int32(-1))

    _, ptr = jax.lax.sort((sorted_entries, ridx), num_keys=1,
                          is_stable=False)
    ok = ptr >= 0
    rows = jnp.take(g_flat.astype(jnp.bfloat16), jnp.where(ok, ptr, 0),
                    axis=0)
    rows = jnp.where(ok[:, None], rows, jnp.bfloat16(0))
    sel = jnp.tile(jnp.eye(du, dtype=jnp.bfloat16), (k_dup, 1))
    d_feat = jax.lax.dot_general(
        rows.reshape(n, k_dup * du), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if du < d:
        d_feat = jnp.pad(d_feat, ((0, 0), (0, d - du)))
    f0 = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (d_feat, f0(lists_shape), f0(window_starts.shape),
            f0(counts.shape), f0(sorted_entries.shape))


entry_gather_windows.defvjp(_egw_fwd, _egw_bwd)


def _blend_tile_chunk(xy, conic, opacity, rgb, valid, pix_x, pix_y):
    """Blend a chunk of tiles at once (background composited by the caller).

    xy [C,K,2], conic [C,K,3], opacity [C,K], rgb [C,K,3], valid [C,K]
    pix_x, pix_y: [C,P] pixel coordinates of each tile's pixels
    Returns (color [C,P,3], final_T [C,P], n_contrib [C,P]).
    """
    dx = xy[..., 0:1] - pix_x[:, None, :]  # [C,K,P]
    dy = xy[..., 1:2] - pix_y[:, None, :]
    power = (
        -0.5 * (conic[..., 0:1] * dx * dx + conic[..., 2:3] * dy * dy)
        - conic[..., 1:2] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[..., None] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    alpha = jnp.where(valid[..., None], alpha, 0.0)

    S = jnp.cumprod(1.0 - alpha, axis=1)
    T = jnp.concatenate([jnp.ones_like(S[:, :1]), S[:, :-1]], axis=1)
    counted = S >= T_EPS
    w = alpha * T * counted  # [C,K,P]
    color = jnp.einsum("ckp,ckd->cpd", w, rgb,
                       preferred_element_type=jnp.float32)
    final_T = jnp.min(jnp.where(counted, S, 1.0), axis=1)
    n_contrib = jnp.sum((counted & (alpha > 0.0)).astype(jnp.int32), axis=1)
    return color, final_T, n_contrib


def render_binned(
    prep: Preprocessed,
    opacities: jnp.ndarray,
    binning: TileBinning,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = TILE,
    tiles_per_chunk: int = 16,
    k_dup: int = 64,
) -> RenderOutput:
    """Blend pre-binned Gaussians into the image."""
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy
    p = tile * tile

    # tile_lists carry ENTRY ids (gaussian * k_dup + slot), depth-ordered.
    xy_s = prep.means2d
    conic_s = prep.conics
    rgb_s = prep.rgb
    op_s = opacities

    # Pad tile axis to a multiple of the chunk size.
    num_chunks = -(-num_tiles // tiles_per_chunk)
    pad_t = num_chunks * tiles_per_chunk - num_tiles
    tl = jnp.pad(binning.tile_lists, ((0, pad_t), (0, 0)), constant_values=-1)

    tids = jnp.arange(num_chunks * tiles_per_chunk, dtype=jnp.int32)
    tx = (tids % gx).astype(jnp.float32)
    ty = (tids // gx).astype(jnp.float32)
    py_in = jnp.arange(tile, dtype=jnp.float32)
    px_in = jnp.arange(tile, dtype=jnp.float32)
    pyy, pxx = jnp.meshgrid(py_in, px_in, indexing="ij")
    pix_x_all = tx[:, None] * tile + pxx.reshape(-1)[None, :]  # [T', P]
    pix_y_all = ty[:, None] * tile + pyy.reshape(-1)[None, :]

    @jax.checkpoint
    def do_chunk(args):
        lists, pix_x, pix_y = args
        valid = lists >= 0
        li = jnp.where(valid, lists // k_dup, 0)
        c, t, n = _blend_tile_chunk(
            xy_s[li], conic_s[li], op_s[li], rgb_s[li], valid,
            pix_x, pix_y,
        )
        return c, t, n

    lists_c = tl.reshape(num_chunks, tiles_per_chunk, -1)
    pix_x_c = pix_x_all.reshape(num_chunks, tiles_per_chunk, p)
    pix_y_c = pix_y_all.reshape(num_chunks, tiles_per_chunk, p)
    colors, ts, ns = jax.lax.map(do_chunk, (lists_c, pix_x_c, pix_y_c))
    # [num_chunks, C, P, 3] -> [T', P, 3]
    colors = colors.reshape(-1, p, 3)[:num_tiles]
    ts = ts.reshape(-1, p)[:num_tiles]
    ns = ns.reshape(-1, p)[:num_tiles]

    def tiles_to_image(x):
        """[T, P, ...] -> [gy*tile, gx*tile, ...] -> crop to [H, W, ...]."""
        extra = x.shape[2:]
        img = x.reshape(gy, gx, tile, tile, *extra)
        img = jnp.moveaxis(img, 2, 1).reshape(gy * tile, gx * tile, *extra)
        return img[:height, :width]

    image = tiles_to_image(colors + ts[..., None] * bg_color[None, None, :])
    final_T = tiles_to_image(ts)
    n_contrib = tiles_to_image(ns)
    return RenderOutput(
        image=jnp.transpose(image, (2, 0, 1)),
        final_T=final_T,
        n_contrib=n_contrib,
    )


def render_pallas(
    prep: Preprocessed,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    max_tiles_per_gaussian: int = 16,
    max_per_tile: int = 1024,
    overflow_passes: int = 1,
    overflow_capacity: int = 512,
    overflow_compact: int = 128,
) -> tuple[RenderOutput, TileBinning]:
    """Pallas-kernel blend path: bin at 32px tiles, pack entries, run the
    fused per-tile kernel (ops/pallas/blend.py), assemble the image.

    The [T, K, 16] entry gather is a single XLA gather whose transpose
    (scatter-add) routes the kernel's per-entry gradients back to Gaussians —
    the TPU answer to the reference backward's atomicAdd accumulation
    (cuda_rasterizer/backward.cu:398-557).

    overflow_passes > 1 runs continuation blend passes over the depth-tail
    entries of tiles whose count exceeds max_per_tile. Front-to-back
    compositing is homogeneous degree-1 in the incoming transmittance
    (every term of pass p scales by T_{p-1} per pixel), so
    C = C_1 + T_1*C_2' and T = T_1*T_2' (primed = pass blended from T=1) is
    EXACT — no kernel state threading needed, and the products differentiate
    through the pallas custom VJPs by the chain rule.
    """
    from photo_slam_tpu.ops.pallas.blend import FEAT, TILE_PS, pallas_blend
    from photo_slam_tpu.ops.preprocess import tight_extents

    tile = TILE_PS
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy

    binning = bin_gaussians(
        jax.lax.stop_gradient(prep.means2d),
        jax.lax.stop_gradient(prep.depths),
        prep.radii,
        prep.visible,
        width,
        height,
        tile=tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile,
        extents=jax.lax.stop_gradient(
            tight_extents(prep.conics, opacities, prep.radii)),
    )

    # Pack per-Gaussian features (original order — tile_lists carry original
    # indices in depth order): [N, 16].
    n = prep.means2d.shape[0]
    feat = jnp.concatenate(
        [
            prep.means2d,
            prep.conics,
            opacities[:, None],
            prep.rgb,
            jnp.zeros((n, FEAT - 9), jnp.float32),
        ],
        axis=-1,
    )

    data_tiles = entry_gather(feat, binning.tile_lists,
                              binning.sorted_entries, binning.sorted_tiles,
                              binning.starts, binning.tile_counts,
                              binning.entry_counts, max_tiles_per_gaussian,
                              0, ROUTE_LANES_PACKED)  # [T, K, 16]

    color, final_t, n_contrib = pallas_blend(
        data_tiles, binning.tile_counts, gx, num_tiles)

    # Overflow continuation passes (exact, see docstring). The COMPACT path
    # (overflow_compact > 0) runs each continuation only over the
    # `overflow_compact` tiles with the largest RESIDUAL LIGHT — overflow
    # concentrates in a few tiles, so a full [T, K] second pass wastes ~85%
    # of its gather/blend on empty windows. Ranking by the pass-1 per-tile
    # error bound sum_px(final_T) x overflowed (instead of raw depth) makes
    # skipping saturated tiles lossless: a tile whose every pixel has
    # T < 1e-4 cannot change by more than that, while a shallow-but-
    # transmissive overflowed tile (the actual error producers) always gets
    # its continuation. Tiles beyond the subset keep 1-pass results (the
    # residual is counted in num_overflow).
    from photo_slam_tpu.ops.binning import window_lists
    t_sub = min(overflow_compact, num_tiles) if overflow_compact else 0
    if 0 < t_sub < num_tiles:
        t_res = jnp.sum(jax.lax.stop_gradient(final_t)
                        .reshape(num_tiles, -1), axis=-1)
        overflowed = binning.raw_counts > max_per_tile
        score = jnp.where(overflowed, t_res, -1.0)
        order = jnp.argsort(-score).astype(jnp.int32)[:t_sub]
    else:
        order = None
    for p in range(1, overflow_passes):
        offset = max_per_tile + (p - 1) * overflow_capacity
        if order is not None:
            starts_sub = binning.starts[order] + offset
            counts_sub = jnp.clip(binning.raw_counts[order] - offset, 0,
                                  overflow_capacity)
            from photo_slam_tpu.ops.binning import (_on_tpu,
                                                    _window_gather_pallas,
                                                    _window_gather_xla)
            window = (_window_gather_pallas if _on_tpu()
                      else _window_gather_xla)(
                binning.sorted_entries, starts_sub, overflow_capacity)
            in_range = (jnp.arange(overflow_capacity, dtype=jnp.int32)[None]
                        < counts_sub[:, None])
            lists_p = jnp.where(in_range, window, -1)
            data_p = entry_gather_windows(feat, lists_p, starts_sub,
                                          counts_sub, binning.sorted_entries,
                                          max_tiles_per_gaussian,
                                          ROUTE_LANES_PACKED)
            c_p, t_p, n_p = pallas_blend(data_p, counts_sub, gx, t_sub,
                                         order)
            onehot = (jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
                      == order[None, :]).astype(jnp.float32)

            def expand(x):
                # HIGHEST precision: the default TPU bf16 matmul would
                # re-round the continuation colors/transmittance the blend
                # kernel computed exactly, and corrupt n_contrib > 256.
                flat = x.reshape(t_sub, -1)
                out = jnp.matmul(onehot, flat,
                                 precision=jax.lax.Precision.HIGHEST)
                return out.reshape((num_tiles,) + x.shape[1:])

            color = color + final_t[:, None] * expand(c_p)
            n_contrib = n_contrib + expand(
                n_p.astype(jnp.float32)).astype(jnp.int32)
            final_t = final_t * (expand(t_p - 1.0) + 1.0)
        else:
            lists_p, counts_p = window_lists(binning, offset,
                                            overflow_capacity)
            data_p = entry_gather(feat, lists_p, binning.sorted_entries,
                                  binning.sorted_tiles, binning.starts,
                                  counts_p, None, max_tiles_per_gaussian,
                                  offset, ROUTE_LANES_PACKED)
            c_p, t_p, n_p = pallas_blend(data_p, counts_p, gx, num_tiles)
            color = color + final_t[:, None] * c_p
            n_contrib = n_contrib + n_p
            final_t = final_t * t_p

    # Exact residual-overflow accounting: credit each tile only with the
    # continuation capacity it actually received (the compact path covers
    # the `order` subset chosen above by residual light, NOT the deepest
    # tiles by raw count).
    if overflow_passes > 1:
        extra_cap = (overflow_passes - 1) * overflow_capacity
        rc = binning.raw_counts
        per_tile_over = jnp.maximum(rc - max_per_tile, 0)
        if order is not None:
            covered = jnp.sum(jnp.minimum(per_tile_over[order], extra_cap))
            residual = binning.num_overflow - covered
        else:
            residual = jnp.sum(jnp.maximum(per_tile_over - extra_cap, 0))
        binning = binning._replace(num_overflow=residual)

    # [T, 3, 8, 128] -> image. Pixel p = r*32 + c, flattened as 8x128.
    def tiles_to_image(x):
        extra = x.shape[1:-2]
        flat = x.reshape((num_tiles,) + extra + (tile, tile))
        img = flat.reshape((gy, gx) + extra + (tile, tile))
        # [gy, gx, ..., r, c] -> [..., gy, r, gx, c]
        nex = len(extra)
        perm = (
            tuple(range(2, 2 + nex))        # extra dims first
            + (0, 2 + nex, 1, 3 + nex)      # gy, r, gx, c
        )
        img = jnp.transpose(img, perm)
        img = img.reshape(extra + (gy * tile, gx * tile))
        return img[..., :height, :width]

    image = tiles_to_image(color) + tiles_to_image(final_t)[None] * (
        bg_color[:, None, None])
    out = RenderOutput(
        image=image,
        final_T=tiles_to_image(final_t),
        n_contrib=tiles_to_image(n_contrib),
    )
    return out, binning


def render_tiled(
    prep: Preprocessed,
    opacities: jnp.ndarray,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 64,
    max_per_tile: int = 512,
    tiles_per_chunk: int = 16,
) -> tuple[RenderOutput, TileBinning]:
    """Full tiled path: bin then blend. Returns the binning for diagnostics."""
    from photo_slam_tpu.ops.preprocess import tight_extents

    binning = bin_gaussians(
        jax.lax.stop_gradient(prep.means2d),
        jax.lax.stop_gradient(prep.depths),
        prep.radii,
        prep.visible,
        width,
        height,
        tile=tile,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        max_per_tile=max_per_tile,
        extents=jax.lax.stop_gradient(
            tight_extents(prep.conics, opacities, prep.radii)),
    )
    out = render_binned(prep, opacities, binning, width, height, bg_color,
                        tile=tile, tiles_per_chunk=tiles_per_chunk,
                        k_dup=max_tiles_per_gaussian)
    return out, binning
