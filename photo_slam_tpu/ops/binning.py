"""Tile binning: build depth-ordered per-tile Gaussian lists, statically shaped.

The reference builds dynamic per-tile lists with an inclusive scan + 64-bit
radix sort of (tileID | depth) keys + range extraction
(reference: cuda_rasterizer/rasterizer_impl.cu:70-336). That design needs
dynamic allocation (num_rendered is data-dependent) and a device radix sort —
neither is TPU-idiomatic. Here the same result is produced with static shapes:

  1. expand each Gaussian to at most MAX_TILES_PER_GAUSSIAN tile slots from
     its screen rect (radius clamped so the rect fits; clips are counted);
  2. pack (tile_id, depth) into ONE int32 key per slot — positive IEEE-754
     floats compare monotonically as integers, so the top bits of the depth's
     bit pattern ARE a depth order (the reference packs tileID|float-bits
     into 64-bit keys for its radix sort, rasterizer_impl.cu:70-111; here 31
     bits suffice because only a quantized depth orders *within* a tile);
  3. ONE unstable single-key sort of the N*K keys with the original Gaussian
     index as payload;
  4. per-tile ranges by binary search over key boundaries, then a static
     [num_tiles, K_MAX] gather (per-tile overflow beyond K_MAX is dropped
     and counted).

The overflow/clip counters are surfaced so callers can grow capacities.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # tile edge in pixels (reference: cuda_rasterizer/config.h BLOCK_X/Y)


def _window_gather_xla(sorted_entries: jnp.ndarray, starts: jnp.ndarray,
                       max_per_tile: int) -> jnp.ndarray:
    idx = starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, sorted_entries.shape[0] - 1)
    return sorted_entries[idx]


def _window_gather_pallas(sorted_entries: jnp.ndarray, starts: jnp.ndarray,
                          max_per_tile: int,
                          interpret: bool = False) -> jnp.ndarray:
    """[T, K] windows sorted_entries[starts[t] : starts[t]+K].

    Each tile's window is CONTIGUOUS in the sorted stream, but XLA only sees
    a [T, K] random gather (measured ~10 ms at 837x1024 over a 2.4M table on
    v5e). Here each grid step issues ONE ragged dynamic-offset DMA from HBM
    instead — piecewise-contiguous copies, not gathers.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e_total = sorted_entries.shape[0]
    # Clamp: continuation windows (window_lists with offset>0) can request
    # starts past the stream end for tiles whose segment is exhausted. Their
    # counts are 0 so the caller masks the values — but the aligned dynamic-
    # offset DMA below would read past the padded buffer (OOB HBM DMA).
    # Clamped to e_total, every aligned window stays inside e_pad.
    starts = jnp.minimum(starts, jnp.int32(e_total))
    num_tiles = starts.shape[0]
    rows = 8            # tiles per grid step (VMEM sublane alignment)
    align = 1024        # HBM int32 tiling: dynamic DMA offsets must be
                        # multiples of it, so copy [aligned, aligned+K+align)
                        # and funnel-shift in registers.
    k = max_per_tile
    assert k % 128 == 0
    sub = k // 128      # sublane rows of one K-window viewed as [sub, 128]
    # Buffer covers k + align entries, rounded UP to a multiple of align so
    # buf_sub is a multiple of 8 — dynamic sublane rolls need 8-aligned
    # vector shapes (e.g. k=512 would otherwise give a 12-sublane vector,
    # which Mosaic cannot legalize).
    buf_entries = -(-(k + align) // align) * align
    buf_sub = buf_entries // 128
    t_pad = -(-num_tiles // rows) * rows
    starts_p = jnp.pad(starts, (0, t_pad - num_tiles))
    # Pad the stream so an aligned window never reads out of bounds, and view
    # it as [rows_of_128, 128]: aligned window row starts are multiples of 8,
    # which satisfies the (8, 128) HBM tiling for dynamic DMA offsets.
    e_pad = -(-e_total // align) * align + buf_entries
    stream = jnp.pad(sorted_entries, (0, e_pad - e_total)).reshape(-1, 128)

    def kernel(starts_ref, se_ref, out_ref, buf, sems):
        g = pl.program_id(0)
        for i in range(rows):
            s0row = (starts_ref[g * rows + i] // align) * (align // 128)
            pltpu.make_async_copy(
                se_ref.at[pl.ds(s0row, buf_sub)], buf.at[i], sems.at[i]
            ).start()
        for i in range(rows):
            s = starts_ref[g * rows + i]
            s0row = (s // align) * (align // 128)
            pltpu.make_async_copy(
                se_ref.at[pl.ds(s0row, buf_sub)], buf.at[i], sems.at[i]
            ).wait()
            r = s - s0row * 128              # in [0, align)
            rs = r // 128
            rl = r % 128
            b2 = buf[i]                      # [buf_sub, 128]
            # 1D LEFT shift by r = rs*128 + rl over the window: sublane roll
            # by rs, then a lane funnel-shift by rl (pltpu.roll wants
            # non-negative shifts; left shift s == roll n-s).
            a = pltpu.roll(b2, (buf_sub - rs) % buf_sub, 0)
            b = pltpu.roll(a, (128 - rl) % 128, 1)
            bn = pltpu.roll(pltpu.roll(a, buf_sub - 1, 0),
                            (128 - rl) % 128, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (buf_sub, 128), 1)
            shifted = jnp.where(lane < 128 - rl, b, bn)
            out_ref[i] = shifted[:sub]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_pad // rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, sub, 128), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, buf_sub, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA((rows,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, sub, 128), jnp.int32),
        interpret=interpret,
    )(starts_p, stream)
    return out[:num_tiles].reshape(num_tiles, k)


def _on_tpu() -> bool:
    plat = jax.devices()[0].platform
    kind = getattr(jax.devices()[0], "device_kind", "")
    return plat in ("tpu", "axon") or "TPU" in str(kind)


class TileBinning(NamedTuple):
    """Static-shape binning result.

    tile_lists:  [T, K_MAX] int32 — per tile, ENTRY ids in front-to-back
                 depth order (-1 past the count). An entry id is
                 gaussian_index * k_dup + slot; entry ids are UNIQUE across
                 all tiles, which lets the render backward scatter per-entry
                 gradients without collisions (see ops/tiled.entry_gather).
                 Gaussian index = entry_id // k_dup.
    tile_counts: [T] int32 — valid entries per tile (<= K_MAX)
    num_clipped: [] int32 — Gaussians whose rect was clipped to fit K_dup
    num_overflow:[] int32 — per-tile entries dropped beyond K_MAX
    """

    tile_lists: jnp.ndarray
    tile_counts: jnp.ndarray
    num_clipped: jnp.ndarray
    num_overflow: jnp.ndarray
    # The raw sort products, kept for the scatter-free render backward
    # (ops/tiled.entry_gather): sorted_entries [N*k_dup] is the permutation
    # of all entry ids by (tile, depth) key; sorted_tiles [N*k_dup] the tile
    # id at each sorted position; starts [T] the per-tile offsets.
    sorted_entries: jnp.ndarray
    sorted_tiles: jnp.ndarray
    starts: jnp.ndarray
    # Unclipped per-tile entry counts (tile_counts = min(raw_counts, K_MAX));
    # overflow continuation passes window in from raw_counts.
    raw_counts: jnp.ndarray
    # Per-GAUSSIAN emitted-entry count (clipped rect area, <= k_dup; 0 for
    # invisible). Entry ids gid*k_dup+slot are emitted for slot <
    # entry_counts[gid], so sorting all emitted entry ids groups them into
    # per-gaussian segments of exactly these lengths — the basis of the
    # sort-routed gradient transpose (ops/tiled._entry_gather_bwd).
    entry_counts: jnp.ndarray


def tile_grid(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return (-(-width // tile), -(-height // tile))


def compute_rects(means2d: jnp.ndarray, radii: jnp.ndarray, width: int,
                  height: int, tile: int = TILE, extents=None):
    """Per-Gaussian tile rect [x0, y0, x1, y1) like getRect
    (reference: cuda_rasterizer/auxiliary.h:46-56).

    With `extents` [N, 2] (per-axis half-widths, see
    ops/preprocess.tight_extents) the rect is the tight bounding box of the
    visible footprint instead of the circumscribed radius square.
    """
    gx, gy = tile_grid(width, height, tile)
    if extents is None:
        rx = ry = radii.astype(jnp.float32)
    else:
        rx, ry = extents[:, 0], extents[:, 1]
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - rx) / tile), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - ry) / tile), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + rx + tile - 1) / tile), 0, gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + ry + tile - 1) / tile), 0, gy).astype(jnp.int32)
    return x0, y0, x1, y1


def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 64,
    max_per_tile: int = 512,
    extents=None,
) -> TileBinning:
    """Build depth-ordered per-tile lists. All shapes static.

    Gaussians whose tile rect exceeds `max_tiles_per_gaussian` slots keep the
    rect *centered* on their projected mean but clipped — this bounds the
    duplication factor the way the reference's dynamic num_rendered cannot.
    `extents` [N, 2] switches to tight per-axis footprint rects.
    """
    n = means2d.shape[0]
    gx, gy = tile_grid(width, height, tile)
    num_tiles = gx * gy
    k_dup = max_tiles_per_gaussian
    # Bits available for the in-key depth code (tile ids occupy the top).
    depth_bits = 31 - max(1, (num_tiles + 1)).bit_length()
    if depth_bits < 12:
        raise ValueError(f"too many tiles ({num_tiles}) for packed keys")

    xy_s = means2d
    radii_s = radii
    vis_s = visible
    if extents is not None:
        vis_s = vis_s & (extents[:, 0] > 0.0)

    x0, y0, x1, y1 = compute_rects(xy_s, radii_s, width, height, tile,
                                   extents=extents)
    rw = x1 - x0
    rh = y1 - y0
    area = rw * rh

    # 2. Clip rects (centered) so rw*rh <= k_dup. Shrink the larger side first
    #    by symmetric trimming around the tile containing the mean.
    needs_clip = (area > k_dup) & vis_s
    num_clipped = jnp.sum(needs_clip.astype(jnp.int32))

    def clip_side(lo, hi, center, max_len):
        """Trim [lo, hi) symmetrically around `center` to at most max_len."""
        length = hi - lo
        excess = jnp.maximum(length - max_len, 0)
        lo2 = lo + excess // 2
        hi2 = hi - (excess - excess // 2)
        # Keep the center tile inside.
        lo2 = jnp.minimum(lo2, center)
        hi2 = jnp.maximum(hi2, center + 1)
        return lo2, hi2

    cx = jnp.clip((xy_s[:, 0] / tile).astype(jnp.int32), 0, gx - 1)
    cy = jnp.clip((xy_s[:, 1] / tile).astype(jnp.int32), 0, gy - 1)
    # Limit each side to sqrt-ish budget: w <= k, h <= k_dup // w.
    side = int(max(1, int(k_dup**0.5)))
    max_w = jnp.where(needs_clip, jnp.int32(side), jnp.maximum(rw, 1))
    x0c, x1c = clip_side(x0, x1, cx, max_w)
    rw_c = jnp.maximum(x1c - x0c, 1)
    max_h = jnp.where(needs_clip, k_dup // rw_c, jnp.maximum(rh, 1))
    y0c, y1c = clip_side(y0, y1, cy, max_h)
    rw_f = x1c - x0c
    area_f = rw_f * (y1c - y0c)
    area_f = jnp.where(vis_s & (area > 0), area_f, 0)

    # 3. Emit ONE packed key per (gaussian, slot): [tile_id | depth_code].
    #    Positive IEEE floats are monotone as integers, so the top bits of
    #    the depth bit-pattern order by depth within each tile (the TPU-sized
    #    version of the reference's tileID<<32|float-bits 64-bit radix keys,
    #    rasterizer_impl.cu:70-111).
    depth_code = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(jnp.maximum(depths, 0.0), jnp.int32),
        31 - depth_bits,
    )
    slots = jnp.arange(k_dup, dtype=jnp.int32)
    # slot -> (dx, dy) within the rect. Integer div/mod on [N, k_dup] is
    # slow on the VPU; rw only takes k_dup distinct values, so select from a
    # precomputed per-width offset table instead (measured ~7 ms -> ~1 ms for
    # the key build at 2.4M entries).
    # Widths > k_dup (possible for clipped off-center rects) behave like the
    # plain slots%rw / slots//rw they replace: slots < k_dup so % is identity
    # and // is zero — the k_dup-width table row.
    rw_sel = jnp.clip(rw_f, 1, k_dup) - 1
    dx_tab = jnp.stack([(slots % w).astype(jnp.float32)
                        for w in range(1, k_dup + 1)])            # [k_dup, k]
    dy_tab = jnp.stack([(slots // w).astype(jnp.float32)
                        for w in range(1, k_dup + 1)])
    sel = jax.nn.one_hot(rw_sel, k_dup, dtype=jnp.float32)        # [N, k_dup]
    sx = x0c[:, None] + (sel @ dx_tab).astype(jnp.int32)
    sy = y0c[:, None] + (sel @ dy_tab).astype(jnp.int32)
    valid = slots[None, :] < area_f[:, None]
    tile_ids = (sy * gx + sx).astype(jnp.int32)
    sentinel = jnp.int32(num_tiles) << depth_bits
    keys = jnp.where(
        valid,
        (tile_ids << depth_bits) | depth_code[:, None],
        sentinel,
    )

    # Payload = flat ENTRY id (gaussian * k_dup + slot) — unique per entry.
    flat_keys = keys.reshape(-1)
    flat_entries = jnp.arange(n * k_dup, dtype=jnp.int32)

    # 4. ONE unstable sort (depth lives in the key; ties at the key's depth
    #    resolution are order-irrelevant).
    sorted_keys, sorted_entries = jax.lax.sort(
        (flat_keys, flat_entries), num_keys=1, is_stable=False
    )

    # Single binary search over tile boundaries: starts[t+1] == ends[t].
    bounds = jnp.searchsorted(
        sorted_keys,
        jnp.arange(num_tiles + 1, dtype=jnp.int32) << depth_bits,
        side="left",
    ).astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - starts
    num_overflow = jnp.sum(jnp.maximum(counts - max_per_tile, 0))
    tile_counts = jnp.minimum(counts, max_per_tile)

    in_range = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :] < tile_counts[:, None]
    window = (_window_gather_pallas if _on_tpu() else _window_gather_xla)(
        sorted_entries, starts, max_per_tile)
    tile_lists = jnp.where(in_range, window, -1)

    return TileBinning(
        tile_lists=tile_lists,
        tile_counts=tile_counts,
        num_clipped=num_clipped,
        num_overflow=num_overflow,
        sorted_entries=sorted_entries,
        sorted_tiles=jax.lax.shift_right_logical(
            sorted_keys, depth_bits).astype(jnp.int32),
        starts=starts,
        raw_counts=counts,
        # min with k_dup: emission is slots < area_f over k_dup slots, so a
        # clipped rect whose center-preserving adjustment leaves area_f >
        # k_dup still emits exactly k_dup entries — entry_counts must match
        # the EMITTED count or every later segment start shifts.
        entry_counts=jnp.minimum(area_f, k_dup).astype(jnp.int32),
    )


def window_lists(binning: TileBinning, offset: int,
                 capacity: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile entry lists for the window [offset, offset+capacity) of each
    tile's depth-ordered stream segment — the continuation windows of the
    multi-pass overflow renderer (ops/tiled.render_pallas).

    Returns (lists [T, capacity] with -1 padding, counts [T])."""
    counts = jnp.clip(binning.raw_counts - offset, 0, capacity)
    in_range = (jnp.arange(capacity, dtype=jnp.int32)[None, :]
                < counts[:, None])
    window = (_window_gather_pallas if _on_tpu() else _window_gather_xla)(
        binning.sorted_entries, binning.starts + offset, capacity)
    return jnp.where(in_range, window, -1), counts
