"""Stage timing of the entry_gather sort-routed transpose at bench shapes:
(1) dropped-key compaction (1-op full-stream sort), (2) the payload sort,
(3) stencil segment-sum, (4) the per-Gaussian segment-start row gather.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_transpose_stages.py
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
    from photo_slam_tpu.ops.pallas.blend import FEAT, TILE_PS
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
    b = bin_gaussians(prep.means2d, prep.depths, prep.radii, prep.visible,
                      width, height, tile=tile, max_tiles_per_gaussian=k_dup,
                      max_per_tile=per_tile,
                      extents=tight_extents(prep.conics, op, prep.radii))

    e_total = b.sorted_entries.shape[0]
    t_k = num_tiles * per_tile
    du = tiled_mod.ROUTE_LANES_PACKED
    drop_cap = min(tiled_mod._DROP_CAP, e_total)
    INT_MAX = jnp.int32(2**31 - 1)
    g_rows = jnp.asarray(rng.randn(t_k, du).astype(np.float32))

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t1) / reps * 1000.0

    # slot_k / dropped mask (shared prologue).
    def prologue(starts, sorted_tiles):
        deltas = jnp.diff(starts)
        ss = jnp.zeros(e_total, jnp.int32).at[starts[1:]].add(deltas,
                                                              mode="drop")
        ss = jnp.cumsum(ss)
        iota = jnp.arange(e_total, dtype=jnp.int32)
        slot_k = iota - ss
        dropped = (sorted_tiles < num_tiles) & (slot_k >= per_tile)
        return slot_k, dropped

    pro = jax.jit(prologue)
    slot_k, dropped = jax.block_until_ready(pro(b.starts, b.sorted_tiles))
    ms_pro = timeit(pro, b.starts, b.sorted_tiles)

    # (1) dropped-key compaction.
    comp = jax.jit(lambda d, se: jnp.sort(
        jnp.where(d, se, INT_MAX))[:drop_cap])
    dkeys = jax.block_until_ready(comp(dropped, b.sorted_entries))
    ms_comp = timeit(comp, dropped, b.sorted_entries)

    # (2) the payload sort.
    def big_sort(g_flat, dk):
        rows = g_flat.astype(jnp.bfloat16)
        packed = jax.lax.bitcast_convert_type(
            rows.reshape(t_k, du // 2, 2), jnp.int32)
        keys_tab = b.tile_lists.reshape(-1)
        keys_tab = jnp.where(keys_tab < 0, INT_MAX, keys_tab)
        keys_all = jnp.concatenate([keys_tab, dk])
        zpad = jnp.zeros((drop_cap,), jnp.int32)
        ops = [keys_all] + [jnp.concatenate([packed[:, i], zpad])
                            for i in range(du // 2)]
        return jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)

    bs = jax.jit(big_sort)
    sorted_out = jax.block_until_ready(bs(g_rows, dkeys))
    ms_sort = timeit(bs, g_rows, dkeys)

    # (3) stencil segment-sum + (4) the segment-start gather.
    def stencil(out):
        rows_s = jax.lax.bitcast_convert_type(
            jnp.stack(out[1:], axis=1), jnp.bfloat16).reshape(-1, du)
        keys_s = out[0]
        gid_s = jnp.where(keys_s == INT_MAX, jnp.int32(n), keys_s // k_dup)
        m = t_k + drop_cap
        total = rows_s.astype(jnp.float32)
        for j in range(1, k_dup):
            r_j = jnp.concatenate(
                [rows_s[j:], jnp.zeros((j, du), jnp.bfloat16)], 0)
            g_j = jnp.concatenate(
                [gid_s[j:], jnp.full((j,), n, jnp.int32)], 0)
            total = total + jnp.where((g_j == gid_s)[:, None],
                                      r_j.astype(jnp.float32), 0.0)
        return total

    st = jax.jit(stencil)
    total = jax.block_until_ready(st(sorted_out))
    ms_stencil = timeit(st, sorted_out)

    def seg_gather(total):
        cum = jnp.cumsum(b.entry_counts)
        seg_start = jnp.minimum(cum - b.entry_counts,
                                t_k + drop_cap - 1)
        outr = jnp.take(total, seg_start, axis=0)
        return jnp.where((b.entry_counts > 0)[:, None], outr, 0.0)

    sg = jax.jit(seg_gather)
    jax.block_until_ready(sg(total))
    ms_gather = timeit(sg, total)

    report = {
        "e_total": int(e_total), "t_k": int(t_k), "drop_cap": int(drop_cap),
        "n_dropped": int(np.asarray(dropped).sum()),
        "prologue_ms": round(ms_pro, 2),
        "dkeys_compaction_ms": round(ms_comp, 2),
        "payload_sort_ms": round(ms_sort, 2),
        "stencil_ms": round(ms_stencil, 2),
        "seg_gather_ms": round(ms_gather, 2),
    }
    log(f"[stages] {report}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()


def compaction_variants():
    """Compare dropped-key compaction strategies (run after main)."""
    import jax
    import jax.numpy as jnp
    import time
    cache_dir = Path(os.environ.get("SOAK_JAX_CACHE",
                                    "/tmp/soak30k_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    rng = np.random.RandomState(1)
    e_total = 1_800_000
    n_dropped = 48_000
    INT_MAX = jnp.int32(2**31 - 1)
    ids = rng.permutation(e_total).astype(np.int32)
    dropped = np.zeros(e_total, bool)
    dropped[rng.choice(e_total, n_dropped, replace=False)] = True
    ids_j = jnp.asarray(ids)
    dropped_j = jnp.asarray(dropped)

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t1 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t1) / reps * 1000.0

    out = {}
    for cap_name, cap in (("2^18", 1 << 18), ("2^16", 1 << 16)):
        srt = jax.jit(lambda d, se: jnp.sort(
            jnp.where(d, se, INT_MAX))[:cap])
        out[f"sort_cap{cap_name}"] = round(timeit(srt, dropped_j, ids_j), 2)
        tk = jax.jit(lambda d, se: -jax.lax.top_k(
            jnp.where(d, -se, -INT_MAX), cap)[0])
        a = np.sort(np.asarray(srt(dropped_j, ids_j)))
        bb = np.sort(np.asarray(tk(dropped_j, ids_j)))
        assert (a == bb).all()
        out[f"topk_cap{cap_name}"] = round(timeit(tk, dropped_j, ids_j), 2)
    log(f"[compaction] {out}")
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("STAGE_COMPACTION"):
    compaction_variants()
