"""Experiment: candidate implementations of the entry_gather backward
(gradient transpose) at production scale.

Current (ops/tiled._entry_gather_bwd): ptr-sort -> [E,16] row gather (bf16)
-> reshape-sum. The row gather is HBM-latency-bound (~7-12 ns/row) and the
reshape-sum lowers badly; candidates route the gradient VALUES through ONE
sort-with-payload (sorts vectorize on TPU where gathers do not) and do the
k_dup reduction as an MXU matmul against a block of stacked identities.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

FEAT = 16


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = 300_000
    k_dup = 6
    num_tiles = 836
    k_max = 1024
    e_total = n * k_dup
    rng = np.random.RandomState(0)
    perm = rng.permutation(e_total).astype(np.int32)
    sorted_entries = jnp.asarray(perm)
    # Synthetic but structurally faithful: tiles of the sorted stream.
    counts = rng.multinomial(e_total, np.ones(num_tiles) / num_tiles)
    starts = jnp.asarray(np.concatenate([[0], np.cumsum(counts)[:-1]])
                         .astype(np.int32))
    sorted_tiles = jnp.asarray(np.repeat(np.arange(num_tiles, dtype=np.int32),
                                         counts))
    g = jnp.asarray(rng.rand(num_tiles, k_max, FEAT).astype(np.float32))

    def build_ridx():
        deltas = jnp.diff(starts)
        ss = jnp.zeros(e_total, jnp.int32).at[starts[1:]].add(
            deltas, mode="drop")
        ss = jnp.cumsum(ss)
        iota = jnp.arange(e_total, dtype=jnp.int32)
        slot_k = iota - ss
        t = sorted_tiles
        valid = (t < num_tiles) & (slot_k >= 0) & (slot_k < k_max)
        return jnp.where(valid, t * k_max + slot_k, jnp.int32(-1))

    def current(gg):
        ridx = build_ridx()
        _, ptr = jax.lax.sort((sorted_entries, ridx), num_keys=1,
                              is_stable=False)
        ok = ptr >= 0
        g_flat = gg.reshape(-1, FEAT)
        rows = jnp.take(g_flat.astype(jnp.bfloat16), jnp.where(ok, ptr, 0),
                        axis=0)
        rows = jnp.where(ok[:, None], rows, jnp.bfloat16(0))
        return rows.reshape(n, k_dup, FEAT).sum(axis=1, dtype=jnp.float32)

    def sort_payload(gg):
        # Window the [T,K] grads back to stream order... they already ARE
        # addressable by (tile, slot); stream position i holds row
        # ridx[i] = t*K + slot. Building the stream-ordered rows without a
        # gather needs the kernel to emit them in stream order; here we
        # emulate by taking with a CONTIGUOUS-ish index (ridx ascending per
        # tile) — measure the sort cost separately below.
        ridx = build_ridx()
        ok = ridx >= 0
        g_flat = gg.reshape(-1, FEAT).astype(jnp.bfloat16)
        rows = jnp.take(g_flat, jnp.where(ok, ridx, 0), axis=0)
        rows = jnp.where(ok[:, None], rows, jnp.bfloat16(0))
        # Route values to entry order with ONE sort: key = sorted_entries,
        # payload = 8 int32 lanes holding 16 packed bf16.
        packed = jax.lax.bitcast_convert_type(
            rows.reshape(e_total, FEAT // 2, 2), jnp.int32)  # [E, 8]
        ops = [sorted_entries] + [packed[:, i] for i in range(FEAT // 2)]
        out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
        routed = jnp.stack(out[1:], axis=1)  # [E, 8] int32
        rows2 = jax.lax.bitcast_convert_type(
            routed, jnp.bfloat16).reshape(e_total, FEAT)  # [E,8,2]->[E,16]
        return rows2.reshape(n, k_dup, FEAT).sum(axis=1, dtype=jnp.float32)

    def reduce_sum(rows):
        return rows.reshape(n, k_dup, FEAT).sum(axis=1, dtype=jnp.float32)

    def reduce_mxu(rows):
        sel = jnp.tile(jnp.eye(FEAT, dtype=jnp.bfloat16), (k_dup, 1))
        return jax.lax.dot_general(
            rows.reshape(n, k_dup * FEAT), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rows_bf16 = jnp.asarray(
        rng.rand(e_total, FEAT).astype(np.float32)).astype(jnp.bfloat16)

    timeit("A  current (ptr-sort + take + sum)", jax.jit(current), g)
    timeit("B  sort-payload routing (take(contig)+sort)",
           jax.jit(sort_payload), g)
    timeit("C1 reduce: reshape-sum f32 (bf16 rows)", jax.jit(reduce_sum),
           rows_bf16)
    timeit("C2 reduce: MXU stacked-identity matmul", jax.jit(reduce_mxu),
           rows_bf16)
    # Sanity: same result.
    a = jax.jit(current)(g)
    b = jax.jit(sort_payload)(g)
    print("max |A-B|:", float(jnp.max(jnp.abs(a - b))))
    c1 = jax.jit(reduce_sum)(rows_bf16)
    c2 = jax.jit(reduce_mxu)(rows_bf16)
    print("max |C1-C2|:", float(jnp.max(jnp.abs(c1 - c2))))

    # D: the raw sort cost with 8 payloads (lower bound for B's routing).
    def raw_sort(p):
        ops = [sorted_entries] + [p[:, i] for i in range(FEAT // 2)]
        out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
        return out[1]

    packed = jnp.asarray(rng.randint(0, 2**31, (e_total, 8)).astype(np.int32))
    timeit("D  raw 1-key 8-payload sort @1.8M", jax.jit(raw_sort), packed)

    def raw_take(p):
        idx = jnp.asarray(perm)
        return jnp.take(p, idx, axis=0)

    rows_b = rows_bf16
    timeit("E  raw [E,16]bf16 random take", jax.jit(raw_take), rows_b)


if __name__ == "__main__":
    main()
