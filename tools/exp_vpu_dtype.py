"""Microbenchmark: VPU elementwise throughput f32 vs bf16 in a Pallas kernel.

If bf16 vector ALU ops run 2x (packed) on this TPU, the blend kernels'
elementwise inner loops (exp/mul/add/select chains) should run in bf16 with
f32 accumulation. If bf16 matches f32, only memory traffic shrinks and the
compute-bound kernels stay f32.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 64
P = 1024
INNER = 256  # elementwise chain length per block


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        one = jnp.full((), 1.000001, dtype)
        half = jnp.full((), 0.5, dtype)
        a = x_ref[0]
        b = a * half + one
        for _ in range(INNER):
            # 4 ops per iteration: mul, add, sub-mul, select-ish max.
            a = a * b + one
            b = jnp.maximum(b * half, a - b)
        o_ref[0] = a + b

    return kernel


def run(dtype, num_blocks=512, reps=30):
    x = jnp.asarray(
        np.random.RandomState(0).rand(num_blocks, ROWS, P) * 0.001, dtype)
    f = pl.pallas_call(
        make_kernel(dtype),
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, ROWS, P), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, P), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, ROWS, P), dtype),
    )
    f = jax.jit(f)
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    ops = num_blocks * ROWS * P * INNER * 4
    print(f"{str(dtype):10s} {dt * 1000:8.2f} ms  "
          f"{ops / dt / 1e12:6.2f} Tops/s")
    return dt


def run_exp(dtype, num_blocks=512, reps=30):
    """Same but the chain is exp-heavy (the blend kernel's transcendental)."""
    def kernel(x_ref, o_ref):
        a = x_ref[0]
        acc = a
        for _ in range(32):
            acc = acc + jnp.exp(-a) * jnp.asarray(0.01, dtype)
            a = a * jnp.asarray(1.01, dtype)
        o_ref[0] = acc

    x = jnp.asarray(
        np.random.RandomState(0).rand(num_blocks, ROWS, P), dtype)
    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((1, ROWS, P), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, P), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks, ROWS, P), dtype),
    ))
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    exps = num_blocks * ROWS * P * 32
    print(f"exp {str(dtype):10s} {dt * 1000:8.2f} ms  "
          f"{exps / dt / 1e9:7.1f} Gexp/s")


def main():
    for dtype in (jnp.float32, jnp.bfloat16):
        run(dtype)
    for dtype in (jnp.float32, jnp.bfloat16):
        run_exp(dtype)


if __name__ == "__main__":
    main()
