"""Gather microbenchmark round 2: interleaved-row and Pallas variants.

Round 1 (gather_micro.py): scalar 11.8 ns/elem, 2-u32 slice 13.3,
row[128]+lane-select 6.28 ns/elem. Here: one row gather serving BOTH
descriptors (depth+label interleaved in lanes), wider rows, and VMEM-
resident Pallas takes with legal block shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW = 640 * 480
NMAPS = 50
S = 7_526_400


def timeit(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    _ = float(jnp.sum(jnp.ones(3)))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.integers(0, 2**32, size=NMAPS * HW,
                                     dtype=np.uint64).astype(np.uint32))
    label = jnp.asarray(rng.integers(0, 2**32, size=NMAPS * HW,
                                     dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NMAPS * HW, size=S,
                                   dtype=np.int64).astype(np.int32))

    # A. interleaved [*, 128] rows: pixel k -> row k//64, lanes 2*(k%64),
    # +1. One row gather yields depth+label for one sample.
    inter = jnp.stack([depth, label], axis=-1).reshape(-1, 128)

    def f_inter(t, i):
        rows = jnp.take(t, i // 64, axis=0)          # [S, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        tgt = 2 * (i % 64)
        d = jnp.where(lane == tgt[:, None], rows, 0).sum(1)
        l = jnp.where(lane == tgt[:, None] + 1, rows, 0).sum(1)
        return (d + l).max()

    fA = jax.jit(f_inter)
    tA = timeit(lambda: jax.block_until_ready(fA(inter, idx)))
    print(f"A interleaved row+2select: {tA*1e3:.1f} ms = {tA/S*1e9:.2f} ns/sample (2 vals)")

    # B. two separate row gathers (depth table + label table)
    dr = depth.reshape(-1, 128)
    lr = label.reshape(-1, 128)

    def f_two(dt, lt, i):
        lane_row = i // 128
        lane = i % 128
        rd = jnp.take(dt, lane_row, axis=0)
        rl = jnp.take(lt, lane_row, axis=0)
        li = jax.lax.broadcasted_iota(jnp.int32, rd.shape, 1)
        m = li == lane[:, None]
        return (jnp.where(m, rd, 0).sum(1) + jnp.where(m, rl, 0).sum(1)).max()

    fB = jax.jit(f_two)
    tB = timeit(lambda: jax.block_until_ready(fB(dr, lr, idx)))
    print(f"B 2x row+select: {tB*1e3:.1f} ms = {tB/S*1e9:.2f} ns/sample (2 vals)")

    # C. one [*, 256] row (depth 128 lanes | label 128 lanes)
    wide = jnp.concatenate([depth.reshape(-1, 128), label.reshape(-1, 128)],
                           axis=1)

    def f_wide(t, i):
        rows = jnp.take(t, i // 128, axis=0)         # [S, 256]
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        tgt = (i % 128)[:, None]
        d = jnp.where(lane == tgt, rows, 0).sum(1)
        l = jnp.where(lane == tgt + 128, rows, 0).sum(1)
        return (d + l).max()

    fC = jax.jit(f_wide)
    tC = timeit(lambda: jax.block_until_ready(fC(wide, idx)))
    print(f"C wide256 row+2select: {tC*1e3:.1f} ms = {tC/S*1e9:.2f} ns/sample (2 vals)")

    # D. Pallas: VMEM-resident interleaved map (per grid step = one dst
    # map, 2.4 MB), jnp.take of rows + lane select inside the kernel.
    per = S // NMAPS
    idx_local = jnp.asarray(rng.integers(0, HW, size=(NMAPS, 8, per // 8),
                                         dtype=np.int64).astype(np.int32))
    inter3 = inter.reshape(NMAPS, HW // 64, 128)

    def kernD(tab_ref, idx_ref, out_ref):
        t = tab_ref[0]                       # [HW//64, 128]
        i = idx_ref[0].reshape(-1)           # [per]
        rows = jnp.take(t, i // 64, axis=0)  # [per, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        tgt = 2 * (i % 64)
        d = jnp.where(lane == tgt[:, None], rows, 0).sum(1)
        l = jnp.where(lane == tgt[:, None] + 1, rows, 0).sum(1)
        out_ref[0] = (d + l).reshape(8, per // 8)

    @jax.jit
    def fD(tab, il):
        return pl.pallas_call(
            kernD,
            grid=(NMAPS,),
            in_specs=[
                pl.BlockSpec((1, HW // 64, 128), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, per // 8), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, per // 8), lambda m: (m, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NMAPS, 8, per // 8),
                                           jnp.uint32),
        )(tab, il).max()

    try:
        tD = timeit(lambda: jax.block_until_ready(fD(inter3, idx_local)))
        print(f"D pallas vmem take rows: {tD*1e3:.1f} ms = {tD/S*1e9:.2f} ns/sample (2 vals)")
    except Exception as e:
        print(f"D pallas FAILED: {type(e).__name__}: {str(e)[:300]}")

    # E. Pallas scalar-table take: 1-D VMEM table + direct jnp.take
    # (does Mosaic have a native dynamic gather here?)
    dep3 = depth.reshape(NMAPS, HW // 128, 128)

    def kernE(tab_ref, idx_ref, out_ref):
        t = tab_ref[0].reshape(-1)
        i = idx_ref[0].reshape(-1)
        out_ref[0] = jnp.take(t, i).reshape(8, per // 8)

    @jax.jit
    def fE(tab, il):
        return pl.pallas_call(
            kernE,
            grid=(NMAPS,),
            in_specs=[
                pl.BlockSpec((1, HW // 128, 128), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, per // 8), lambda m: (m, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, per // 8), lambda m: (m, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NMAPS, 8, per // 8),
                                           jnp.uint32),
        )(tab, il).max()

    try:
        tE = timeit(lambda: jax.block_until_ready(fE(dep3, idx_local)))
        print(f"E pallas flat take: {tE*1e3:.1f} ms = {tE/S*1e9:.2f} ns/elem (1 val)")
    except Exception as e:
        print(f"E pallas flat FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
