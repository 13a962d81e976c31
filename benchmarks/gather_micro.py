"""Microbenchmark TPU gather strategies for the SBA map-sampling hot
path (7.5M samples/iteration, 2 u32 descriptors each).

Strategies:
  1. XLA scalar u32 gather (baseline, ~11.8 ns/elem measured)
  2. XLA slice gather: [H*W, 2] u32 table, one 2-wide slice per sample
  3. XLA row gather + in-lane one-hot select
  4. Pallas: VMEM-resident table + jnp.take inside the kernel
  5. Pallas: table as [rows, 128] + per-sample row dynamic-slice loop
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

HW = 640 * 480            # one map
NMAPS = 50
S = 7_526_400             # total samples per pass (Q*S at prod shape)


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
    table = jnp.asarray(rng.integers(0, 2**32, size=NMAPS * HW,
                                     dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NMAPS * HW, size=S,
                                   dtype=np.int64).astype(np.int32))

    # 1. scalar gather
    f1 = jax.jit(lambda t, i: jnp.take(t, i).astype(jnp.uint32).max())
    t1 = timeit(lambda: jax.block_until_ready(f1(table, idx)))
    print(f"1 scalar u32 gather: {t1*1e3:.1f} ms = {t1/S*1e9:.2f} ns/elem")

    # 2. pair-slice gather ([HW*N, 2]: one gather yields 2 u32)
    table2 = jnp.stack([table, table], axis=-1)  # [N*HW, 2]
    f2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.uint32).max())
    t2 = timeit(lambda: jax.block_until_ready(f2(table2, idx)))
    print(f"2 2-u32 slice gather: {t2*1e3:.1f} ms = {t2/S*1e9:.2f} ns/sample (2 values)")

    # 2b. 4-wide slice gather
    table4 = jnp.stack([table] * 4, axis=-1)
    f2b = jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.uint32).max())
    t2b = timeit(lambda: jax.block_until_ready(f2b(table4, idx)))
    print(f"2b 4-u32 slice gather: {t2b*1e3:.1f} ms = {t2b/S*1e9:.2f} ns/sample (4 values)")

    # 3. row gather + lane one-hot select
    tr = table.reshape(-1, 128)

    def row_select(t, i):
        rows = jnp.take(t, i // 128, axis=0)             # [S, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        sel = jnp.where(lane == (i % 128)[:, None], rows, 0)
        return sel.sum(1).max()

    f3 = jax.jit(row_select)
    t3 = timeit(lambda: jax.block_until_ready(f3(tr, idx)))
    print(f"3 row gather+select: {t3*1e3:.1f} ms = {t3/S*1e9:.2f} ns/elem")

    # 4. Pallas VMEM gather: grid over maps, idx sorted per map here
    # (emulates the per-dst-image SBA layout: each grid step gathers
    # S/NMAPS samples from ONE 1.2 MB VMEM-resident map).
    per = S // NMAPS  # samples per map
    idx_local = jnp.asarray(rng.integers(0, HW, size=(NMAPS, per),
                                         dtype=np.int64).astype(np.int32))

    def kern(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]          # [HW] u32 in VMEM
        i = idx_ref[:]          # [per]
        out_ref[:] = jnp.take(t, i)

    @jax.jit
    def f4(tab, il):
        return pl.pallas_call(
            kern,
            grid=(NMAPS,),
            in_specs=[
                pl.BlockSpec((HW,), lambda m: (m,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, per), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, per), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NMAPS, per), jnp.uint32),
        )(tab.reshape(NMAPS * HW), il).max()

    try:
        t4 = timeit(lambda: jax.block_until_ready(f4(table, idx_local)))
        print(f"4 pallas vmem take: {t4*1e3:.1f} ms = {t4/S*1e9:.2f} ns/elem")
    except Exception as e:
        print(f"4 pallas vmem take FAILED: {type(e).__name__}: {str(e)[:300]}")

    # 4b. Pallas 2D-table gather: table [rows, 128], per-sample
    # row/lane split, via jnp.take_along_axis on the row-gathered tile.
    def kern4b(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]                      # [HW//128, 128]
        i = idx_ref[:]                      # [1, per]
        rows = jnp.take(t, i[0] // 128, axis=0)    # [per, 128]
        out_ref[0] = jnp.take_along_axis(
            rows, (i[0] % 128)[:, None], axis=1)[:, 0]

    @jax.jit
    def f4b(tab, il):
        return pl.pallas_call(
            kern4b,
            grid=(NMAPS,),
            in_specs=[
                pl.BlockSpec((HW // 128, 128), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, per), lambda m: (m, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, per), lambda m: (m, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NMAPS, per), jnp.uint32),
        )(tab.reshape(NMAPS * HW // 128, 128), il).max()

    try:
        t4b = timeit(lambda: jax.block_until_ready(f4b(table, idx_local)))
        print(f"4b pallas row+lane take: {t4b*1e3:.1f} ms = {t4b/S*1e9:.2f} ns/elem")
    except Exception as e:
        print(f"4b pallas row+lane FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
