"""Round 5: ONE gather for both SBA maps (VERDICT r4 #3).

The r4 SBA hot path issues two barrier-separated rowsel gathers per
sample (depth patch u32, label patch u32) and is gather-issue-bound
(BASELINE.md r4 roofline). Element-interleaving the two maps
(flat[2i] = depth patch i, flat[2i+1] = label patch i) puts BOTH
descriptors of a sample in the SAME (8,128) tile row — indices 2i and
2i+1 share row (2i)//128 because 2i is even — so one row gather serves
both, with two one-hot lane selects (VPU work, which the roofline says
is idle-dominated).

Variants measured here:
  A two rowsel + barrier        (r4 baseline)
  B interleaved one gather, two lane selects on the gathered rows
  C B + optimization_barrier on the rows (force one materialization)
  D B but pair-select: reshape rows [S,64,2], one 64-lane one-hot
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HW = 640 * 480
NMAPS = 50
S = 7_526_400


def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def rowsel(t2, fi):
    rows = jnp.take(t2, fi // 128, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(lane == (fi % 128)[:, None], rows,
                     jnp.zeros_like(rows)).sum(axis=1)


def main():
    _ = float(jnp.sum(jnp.ones(3)))
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.integers(0, 2**32, size=(NMAPS * HW // 128, 128),
                                  dtype=np.uint64).astype(np.uint32))
    l2 = jnp.asarray(rng.integers(0, 2**32, size=(NMAPS * HW // 128, 128),
                                  dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NMAPS * HW, size=S,
                                   dtype=np.int64).astype(np.int32))
    # element-interleaved table: [R, 128] where flat[2i]=d[i], flat[2i+1]=l[i]
    d_flat = np.asarray(d2).reshape(-1)
    l_flat = np.asarray(l2).reshape(-1)
    inter = jnp.asarray(
        np.stack([d_flat, l_flat], axis=1).reshape(-1, 128))

    def two_bar(a, b, i):
        x = rowsel(a, i)
        ib = jax.lax.optimization_barrier(i)
        y = rowsel(b, ib)
        return (x + y).max()

    fA = jax.jit(two_bar)
    tA = timeit(lambda: jax.block_until_ready(fA(d2, l2, idx)))
    print(f"A two rowsel barrier (r4):      {tA*1e3:.1f} ms")

    def one_two_sel(t, i):
        fi = 2 * i
        rows = jnp.take(t, fi // 128, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        c = (fi % 128)[:, None]
        z = jnp.zeros_like(rows)
        x = jnp.where(lane == c, rows, z).sum(axis=1)
        y = jnp.where(lane == c + 1, rows, z).sum(axis=1)
        return (x + y).max()

    fB = jax.jit(one_two_sel)
    tB = timeit(lambda: jax.block_until_ready(fB(inter, idx)))
    print(f"B interleaved 1 gather 2 sel:   {tB*1e3:.1f} ms")

    def one_two_sel_bar(t, i):
        fi = 2 * i
        rows = jnp.take(t, fi // 128, axis=0)
        rows = jax.lax.optimization_barrier(rows)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        c = (fi % 128)[:, None]
        z = jnp.zeros_like(rows)
        x = jnp.where(lane == c, rows, z).sum(axis=1)
        y = jnp.where(lane == c + 1, rows, z).sum(axis=1)
        return (x + y).max()

    fC = jax.jit(one_two_sel_bar)
    tC = timeit(lambda: jax.block_until_ready(fC(inter, idx)))
    print(f"C B + rows barrier:             {tC*1e3:.1f} ms")

    def pair_sel(t, i):
        fi = 2 * i
        rows = jnp.take(t, fi // 128, axis=0)          # [S, 128]
        r3 = rows.reshape(-1, 64, 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (r3.shape[0], 64), 1)
        c = (i % 64)[:, None]
        m = lane == c
        z = jnp.zeros_like(r3[:, :, 0])
        x = jnp.where(m, r3[:, :, 0], z).sum(axis=1)
        y = jnp.where(m, r3[:, :, 1], z).sum(axis=1)
        return (x + y).max()

    fD = jax.jit(pair_sel)
    tD = timeit(lambda: jax.block_until_ready(fD(inter, idx)))
    print(f"D interleaved pair-select:      {tD*1e3:.1f} ms")


if __name__ == "__main__":
    main()
