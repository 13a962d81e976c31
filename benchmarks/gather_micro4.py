"""Round 4: why do TWO rowsel gathers in one program cost ~5x one?
Try optimization_barrier / separate consumer structures to keep each
gather in its own fusion.
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

    f1 = jax.jit(lambda t, i: rowsel(t, i).max())
    t1 = timeit(lambda: jax.block_until_ready(f1(d2, idx)))
    print(f"one rowsel: {t1*1e3:.1f} ms")

    f2 = jax.jit(lambda a, b, i: (rowsel(a, i) + rowsel(b, i)).max())
    t2 = timeit(lambda: jax.block_until_ready(f2(d2, l2, idx)))
    print(f"two rowsel fused: {t2*1e3:.1f} ms")

    def two_bar(a, b, i):
        x = rowsel(a, i)
        i2 = jax.lax.optimization_barrier(i)
        y = rowsel(b, i2)
        return (x + y).max()

    f3 = jax.jit(two_bar)
    t3 = timeit(lambda: jax.block_until_ready(f3(d2, l2, idx)))
    print(f"two rowsel barrier-idx: {t3*1e3:.1f} ms")

    def two_bar2(a, b, i):
        x = rowsel(a, i)
        xb, ib = jax.lax.optimization_barrier((x, i))
        y = rowsel(b, ib)
        return (xb + y).max()

    f4 = jax.jit(two_bar2)
    t4 = timeit(lambda: jax.block_until_ready(f4(d2, l2, idx)))
    print(f"two rowsel barrier-both: {t4*1e3:.1f} ms")

    # two different index vectors (rule out same-index pathologies)
    idxb = jnp.asarray(rng.integers(0, NMAPS * HW, size=S,
                                    dtype=np.int64).astype(np.int32))
    f5 = jax.jit(lambda a, b, i, j: (rowsel(a, i) + rowsel(b, j)).max())
    t5 = timeit(lambda: jax.block_until_ready(f5(d2, l2, idx, idxb)))
    print(f"two rowsel two idx: {t5*1e3:.1f} ms")

    # single stacked gather: one table [2R, 128], indices concat
    big = jnp.concatenate([d2, l2], axis=0)
    off = NMAPS * HW

    def stacked(t, i):
        fi = jnp.concatenate([i, i + off])
        return rowsel(t, fi).max()

    f6 = jax.jit(stacked)
    t6 = timeit(lambda: jax.block_until_ready(f6(big, idx)))
    print(f"stacked single rowsel 2S: {t6*1e3:.1f} ms")

    # interleaved row pairs: row 2k = depth chunk k, row 2k+1 = label k;
    # one gather of 2S indices with good locality
    inter = jnp.stack([d2, l2], axis=1).reshape(-1, 128)

    def inter_g(t, i):
        r = i // 128
        c = i % 128
        fi = jnp.concatenate([2 * r * 128 + c, (2 * r + 1) * 128 + c])
        return rowsel(t, fi).max()

    f7 = jax.jit(inter_g)
    t7 = timeit(lambda: jax.block_until_ready(f7(inter, idx)))
    print(f"interleaved single rowsel 2S: {t7*1e3:.1f} ms")


if __name__ == "__main__":
    main()
