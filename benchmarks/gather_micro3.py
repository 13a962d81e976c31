"""Gather microbenchmark round 3: why was row+onehot 6.28 ns in round 1
but ~18 ns in round 2? Hypothesis: XLA fuses onehot-select into the
gather; the (row, lane) 2-D indexed gather from a tiled [R, 128] array
is ~2x cheaper than a flat 1-D gather. Verify + find the cheapest
2-descriptor-per-sample plan.
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


def timeit(fn, reps=7):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench(name, f, *args, nvals=1):
    ff = jax.jit(f)
    t = timeit(lambda: jax.block_until_ready(ff(*args)))
    print(f"{name}: {t*1e3:.1f} ms = {t/S*1e9:.2f} ns/sample ({nvals} vals)")


def main():
    _ = float(jnp.sum(jnp.ones(3)))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.integers(0, 2**32, size=NMAPS * HW,
                                     dtype=np.uint64).astype(np.uint32))
    label = jnp.asarray(rng.integers(0, 2**32, size=NMAPS * HW,
                                     dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NMAPS * HW, size=S,
                                   dtype=np.int64).astype(np.int32))
    d2 = depth.reshape(-1, 128)
    l2 = label.reshape(-1, 128)

    bench("v1 flat take", lambda t, i: jnp.take(t, i).max(), depth, idx)

    def v2(t, i):
        return t[i // 128, i % 128].max()

    bench("v2 2D-index gather", v2, d2, idx)

    def v3(t, i):
        rows = jnp.take(t, i // 128, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        return jnp.where(lane == (i % 128)[:, None], rows, 0).sum(1).max()

    bench("v3 row+onehot (round1 repro)", v3, d2, idx)

    def v4(td, tl, i):
        a = td[i // 128, i % 128]
        b = tl[i // 128, i % 128]
        return (a + b).max()

    bench("v4 2x 2D-index gather", v4, d2, l2, idx, nvals=2)

    inter = jnp.stack([depth, label], axis=-1).reshape(-1, 128)

    def v5(t, i):
        r = i // 64
        c = 2 * (i % 64)
        return (t[r, c] + t[r, c + 1]).max()

    bench("v5 interleaved 2x 2D-index", v5, inter, idx, nvals=2)

    # v6: one gather with trailing slice of 2 (slice_sizes (1, 2))
    def v6(t, i):
        g = jax.lax.gather(
            t, jnp.stack([i // 64, 2 * (i % 64)], axis=-1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0, 1)),
            slice_sizes=(1, 2), mode="fill")
        return (g[:, 0] + g[:, 1]).max()

    bench("v6 (1,2)-slice 2D gather", v6, inter, idx, nvals=2)

    # v7: take_along_axis form on gathered rows
    def v7(t, i):
        rows = jnp.take(t, i // 128, axis=0)
        v = jnp.take_along_axis(rows, (i % 128)[:, None], axis=1)
        return v.max()

    bench("v7 row take + take_along", v7, d2, idx)

    # v8: int8 table 2D-index (4 values per u32 avoided; per-byte cost?)
    d8 = depth.view(jnp.uint8).reshape(-1, 128) if hasattr(depth, 'view') \
        else jax.lax.bitcast_convert_type(depth, jnp.uint8).reshape(-1, 128)

    def v8(t, i):
        return t[i // 128, i % 128].max()

    bench("v8 u8-table 2D-index", v8, d8, idx)


if __name__ == "__main__":
    main()
