"""Profile the semantic BA passes at the production shape
(50 img, 640x480, pixel_step 10 -> Q=2450 pairs x S=3072 samples).

Isolates: (a) hard residual pass, (b) soft residual pass, (c) soft
jacfwd linearization (12 tangents), (d) full LM iteration, plus raw
gather microbenchmarks. Run on the real chip; uses the delta method
(BASELINE.md sync-tax discipline) where applicable, and min-of-reps
single-call times with one sync poison otherwise.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.optim.sba import (SBAOptions, SBAProblem, build_sba_problem,
                               _all_residuals, _pair_jacobians,
                               _linearize_system, semantic_bundle_adjust)
from sba_tpu.utils.synthetic import make_sba_scene


def timeit(fn, reps=6):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    _ = float(jnp.sum(jnp.ones(3)))  # poison sync mode once

    q, t, cam, depth, sem, q0, t0v = make_sba_scene(
        num_images=50, image_size=(640, 480), focal=500.0,
        pose_noise=0.003, seed=0)
    opt = SBAOptions(pixel_step=10, mode="soft", max_iterations=20,
                     function_tolerance=0.0, gradient_tolerance=0.0,
                     parameter_tolerance=0.0)
    problem = build_sba_problem(q0, t0v, cam, depth, sem, opt,
                                dtype=jnp.float32)
    Q = int(problem.pair_src.shape[0])
    S = int(problem.pix_xy.shape[0])
    print(f"Q={Q} S={S} QS={Q*S/1e6:.2f}M")

    # (a) hard residual pass
    f_hard = jax.jit(lambda p: _all_residuals(p.qvecs, p.tvecs, p, opt,
                                              soft=False).sum())
    print(f"hard residual pass: {timeit(lambda: jax.block_until_ready(f_hard(problem)))*1e3:.1f} ms")

    # (b) soft residual pass
    f_soft = jax.jit(lambda p: _all_residuals(p.qvecs, p.tvecs, p, opt,
                                              soft=True).sum())
    print(f"soft residual pass: {timeit(lambda: jax.block_until_ready(f_soft(problem)))*1e3:.1f} ms")

    # (c) linearization (chunked): H,g,cost — analytic vs jacfwd
    import dataclasses
    opt_j = dataclasses.replace(opt, linearize="jacfwd")
    f_lin = jax.jit(lambda p: jax.tree.map(
        jnp.sum, _linearize_system(p, opt_j)))
    print(f"jacfwd linearize+assemble: {timeit(lambda: jax.block_until_ready(f_lin(problem)))*1e3:.1f} ms")
    f_lina = jax.jit(lambda p: jax.tree.map(
        jnp.sum, _linearize_system(p, opt)))
    print(f"analytic linearize+assemble: {timeit(lambda: jax.block_until_ready(f_lina(problem)))*1e3:.1f} ms")

    # (c2) unchunked single-chunk jacobian pass on a slice of pairs
    nsl = 512
    psl = SBAProblem(*[getattr(problem, f) for f in problem._fields])
    f_jac = jax.jit(lambda p: jax.tree.map(jnp.sum, _pair_jacobians(
        p, opt, p.pair_src[:nsl], p.pair_dst[:nsl], p.pair_mask[:nsl])))
    tj = timeit(lambda: jax.block_until_ready(f_jac(psl)))
    print(f"jacfwd 512-pair slice: {tj*1e3:.1f} ms -> full-Q scaled {tj*Q/nsl*1e3:.1f} ms")

    # (d) full LM: delta method 5 vs 20 iterations
    def solve(n):
        o = SBAOptions(pixel_step=10, mode="soft", max_iterations=n,
                       function_tolerance=0.0, gradient_tolerance=0.0,
                       parameter_tolerance=0.0)

        def run():
            out, s = semantic_bundle_adjust(problem, o)
            jax.block_until_ready(s.final_cost)
        return run

    r5, r20 = solve(5), solve(20)
    r5(); r20()
    b5 = b20 = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); r5(); b5 = min(b5, time.perf_counter() - t0)
        t0 = time.perf_counter(); r20(); b20 = min(b20, time.perf_counter() - t0)
    print(f"LM delta: {(b20-b5)/15*1e3:.1f} ms/iter = {15/(b20-b5):.2f} it/s")

    # gather microbench: 15M random u32 gathers from a 15.4M table
    M = problem.depth_packed
    n_g = Q * S
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M.shape[0], size=n_g, dtype=np.int64).astype(np.int32))
    f_g = jax.jit(lambda m, i: jnp.take(m, i).astype(jnp.uint32).sum())
    tg = timeit(lambda: jax.block_until_ready(f_g(M, idx)))
    print(f"random gather {n_g/1e6:.1f}M from {M.shape[0]/1e6:.1f}M u32: {tg*1e3:.1f} ms = {tg/n_g*1e9:.2f} ns/elem")

    # smooth (sorted-ish) indices: same count, ascending blocks
    idx2 = jnp.sort(idx)
    tg2 = timeit(lambda: jax.block_until_ready(f_g(M, idx2)))
    print(f"sorted gather: {tg2*1e3:.1f} ms = {tg2/n_g*1e9:.2f} ns/elem")

    # small-table gather: same count from a 307k table (one map)
    m1 = M[:640 * 480]
    idx3 = jnp.asarray(rng.integers(0, 640 * 480, size=n_g, dtype=np.int64).astype(np.int32))
    tg3 = timeit(lambda: jax.block_until_ready(f_g(m1, idx3)))
    print(f"one-map-table gather: {tg3*1e3:.1f} ms = {tg3/n_g*1e9:.2f} ns/elem")


if __name__ == "__main__":
    main()
