"""Benchmark: BA LM iterations/sec on one chip (South-Building scale).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is measured
against a documented proxy: Ceres SPARSE_SCHUR on a desktop CPU sustains
~10 LM iterations/sec on a ~128-image / ~30k-point / ~200k-observation
problem (order-of-magnitude from Ceres BAL benchmarks; see BASELINE.md).

Methodology (see BASELINE.md "Measuring on axon"): the axon runtime adds a
large, noisy fixed cost per host sync (~25-55 ms once any device->host read
has happened in the process), and in its async mode `block_until_ready`
returns before the work is done — so single-call wall times are wrong in
both modes. We therefore time the SAME prepared solve at two iteration
counts and report the delta per iteration: fixed dispatch/sync costs
cancel, leaving the sustained per-iteration rate a long production solve
actually gets. Problem prep is host-only (utils/host.py) so nothing
poisons dispatch before the measurement.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the LM program compiles once per machine
# (remote TPU AOT compiles take minutes; reruns must not pay them).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CERES_PROXY_ITERS_PER_SEC = 10.0
IT_LO, IT_HI = 5, 20
REPS = 12


def main():
    from sba_tpu.optim.ba import BAOptions
    from sba_tpu.utils.synthetic import make_ba_problem
    from sba_tpu.optim import ba_fused

    # South-Building scale: 128 images, ~30k points, every point seen by ~7
    # images -> ~200k observations.
    problem, _ = make_ba_problem(
        num_images=128, num_points=30_000, observations_per_point=7,
        pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0,
        dtype=jnp.float32)

    # Force synchronous dispatch: in async mode block_until_ready does not
    # actually wait on this runtime (BASELINE.md). The fixed sync tax this
    # adds cancels in the iteration-count delta below.
    _ = float(jnp.sum(jnp.ones(3)))

    best = {}
    for n_it in (IT_LO, IT_HI):
        options = BAOptions(
            max_iterations=n_it, cg_iterations=100, dtype="float32",
            function_tolerance=0.0, gradient_tolerance=0.0,
            parameter_tolerance=0.0)
        ctx = ba_fused.prepare(problem, options)
        out, summary = ba_fused.solve_prepared(ctx)   # warmup/compile
        jax.block_until_ready(summary.final_cost)
        b = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out, summary = ba_fused.solve_prepared(ctx)
            jax.block_until_ready(summary.final_cost)
            b = min(b, time.perf_counter() - t0)
        best[n_it] = b

    per_iter = (best[IT_HI] - best[IT_LO]) / (IT_HI - IT_LO)
    iters_per_sec = 1.0 / max(per_iter, 1e-9)

    print(json.dumps({
        "metric": "ba_lm_iterations_per_sec_128img_200kobs",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / CERES_PROXY_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
