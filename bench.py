"""Benchmark: BA LM iterations/sec on one chip (South-Building scale).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is measured
against a documented proxy: Ceres SPARSE_SCHUR on a desktop CPU sustains
~10 LM iterations/sec on a ~128-image / ~30k-point / ~200k-observation
problem (order-of-magnitude from Ceres BAL benchmarks; see BASELINE.md).
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


def main():
    from sba_tpu.optim.ba import BAOptions, _bundle_adjust_impl
    from sba_tpu.utils.synthetic import make_ba_problem

    # South-Building scale: 128 images, ~30k points, every point seen by ~7
    # images -> ~200k observations.
    problem, _ = make_ba_problem(
        num_images=128, num_points=30_000, observations_per_point=7,
        pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0,
        dtype=jnp.float32)

    from sba_tpu.optim import ba_fused

    n_iters = 20
    options = BAOptions(max_iterations=n_iters, cg_iterations=100,
                        dtype="float32",
                        function_tolerance=0.0, gradient_tolerance=0.0,
                        parameter_tolerance=0.0)

    # Fused Pallas path (ops/ba_kernels.py); host prep outside the
    # timed region (it is once-per-problem-structure work).
    ctx = ba_fused.prepare(problem, options)

    # Warmup/compile.
    out, summary = ba_fused.solve_prepared(ctx)
    jax.block_until_ready(summary.final_cost)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, summary = ba_fused.solve_prepared(ctx)
        jax.block_until_ready(summary.final_cost)
        best = min(best, time.perf_counter() - t0)

    iters = max(int(summary.num_iterations), 1)
    iters_per_sec = iters / best

    print(json.dumps({
        "metric": "ba_lm_iterations_per_sec_128img_200kobs",
        "value": round(iters_per_sec, 3),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / CERES_PROXY_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
