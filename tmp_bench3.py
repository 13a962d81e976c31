import time, dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from sba_tpu.optim.ba import BAOptions, _bundle_adjust_impl, to_point_major
from sba_tpu.utils.synthetic import make_ba_problem

problem, _ = make_ba_problem(num_images=128, num_points=30_000, observations_per_point=7,
                             pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0, dtype=jnp.float32)
pm = to_point_major(problem)
for solver in ("explicit_schur",):
    options = BAOptions(max_iterations=20, cg_iterations=30, solver=solver, dtype="float32",
                        obs_layout="point_major",
                        function_tolerance=0.0, gradient_tolerance=0.0, parameter_tolerance=0.0)
    run = jax.jit(lambda p, o=options: _bundle_adjust_impl(p, o, False))
    out, summary = run(pm); jax.block_until_ready(summary.final_cost)
    t0 = time.perf_counter()
    out, summary = run(pm); jax.block_until_ready(summary.final_cost)
    dt = time.perf_counter() - t0
    print(solver, "pm iters/s:", int(summary.num_iterations)/dt, "final cost:", float(summary.final_cost))
