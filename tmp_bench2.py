import time, json
import jax, jax.numpy as jnp
from sba_tpu.optim.ba import BAOptions, _bundle_adjust_impl
from sba_tpu.utils.synthetic import make_ba_problem

problem, _ = make_ba_problem(num_images=128, num_points=30_000, observations_per_point=7,
                             pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0, dtype=jnp.float32)
for solver in ("explicit_schur",):
    options = BAOptions(max_iterations=20, cg_iterations=30, solver=solver, dtype="float32",
                        function_tolerance=0.0, gradient_tolerance=0.0, parameter_tolerance=0.0)
    run = jax.jit(lambda p, o=options: _bundle_adjust_impl(p, o, False))
    out, summary = run(problem); jax.block_until_ready(summary.final_cost)
    t0 = time.perf_counter()
    out, summary = run(problem); jax.block_until_ready(summary.final_cost)
    dt = time.perf_counter() - t0
    print(solver, "iters/s:", int(summary.num_iterations)/dt,
          "final cost:", float(summary.final_cost), "iters:", int(summary.num_iterations))
