import time

import jax
import jax.numpy as jnp

from sba_tpu.optim.ba import BAOptions, _bundle_adjust_impl
from sba_tpu.utils.synthetic import make_ba_problem

problem, _ = make_ba_problem(
    num_images=128, num_points=30_000, observations_per_point=7,
    pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0,
    dtype=jnp.float32)


def run(tag, **kw):
    options = BAOptions(dtype="float32", function_tolerance=0.0,
                        gradient_tolerance=0.0, parameter_tolerance=0.0,
                        **kw)
    f = jax.jit(lambda p: _bundle_adjust_impl(p, options, False))
    out, s = f(problem)
    jax.block_until_ready(s.final_cost)
    t0 = time.perf_counter()
    out, s = f(problem)
    jax.block_until_ready(s.final_cost)
    dt = time.perf_counter() - t0
    it = max(int(s.num_iterations), 1)
    print(f"{tag}: total {dt*1e3:.0f} ms, {it} iters, "
          f"{dt/it*1e3:.1f} ms/iter")


run("pcg cg=1  it=20", solver="schur_pcg", cg_iterations=1,
    max_iterations=20)
run("pcg cg=30 it=20", solver="schur_pcg", cg_iterations=30,
    max_iterations=20)
