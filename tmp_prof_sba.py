import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from sba_tpu.optim.sba import (SBAOptions, build_sba_problem, _pair_jacobians,
                               _all_residuals, _assemble_dense, semantic_bundle_adjust)
from sba_tpu.utils.synthetic import make_sba_scene

# Bench-ish scale: 12 images, 192x144 maps, stride 2 -> S=(96*72)=6912 px,
# Q = 12*11=132 pairs -> ~912k residuals.
q, t, cam, depth, sem, q0, t0 = make_sba_scene(
    num_images=12, image_size=(192, 144), focal=180.0, pose_noise=0.01, seed=0)
opt = SBAOptions(pixel_step=2, mode="soft", max_iterations=10)
problem = build_sba_problem(jnp.asarray(q0, jnp.float32), jnp.asarray(t0, jnp.float32),
                            jnp.asarray(cam, jnp.float32), jnp.asarray(depth, jnp.float32),
                            jnp.asarray(sem, jnp.float32), opt, dtype=jnp.float32)
Q = problem.pair_src.shape[0]; S = problem.pix_xy.shape[0]
print(f"Q={Q} S={S} residuals={Q*S}")

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0_ = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0_)/n*1e3:8.2f} ms")
    return out

jac = jax.jit(functools.partial(_pair_jacobians, opt=opt))
timeit("pair_jacobians (soft)", jac, problem)
res = jax.jit(functools.partial(_all_residuals, problem=problem, opt=opt, soft=True))
timeit("residuals only", res, problem.qvecs, problem.tvecs)

t0_ = time.perf_counter()
out, s = semantic_bundle_adjust(problem, opt)
jax.block_until_ready(s.final_cost)
print("compile+run", time.perf_counter()-t0_)
t0_ = time.perf_counter()
out, s = semantic_bundle_adjust(problem, opt)
jax.block_until_ready(s.final_cost)
dt = time.perf_counter()-t0_
print(f"LM: {int(s.num_iterations)} iters in {dt*1e3:.1f} ms -> {int(s.num_iterations)/dt:.1f} it/s, cost {float(s.initial_cost):.4g}->{float(s.final_cost):.4g}")
