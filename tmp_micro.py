import time

import jax
import jax.numpy as jnp

from sba_tpu.optim.ba import BAOptions, _cost, _linearize
from sba_tpu.utils.synthetic import make_ba_problem

problem, _ = make_ba_problem(
    num_images=128, num_points=30_000, observations_per_point=7,
    pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0,
    dtype=jnp.float32)
opt = BAOptions(dtype="float32")


def scan_reps(fn, reps):
    def wrapped(p):
        def body(carry, _):
            out = fn(p, carry)
            return out, None

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    return jax.jit(wrapped)


def timeit(name, fn, reps):
    f = scan_reps(fn, reps)
    out = f(problem)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(problem)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / reps * 1e3:.2f} ms/op ({reps} reps)")


def lin_op(p, carry):
    r, Jq, Jt, Jx, Jk = _linearize(
        p._replace(points=p.points + carry * 1e-12), opt)
    return jnp.sum(r) + jnp.sum(Jq) + jnp.sum(Jx) + jnp.sum(Jk)


def cost_op(p, carry):
    return _cost(p.qvecs, p.tvecs, p.points + carry * 1e-12,
                 p.cam_params, p, opt)


def trivial_op(p, carry):
    return carry + jnp.sum(p.tvecs) * 1e-12


timeit("trivial", trivial_op, 100)
timeit("cost", cost_op, 20)
timeit("linearize", lin_op, 20)
