import time

import jax
import jax.numpy as jnp

from sba_tpu.optim.ba import (
    BAOptions,
    _linearize,
    _make_operators,
    _red_cams,
    _red_imgs,
    _red_pts,
    _sym3_inverse,
)
from sba_tpu.utils.synthetic import make_ba_problem

problem, _ = make_ba_problem(
    num_images=128, num_points=30_000, observations_per_point=7,
    pose_noise=0.005, point_noise=0.02, pixel_noise=0.5, seed=0,
    dtype=jnp.float32)
opt = BAOptions(dtype="float32")


def scan_reps(fn, reps):
    def wrapped(p):
        def body(carry, _):
            return fn(p, carry), None

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    return jax.jit(wrapped)


def timeit(name, fn, reps=10):
    f = scan_reps(fn, reps)
    out = f(problem)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(problem)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / reps * 1e3:.2f} ms/op")


lam = jnp.float32(1e-4)


def ops_full(p, carry):
    r, Jq, Jt, Jx, Jk = _linearize(
        p._replace(points=p.points + carry * 1e-12), opt)
    ops = _make_operators(p, r, Jq, Jt, Jx, Jk, lam, None)
    return (jnp.sum(ops["b_pose"]) + jnp.sum(ops["g_pts"])
            + jnp.sum(ops["d_pose_l"]))


def reductions_only(p, carry):
    r, Jq, Jt, Jx, Jk = _linearize(
        p._replace(points=p.points + carry * 1e-12), opt)
    Jc = jnp.concatenate([Jq, Jt], axis=-1)
    acc = jnp.float32(0.0)
    acc += jnp.sum(_red_imgs(p, jnp.einsum("oki,ok->oi", Jc, r)))
    acc += jnp.sum(_red_cams(p, jnp.einsum("oki,ok->oi", Jk, r)))
    acc += jnp.sum(_red_pts(p, jnp.einsum("oki,ok->oi", Jx, r)))
    acc += jnp.sum(_red_pts(p, jnp.einsum("oki,okj->oij", Jx, Jx)))
    acc += jnp.sum(_red_imgs(p, jnp.einsum("oki,okj->oij", Jc, Jc)))
    acc += jnp.sum(_red_cams(p, jnp.einsum("oki,okj->oij", Jk, Jk)))
    return acc


def precond_inverses(p, carry):
    # Stand-in shapes for the SCHUR_JACOBI preconditioner inverses.
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (128, 6, 6)) + carry * 1e-12
    A = A @ jnp.swapaxes(A, 1, 2) + 6 * jnp.eye(6)
    B = jax.random.normal(key, (1, 12, 12)) + carry * 1e-12
    B = B @ jnp.swapaxes(B, 1, 2) + 12 * jnp.eye(12)
    return jnp.sum(jnp.linalg.inv(A)) + jnp.sum(jnp.linalg.inv(B))


def sym3_inv(p, carry):
    r, Jq, Jt, Jx, Jk = _linearize(
        p._replace(points=p.points + carry * 1e-12), opt)
    Hpp = _red_pts(p, jnp.einsum("oki,okj->oij", Jx, Jx))
    return jnp.sum(_sym3_inverse(Hpp + jnp.eye(3)))


timeit("ops_full (lin+make_operators)", ops_full, 5)
timeit("lin+6 reductions", reductions_only, 10)
timeit("precond 6x6/12x12 inverses", precond_inverses, 10)
timeit("lin+Hpp+sym3inv", sym3_inv, 10)
