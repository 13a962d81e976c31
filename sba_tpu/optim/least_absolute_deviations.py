"""L1 (least-absolute-deviations) linear solver via ADMM, jitted.

Capability parity with ref: src/optim/least_absolute_deviations.{h,cc}
(`SolveLeastAbsoluteDeviations`: ADMM of Boyd et al. for min ||Ax - b||_1,
used by translation-averaging experiments).

TPU-first: the reference factorizes the sparse normal matrix once with
Eigen SimplicialLLT and back-substitutes per iteration; here the normal
system is solved with CG inside a `lax.while_loop` ADMM — dense matmuls
(MXU) for the sizes this is used at, no sparse factorization needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


@dataclass(frozen=True)
class LADOptions:
    """Mirrors ref: least_absolute_deviations.h Options."""

    rho: float = 1.0
    alpha: float = 1.0           # over-relaxation
    max_num_iterations: int = 1000
    absolute_tolerance: float = 1e-4
    relative_tolerance: float = 1e-2


class LADResult(NamedTuple):
    x: jnp.ndarray
    num_iterations: jnp.ndarray
    converged: jnp.ndarray


def solve_least_absolute_deviations(
    A, b, x0=None, options: Optional[LADOptions] = None) -> LADResult:
    """min_x ||A x - b||_1 (ref: SolveLeastAbsoluteDeviations).

    A: [M, N] dense (the translation-averaging systems are small);
    returns LADResult.
    """
    opt = options or LADOptions()
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    m, n = A.shape
    dtype = A.dtype
    x = jnp.zeros(n, dtype) if x0 is None else jnp.asarray(x0, dtype)
    z = jnp.zeros(m, dtype)
    u = jnp.zeros(m, dtype)

    AtA = A.T @ A + 1e-12 * jnp.eye(n, dtype=dtype)
    # Cholesky once (ref factorizes once too).
    L = jnp.linalg.cholesky(AtA)

    def shrinkage(v, kappa):
        return jnp.maximum(0.0, v - kappa) - jnp.maximum(0.0, -v - kappa)

    def body(state):
        it, x, z, u, _done = state
        q = A.T @ (b + z - u)
        x = jax.scipy.linalg.cho_solve((L, True), q)
        Ax = A @ x
        Ax_hat = opt.alpha * Ax + (1 - opt.alpha) * (z + b)
        z_old = z
        z = shrinkage(Ax_hat - b + u, 1.0 / opt.rho)
        u = u + Ax_hat - z - b
        # Stopping (ref: primal/dual residual criteria).
        r_norm = jnp.linalg.norm(Ax - z - b)
        s_norm = jnp.linalg.norm(-opt.rho * (A.T @ (z - z_old)))
        eps_pri = jnp.sqrt(m) * opt.absolute_tolerance \
            + opt.relative_tolerance * jnp.maximum(
                jnp.linalg.norm(Ax),
                jnp.maximum(jnp.linalg.norm(z), jnp.linalg.norm(b)))
        eps_dual = jnp.sqrt(n) * opt.absolute_tolerance \
            + opt.relative_tolerance * jnp.linalg.norm(opt.rho * A.T @ u)
        done = (r_norm < eps_pri) & (s_norm < eps_dual)
        return it + 1, x, z, u, done

    def cond(state):
        it, _x, _z, _u, done = state
        return (it < opt.max_num_iterations) & (~done)

    it, x, z, u, done = lax.while_loop(
        cond, body, (0, x, z, u, jnp.asarray(False)))
    return LADResult(x=x, num_iterations=it, converged=done)
