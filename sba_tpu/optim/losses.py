"""Robust loss functions (Ceres-compatible semantics).

The reference exposes TRIVIAL / SOFT_L1 / CAUCHY for SBA/GSBA
(ref: src/optim/semantic_bundle_adjustment.h:85-92 loss_function_type,
src/optim/semantic_bundle_adjustment.cc CreateLossFunction) and Huber for
mapper BA. Conventions follow Ceres: a loss rho(s) acts on the SQUARED
residual norm s = ||r||^2; total cost = 1/2 sum rho(s_i).

For Gauss-Newton/LM we use IRLS re-weighting with w = rho'(s) — residuals
and Jacobian rows are scaled by sqrt(w) at each linearization. All functions
are elementwise-batched jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _trivial(s, a2):
    return s


def _trivial_d(s, a2):
    return jnp.ones_like(s)


def _huber(s, a2):
    a = jnp.sqrt(a2)
    r = jnp.sqrt(jnp.maximum(s, 1e-20))
    return jnp.where(s <= a2, s, 2.0 * a * r - a2)


def _huber_d(s, a2):
    a = jnp.sqrt(a2)
    r = jnp.sqrt(jnp.maximum(s, 1e-20))
    return jnp.where(s <= a2, jnp.ones_like(s), a / r)


def _soft_l1(s, a2):
    return 2.0 * a2 * (jnp.sqrt(1.0 + s / a2) - 1.0)


def _soft_l1_d(s, a2):
    return 1.0 / jnp.sqrt(1.0 + s / a2)


def _cauchy(s, a2):
    return a2 * jnp.log1p(s / a2)


def _cauchy_d(s, a2):
    return 1.0 / (1.0 + s / a2)


LOSSES = {
    "trivial": (_trivial, _trivial_d),
    "huber": (_huber, _huber_d),
    "soft_l1": (_soft_l1, _soft_l1_d),
    "cauchy": (_cauchy, _cauchy_d),
}


def loss_value(name: str, s, scale: float = 1.0):
    """rho(s) for squared norms s; `scale` is the Ceres loss scale a."""
    fn, _ = LOSSES[name]
    return fn(s, scale * scale)


def loss_weight(name: str, s, scale: float = 1.0):
    """IRLS weight rho'(s)."""
    _, d = LOSSES[name]
    return d(s, scale * scale)
