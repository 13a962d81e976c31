"""RANSAC / LO-RANSAC as fixed-size batched hypothesis evaluation.

TPU-native redesign of ref: src/optim/ransac.h:80 (`RANSAC<Estimator,...>`),
loransac.h:54 (`LORANSAC`), sampler.h + random/progressive/combination
samplers, support_measurement.h.

The reference's sequential adaptive loop (draw sample -> estimate -> count
inliers -> update trial bound, ref ransac.h:143-182) is replaced by one
batched program: K minimal samples drawn up front, all hypotheses solved by
one vmapped minimal solver, all residuals evaluated as one [models x points]
pass, arg-max support. K is chosen with the SAME stopping theory
(log(1-conf)/log(1-w^k)) evaluated at the pessimistic prior inlier ratio,
so the batch covers what the adaptive loop would have needed; the hardware
prefers one big launch over data-dependent trip counts.

LO step (LORANSAC): one non-minimal weighted refit on the best model's
inliers (the reference runs the estimator's Refine; here the caller passes
a weighted least-squares refitter).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RANSACOptions:
    """Mirrors ref: src/optim/ransac.h RANSACOptions."""

    max_error: float = 4.0           # inlier threshold on sqrt(residual)
    min_inlier_ratio: float = 0.25   # pessimistic prior -> batch size
    confidence: float = 0.999
    min_num_trials: int = 32
    max_num_trials: int = 4096
    num_lo_steps: int = 2            # LO-RANSAC refinement rounds
    scoring: str = "msac"            # "msac" (truncated quadratic) or
    #                                  "inlier_count" (ref ransac.h support);
    #                                  MSAC discriminates near-tied models
    #                                  far better at equal cost.


def num_required_trials(sample_size: int, opt: RANSACOptions) -> int:
    """Static trial count from the reference's stopping criterion
    (ref: ransac.h:143-182), evaluated at the prior inlier ratio."""
    w = max(opt.min_inlier_ratio, 1e-3) ** sample_size
    if w >= 1.0:
        return opt.min_num_trials
    n = math.log(max(1.0 - opt.confidence, 1e-12)) / math.log(1.0 - w + 1e-300)
    return int(min(max(n, opt.min_num_trials), opt.max_num_trials))


class RANSACReport(NamedTuple):
    model: jnp.ndarray        # best model parameters (solver-specific pytree)
    num_inliers: jnp.ndarray  # scalar int
    inlier_mask: jnp.ndarray  # [N] bool
    support_trace: jnp.ndarray  # [num_trials] inlier counts (diagnostics)


def draw_samples(key, num_points, num_trials: int, sample_size: int,
                 mask=None, progressive: bool = False):
    """[num_trials, sample_size] index samples (duplicates within a sample
    are avoided by Gumbel top-k over per-trial random scores; invalid points
    masked out). `progressive=True` biases early trials toward low indices —
    the PROSAC idea (ref: progressive_sampler.cc) for match lists sorted by
    score."""
    scores = jax.random.uniform(key, (num_trials, num_points))
    if mask is not None:
        scores = jnp.where(mask[None, :] > 0, scores, -jnp.inf)
    if progressive:
        # Trial t draws from a prefix that grows from 2*sample_size to n.
        t = jnp.arange(num_trials)[:, None]
        frac = jnp.minimum(1.0, (t + 1) / max(num_trials * 0.7, 1.0))
        prefix = jnp.maximum(2 * sample_size, (frac * num_points)).astype(jnp.int32)
        idx = jnp.arange(num_points)[None, :]
        scores = jnp.where(idx < prefix, scores, -jnp.inf)
    _, samples = jax.lax.top_k(scores, sample_size)
    return samples


def ransac(
    key,
    data,                       # tuple of [N, ...] arrays, indexed by samples
    solve_fn: Callable,         # (*sampled_data) -> (models [M, ...], valid [M])
    residual_fn: Callable,      # (model, *data) -> [N] squared residuals
    sample_size: int,
    options: Optional[RANSACOptions] = None,
    mask=None,                  # [N] valid-point mask
    refit_fn: Optional[Callable] = None,  # (weights [N], *data) -> model
    progressive: bool = False,
    max_error=None,             # optional TRACED per-call threshold override
):
    """Batched (LO-)RANSAC. Returns RANSACReport.

    All shapes static: `num_trials` from options, models per sample from the
    solver. `residual_fn` must return SQUARED residuals (the threshold is
    squared internally, matching the reference's support measurement).

    The whole program is jit-compiled, cached on the identity of
    (solve_fn, residual_fn, refit_fn) + static config: pass MODULE-LEVEL
    functions (not fresh lambdas) from hot loops — matcher verification
    and mapper registration call this hundreds of times, and eager
    op-by-op dispatch of the vmapped solver stack is ~50x slower on CPU
    than the compiled program.
    """
    opt = options or RANSACOptions()
    if max_error is not None and not isinstance(max_error, (int, float)):
        # Traced threshold (batched callers with per-pair thresholds):
        # run unjitted — the caller's surrounding jit/vmap compiles it.
        return _ransac_impl(key, data, solve_fn, residual_fn, sample_size,
                            opt, mask, refit_fn, progressive,
                            max_error=max_error)
    if isinstance(max_error, (int, float)):
        import dataclasses
        opt = dataclasses.replace(opt, max_error=float(max_error))
    fn = _ransac_jitted(solve_fn, residual_fn, refit_fn, sample_size, opt,
                        progressive, mask is not None, len(data))
    if mask is None:
        return fn(key, data)
    return fn(key, data, mask)


def _ransac_jitted(solve_fn, residual_fn, refit_fn, sample_size, opt,
                   progressive, has_mask, nargs):
    cache_key = (id(solve_fn), id(residual_fn), id(refit_fn), sample_size,
                 opt, progressive, has_mask, nargs)
    hit = _RANSAC_CACHE.get(cache_key)
    if hit is not None:
        return hit
    if has_mask:
        def run(key, data, mask):
            return _ransac_impl(key, data, solve_fn, residual_fn,
                                sample_size, opt, mask, refit_fn,
                                progressive)
    else:
        def run(key, data):
            return _ransac_impl(key, data, solve_fn, residual_fn,
                                sample_size, opt, None, refit_fn,
                                progressive)
    fn = jax.jit(run)
    # Keep referenced callables alive so id() keys stay unique.
    _RANSAC_CACHE[cache_key] = fn
    _RANSAC_CACHE_REFS.append((solve_fn, residual_fn, refit_fn))
    if len(_RANSAC_CACHE) > 512:   # unbounded lambda churn guard
        _RANSAC_CACHE.clear()
        _RANSAC_CACHE_REFS.clear()
    return fn


_RANSAC_CACHE: dict = {}
_RANSAC_CACHE_REFS: list = []


def _ransac_impl(key, data, solve_fn, residual_fn, sample_size, opt,
                 mask, refit_fn, progressive, max_error=None,
                 num_trials=None):
    n = data[0].shape[0]
    if num_trials is None:
        num_trials = num_required_trials(sample_size, opt)
    thr2 = (opt.max_error if max_error is None else max_error) ** 2
    valid_mask = jnp.ones(n, bool) if mask is None else (mask > 0)

    samples = draw_samples(key, n, num_trials, sample_size, mask=mask,
                           progressive=progressive)

    def solve_one(sample_idx):
        sampled = tuple(d[sample_idx] for d in data)
        models, valid = solve_fn(*sampled)
        return models, valid

    models, valid = jax.vmap(solve_one)(samples)
    # Flatten [num_trials, M, ...] -> [num_trials * M, ...].
    flat_models = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), models)
    flat_valid = valid.reshape(-1)

    use_msac = opt.scoring == "msac"

    def score_of(model, is_valid):
        """Higher = better. MSAC: -sum(min(r, thr2)) over valid points;
        inlier_count: #(r <= thr2)."""
        r = residual_fn(model, *data)
        if use_msac:
            s = -jnp.sum(jnp.where(valid_mask, jnp.minimum(r, thr2), 0.0))
        else:
            s = jnp.sum((r <= thr2) & valid_mask).astype(r.dtype)
        return jnp.where(is_valid, s, -jnp.inf)

    support = jax.vmap(score_of)(flat_models, flat_valid)  # [T*M]
    best = jnp.argmax(support)
    best_model = jax.tree.map(lambda a: a[best], flat_models)
    best_support = support[best]

    # LO refinement: weighted non-minimal refit on the inlier set; keep the
    # refit only if the score does not drop (ref: loransac.h:54 Estimate).
    if refit_fn is not None:
        def lo_step(_, carry):
            model, sup = carry
            r = residual_fn(model, *data)
            w = ((r <= thr2) & valid_mask).astype(data[0].dtype)
            refined = refit_fn(w, *data)
            sup2 = score_of(refined, jnp.array(True))
            better = sup2 >= sup
            model = jax.tree.map(
                lambda a, b: jnp.where(better, b, a), model, refined)
            return model, jnp.maximum(sup, sup2)

        best_model, best_support = jax.lax.fori_loop(
            0, opt.num_lo_steps, lo_step, (best_model, best_support))

    r_final = residual_fn(best_model, *data)
    inlier_mask = (r_final <= thr2) & valid_mask
    return RANSACReport(
        model=best_model,
        num_inliers=jnp.sum(inlier_mask),
        inlier_mask=inlier_mask,
        support_trace=support,
    )
