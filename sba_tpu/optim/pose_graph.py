"""Pose-graph optimization (SE(3) / Sim(3)) — batched JAX LM engine.

The reference has no pose-graph module: COLMAP's only global-trajectory
tools are global bundle adjustment (`src/optim/bundle_adjustment.cc`) and
the similarity `model_aligner`/`model_merger` (`src/exe/model.cc`). For
the large-scale configs (1k-10k images) a reduced pose-graph solve is the
standard way to (a) absorb loop closures cheaply before a full BA and
(b) stitch the hierarchical mapper's per-cluster models
(ref: src/controllers/hierarchical_mapper.cc:116 merges by similarity
only, with no global relaxation afterwards). This module supplies that
capability TPU-first:

- All E edge residuals evaluate in one batched call (vmap over edges,
  jacfwd for the [E, 6, 12] / [E, 7, 14] local Jacobians).
- The normal equations are never materialized: Gauss-Newton steps solve
  (J^T W J + lam D) dx = -J^T W r by PCG where the matvec is
  gather -> per-edge dense [6or7 x 12or14] products -> segment-sum, all
  static-shape, and the preconditioner is the block-diagonal of J^T W J
  (batched 6x6 / 7x7 Cholesky solves).
- Multi-chip: edges shard across a `jax.sharding.Mesh` axis; gradients,
  matvecs, and preconditioner blocks are `psum` over ICI. Poses are
  replicated (10k poses x 7 floats is trivially resident per chip).

Conventions match the rest of the framework: poses are world->camera
``(qvec wxyz, tvec)``; an edge (i, j) stores the measured relative pose
``T_ij = T_j o T_i^{-1}`` (camera_i frame -> camera_j frame). The
residual is the right-invariant log error
``r = [log_rot(R_err), t_err, (log s_err)]`` of
``T_err = T_meas^{-1} o (T_j o T_i^{-1})`` weighted by the edge's
6x6 (7x7) square-root information matrix, with optional robust loss.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import (
    quat_multiply, quat_conjugate, quat_normalize, quat_rotate,
    quat_retract, quat_to_angle_axis,
)
from sba_tpu.optim.losses import loss_value, loss_weight


class PoseGraphProblem(NamedTuple):
    """Static-shape pose graph. Leaves may be numpy (host-first; jit
    transfers H2D on use — utils/host.py) or jnp; edges may be padded
    (mask=0) so shapes stay powers of two under regrowth."""

    qvecs: jnp.ndarray        # [N, 4] world->cam rotations (wxyz)
    tvecs: jnp.ndarray        # [N, 3]
    log_scales: jnp.ndarray   # [N] per-pose log scale (Sim3); zeros for SE3
    edge_i: jnp.ndarray       # [E] int32 source pose index
    edge_j: jnp.ndarray       # [E] int32 target pose index
    rel_q: jnp.ndarray        # [E, 4] measured q_ij (wxyz)
    rel_t: jnp.ndarray        # [E, 3] measured t_ij
    rel_log_s: jnp.ndarray    # [E] measured log scale s_ij (Sim3; zeros SE3)
    sqrt_info: jnp.ndarray    # [E, D, D] square-root information (D=6 or 7)
    edge_mask: jnp.ndarray    # [E] 1.0 valid / 0.0 padding
    pose_fixed: jnp.ndarray   # [N] 1.0 = held constant (gauge)


@dataclasses.dataclass(frozen=True)
class PoseGraphOptions:
    max_iterations: int = 50
    sim3: bool = False                  # optimize per-pose scale too
    loss: str = "trivial"               # trivial|huber|cauchy|soft_l1
    loss_scale: float = 1.0
    cg_iterations: int = 50
    cg_tolerance: float = 1e-6
    initial_trust_radius: float = 1e4
    function_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-10
    axis_name: Optional[str] = None     # SPMD: mesh axis edges shard over


class PoseGraphSummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    num_residuals: jnp.ndarray
    gradient_norm: jnp.ndarray
    cost_trace: jnp.ndarray


def make_problem(qvecs, tvecs, edge_i, edge_j, rel_q, rel_t,
                 sqrt_info=None, edge_mask=None, pose_fixed=None,
                 log_scales=None, rel_log_s=None, sim3=False,
                 dtype=jnp.float32) -> PoseGraphProblem:
    """Assemble a PoseGraphProblem with sensible defaults: identity
    information, first pose fixed, SE3 scales at zero."""
    # HOST-leaf problem (numpy): jit transfers H2D on first use; host
    # reads of the problem (apply_pose_graph_result) stay free
    # (utils/host.py).
    qvecs = np.asarray(qvecs, dtype)
    tvecs = np.asarray(tvecs, dtype)
    n = qvecs.shape[0]
    edge_i = np.asarray(edge_i, np.int32)
    edge_j = np.asarray(edge_j, np.int32)
    e = edge_i.shape[0]
    d = 7 if sim3 else 6
    if sqrt_info is None:
        sqrt_info = np.broadcast_to(np.eye(d, dtype=dtype), (e, d, d))
    else:
        sqrt_info = np.asarray(sqrt_info, dtype)
        if sqrt_info.ndim == 2:
            sqrt_info = np.broadcast_to(sqrt_info[None], (e, d, d))
    if edge_mask is None:
        edge_mask = np.ones((e,), dtype)
    if pose_fixed is None:
        pose_fixed = np.zeros((n,), dtype)
        pose_fixed[0] = 1.0
    if log_scales is None:
        log_scales = np.zeros((n,), dtype)
    if rel_log_s is None:
        rel_log_s = np.zeros((e,), dtype)
    return PoseGraphProblem(
        qvecs=qvecs, tvecs=tvecs, log_scales=np.asarray(log_scales, dtype),
        edge_i=edge_i, edge_j=edge_j,
        rel_q=np.asarray(rel_q, dtype), rel_t=np.asarray(rel_t, dtype),
        rel_log_s=np.asarray(rel_log_s, dtype), sqrt_info=sqrt_info,
        edge_mask=np.asarray(edge_mask, dtype),
        pose_fixed=np.asarray(pose_fixed, dtype))


def relative_pose(qi, ti, qj, tj, si=None, sj=None):
    """T_ij = T_j o T_i^{-1}: maps camera_i coords to camera_j coords.
    With Sim3 scales s (x_cam = s * R x_world + t):
    s_ij = s_j / s_i, R_ij = R_j R_i^T, t_ij = t_j - s_ij R_ij t_i."""
    qi_inv = quat_conjugate(quat_normalize(qi))
    q_ij = quat_multiply(quat_normalize(qj), qi_inv)
    if si is None:
        t_ij = tj - quat_rotate(q_ij, ti)
        return q_ij, t_ij
    s_ij = sj / si
    t_ij = tj - s_ij[..., None] * quat_rotate(q_ij, ti)
    return q_ij, t_ij, s_ij


def _edge_residual(delta_i, delta_j, qi0, ti0, li0, qj0, tj0, lj0,
                   rq, rt, rls, sqrt_info, sim3):
    """Whitened residual of one edge as a function of the two endpoint
    tangent updates (the LM local parametrization). delta: [6] or [7]
    = (omega[3], dt[3], (dlog_s))."""
    qi = quat_retract(qi0, delta_i[:3])
    ti = ti0 + delta_i[3:6]
    qj = quat_retract(qj0, delta_j[:3])
    tj = tj0 + delta_j[3:6]
    if sim3:
        si = jnp.exp(li0 + delta_i[6])
        sj = jnp.exp(lj0 + delta_j[6])
        q_ij, t_ij, s_ij = relative_pose(qi, ti, qj, tj, si, sj)
        # error transform: T_meas^{-1} o T_ij
        mq_inv = quat_conjugate(quat_normalize(rq))
        s_m = jnp.exp(rls)
        q_err = quat_multiply(mq_inv, q_ij)
        s_err = s_ij / s_m
        t_err = quat_rotate(mq_inv, (t_ij - rt)) / s_m
        r = jnp.concatenate([quat_to_angle_axis(q_err), t_err,
                             jnp.log(s_err)[None]])
    else:
        q_ij, t_ij = relative_pose(qi, ti, qj, tj)
        mq_inv = quat_conjugate(quat_normalize(rq))
        q_err = quat_multiply(mq_inv, q_ij)
        t_err = quat_rotate(mq_inv, (t_ij - rt))
        r = jnp.concatenate([quat_to_angle_axis(q_err), t_err])
    return sqrt_info @ r


def _linearize(problem: PoseGraphProblem, opt: PoseGraphOptions):
    """Batched residuals + Jacobians: r [E,D], Ji/Jj [E,D,D] w.r.t. the
    endpoint tangents, already robust-weighted and mask/gauge-masked."""
    d = 7 if opt.sim3 else 6
    zeros = jnp.zeros((d,), problem.qvecs.dtype)

    def per_edge(i, j, rq, rt, rls, si):
        qi0, ti0, li0 = problem.qvecs[i], problem.tvecs[i], problem.log_scales[i]
        qj0, tj0, lj0 = problem.qvecs[j], problem.tvecs[j], problem.log_scales[j]

        def f(deltas):
            di, dj = deltas
            return _edge_residual(di, dj, qi0, ti0, li0, qj0, tj0, lj0,
                                  rq, rt, rls, si, opt.sim3)

        r, (Ji, Jj) = f((zeros, zeros)), jax.jacfwd(f)((zeros, zeros))
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(per_edge)(
        problem.edge_i, problem.edge_j, problem.rel_q, problem.rel_t,
        problem.rel_log_s, problem.sqrt_info)

    # Robust loss as IRLS: scale by sqrt(rho'(s)). Padded edges mask via
    # `where` (their Jacobians may be NaN at degenerate measurements —
    # NaN * 0 would still poison the reductions).
    valid = problem.edge_mask > 0
    s = jnp.sum(r * r, axis=-1)
    w = jnp.sqrt(loss_weight(opt.loss, s, opt.loss_scale))
    w = jnp.where(valid, w * problem.edge_mask, 0.0)
    r = jnp.where(valid[:, None], r * w[:, None], 0.0)
    Ji = jnp.where(valid[:, None, None], Ji * w[:, None, None], 0.0)
    Jj = jnp.where(valid[:, None, None], Jj * w[:, None, None], 0.0)

    # Gauge: zero columns of fixed poses.
    free = 1.0 - problem.pose_fixed
    Ji = Ji * free[problem.edge_i][:, None, None]
    Jj = Jj * free[problem.edge_j][:, None, None]
    return r, Ji, Jj


def _cost(problem: PoseGraphProblem, opt: PoseGraphOptions):
    d = 7 if opt.sim3 else 6
    zeros = jnp.zeros((d,), problem.qvecs.dtype)

    def per_edge(i, j, rq, rt, rls, si):
        return _edge_residual(
            zeros, zeros, problem.qvecs[i], problem.tvecs[i],
            problem.log_scales[i], problem.qvecs[j], problem.tvecs[j],
            problem.log_scales[j], rq, rt, rls, si, opt.sim3)

    r = jax.vmap(per_edge)(problem.edge_i, problem.edge_j, problem.rel_q,
                           problem.rel_t, problem.rel_log_s,
                           problem.sqrt_info)
    valid = problem.edge_mask > 0
    s = jnp.where(valid, jnp.sum(r * r, axis=-1), 0.0)
    c = 0.5 * jnp.sum(loss_value(opt.loss, s, opt.loss_scale)
                      * problem.edge_mask)
    if opt.axis_name is not None:
        c = jax.lax.psum(c, opt.axis_name)
    return c


def _allreduce(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _segsum(x, idx, n, axis_name):
    out = jax.ops.segment_sum(x, idx, num_segments=n)
    return _allreduce(out, axis_name)


def _solve_step(problem: PoseGraphProblem, opt: PoseGraphOptions, lam):
    """One LM step: PCG on (J^T J + lam * diag(J^T J)) dx = -J^T r with a
    block-Jacobi preconditioner. Returns dx [N,D], predicted reduction,
    and the gradient inf-norm."""
    n = problem.qvecs.shape[0]
    d = 7 if opt.sim3 else 6
    r, Ji, Jj = _linearize(problem, opt)
    ei, ej = problem.edge_i, problem.edge_j
    ax = opt.axis_name

    # Gradient g = J^T r.
    g = _segsum(jnp.einsum("edk,ed->ek", Ji, r), ei, n, ax) + \
        _segsum(jnp.einsum("edk,ed->ek", Jj, r), ej, n, ax)
    g_inf = jnp.max(jnp.abs(g))

    # Block diagonal of J^T J (per-pose [D,D]) for damping + precond.
    Hii = _segsum(jnp.einsum("edk,edl->ekl", Ji, Ji), ei, n, ax) + \
        _segsum(jnp.einsum("edk,edl->ekl", Jj, Jj), ej, n, ax)
    diag = jnp.diagonal(Hii, axis1=-2, axis2=-1)          # [N, D]
    damp = lam * jnp.maximum(diag, 1e-12)
    Hii_d = Hii + jax.vmap(jnp.diag)(damp)
    eye = jnp.eye(d, dtype=r.dtype)
    # Guard padded / fixed poses (all-zero blocks) for the batched solve.
    deg = jnp.sum(jnp.abs(diag), axis=-1) > 0
    Hii_safe = jnp.where(deg[:, None, None], Hii_d, eye)
    # Cholesky-based batched inverse (SPD blocks; TPU has no batched LU).
    L = jnp.linalg.cholesky(Hii_safe)
    eye_b = jnp.broadcast_to(eye, Hii_safe.shape)
    Linv = jax.lax.linalg.triangular_solve(L, eye_b, left_side=True,
                                           lower=True)
    Hinv = jnp.einsum("nkm,nkl->nml", Linv, Linv)
    Hinv = jnp.where(deg[:, None, None], Hinv, 0.0)

    def matvec(u):                                         # u: [N, D]
        ju = jnp.einsum("edk,ek->ed", Ji, u[ei]) + \
            jnp.einsum("edk,ek->ed", Jj, u[ej])            # [E, D]
        out = _segsum(jnp.einsum("edk,ed->ek", Ji, ju), ei, n, ax) + \
            _segsum(jnp.einsum("edk,ed->ek", Jj, ju), ej, n, ax)
        return out + damp * u

    def precond(u):
        return jnp.einsum("nkl,nl->nk", Hinv, u)

    b = -g
    x0 = jnp.zeros_like(b)
    z0 = precond(b)

    def dot(a, c):
        return jnp.sum(a * c)

    def cond(state):
        it, x, rr, z, p, rz = state
        return (it < opt.cg_iterations) & \
            (jnp.sqrt(dot(rr, rr)) > opt.cg_tolerance * jnp.sqrt(dot(b, b)))

    def body(state):
        it, x, rr, z, p, rz = state
        hp = matvec(p)
        alpha = rz / jnp.maximum(dot(p, hp), 1e-30)
        x = x + alpha * p
        rr2 = rr - alpha * hp
        z2 = precond(rr2)
        rz2 = dot(rr2, z2)
        beta = rz2 / jnp.maximum(rz, 1e-30)
        return it + 1, x, rr2, z2, z2 + beta * p, rz2

    init = (0, x0, b, z0, z0, dot(b, z0))
    _, dx, *_ = jax.lax.while_loop(cond, body, init)

    # Exact Gauss-Newton model reduction: -g^T dx - 0.5 dx^T (J^T J) dx.
    predicted = -jnp.sum(g * dx) - 0.5 * jnp.sum(dx * (matvec(dx) - damp * dx))
    return dx, predicted, g_inf


def _apply(problem: PoseGraphProblem, dx, sim3):
    free = (1.0 - problem.pose_fixed)[:, None]
    dx = dx * free
    q = quat_retract(problem.qvecs, dx[:, :3])
    t = problem.tvecs + dx[:, 3:6]
    ls = problem.log_scales + (dx[:, 6] if sim3 else 0.0)
    return problem._replace(qvecs=q, tvecs=t, log_scales=ls)


def _optimize_impl(problem: PoseGraphProblem, opt: PoseGraphOptions):
    cost0 = _cost(problem, opt)
    max_it = opt.max_iterations

    def cond(state):
        it, prob, lam, nu, cost, done, g_inf, trace = state
        return (it < max_it) & (~done)

    def body(state):
        it, prob, lam, nu, cost, done, g_inf, trace = state
        dx, predicted, g_inf = _solve_step(prob, opt, lam)
        prob2 = _apply(prob, dx, opt.sim3)
        new_cost = _cost(prob2, opt)
        actual = cost - new_cost
        rho = actual / jnp.maximum(predicted, 1e-30)
        accept = (actual > 0) & (predicted > 0)

        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, jnp.maximum(lam_acc, 1e-14),
                        jnp.minimum(lam * nu, 1e10))
        nu = jnp.where(accept, 2.0, nu * 2.0)

        prob = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a) if a.dtype != jnp.int32
            else a, prob, prob2)
        cost_new = jnp.where(accept, new_cost, cost)

        step_norm = jnp.sqrt(jnp.sum(dx ** 2))
        done = (
            (accept & (jnp.abs(actual)
                       < opt.function_tolerance * jnp.maximum(cost, 1e-30)))
            | (g_inf < opt.gradient_tolerance)
            | (accept & (step_norm < opt.parameter_tolerance))
            | (lam >= 1e10))
        trace = trace.at[it + 1].set(cost_new)
        return it + 1, prob, lam, nu, cost_new, done, g_inf, trace

    trace0 = jnp.full((max_it + 1,), jnp.nan, cost0.dtype).at[0].set(cost0)
    lam0 = jnp.asarray(1.0 / opt.initial_trust_radius, cost0.dtype)
    init = (0, problem, lam0, jnp.asarray(2.0, cost0.dtype), cost0,
            jnp.asarray(False), jnp.asarray(jnp.inf, cost0.dtype), trace0)
    it, prob, lam, nu, cost, done, g_inf, trace = \
        jax.lax.while_loop(cond, body, init)

    summary = PoseGraphSummary(
        initial_cost=cost0, final_cost=cost, num_iterations=it,
        num_residuals=_allreduce(
            jnp.sum(problem.edge_mask), opt.axis_name).astype(jnp.int32),
        gradient_norm=g_inf, cost_trace=trace)
    return prob, summary


def optimize_pose_graph(problem: PoseGraphProblem,
                        options: Optional[PoseGraphOptions] = None):
    """Jitted whole-loop pose-graph LM. Returns (problem', summary)."""
    opt = options or PoseGraphOptions()
    fn = jax.jit(_optimize_impl, static_argnums=(1,))
    return fn(problem, opt)


# ---------------------------------------------------------------------------
# Graph construction + SPMD sharding helpers
# ---------------------------------------------------------------------------

def pose_graph_from_reconstruction(rec, min_common_points: int = 15,
                                   max_edges_per_image: int = 10,
                                   sim3: bool = False,
                                   dtype=jnp.float32):
    """Build a covisibility pose graph from a Reconstruction: an edge per
    image pair sharing >= min_common_points 3D points (strongest
    max_edges_per_image per image), measured at the current relative
    poses. Used to relax merged / drifted models before a global BA.

    Information weighting: each edge's sqrt_info is
    sqrt(#shared points) * I, the usual covisibility confidence proxy.
    """
    img_ids = list(rec.registered_image_ids)
    id2row = {im: k for k, im in enumerate(img_ids)}
    n = len(img_ids)

    # Count shared points per registered pair.
    from collections import Counter
    pair_counts: Counter = Counter()
    for pid, pt in rec.points3D.items():
        track = [id2row[int(im)] for im in pt.image_ids if int(im) in id2row]
        for a in range(len(track)):
            for b in range(a + 1, len(track)):
                i, j = track[a], track[b]
                if i != j:
                    pair_counts[(min(i, j), max(i, j))] += 1

    # Keep strong pairs, top-k per image.
    cand = [(c, i, j) for (i, j), c in pair_counts.items()
            if c >= min_common_points]
    cand.sort(reverse=True)
    per_img = np.zeros(n, np.int32)
    edges = []
    for c, i, j in cand:
        if per_img[i] < max_edges_per_image or per_img[j] < max_edges_per_image:
            edges.append((i, j, c))
            per_img[i] += 1
            per_img[j] += 1

    qvecs = np.stack([rec.images[im].qvec for im in img_ids]).astype(np.float64)
    tvecs = np.stack([rec.images[im].tvec for im in img_ids]).astype(np.float64)

    if not edges:
        raise ValueError("pose graph has no edges (graph too sparse)")
    ei = np.asarray([e[0] for e in edges], np.int32)
    ej = np.asarray([e[1] for e in edges], np.int32)
    cw = np.asarray([e[2] for e in edges], np.float64)

    # relative_pose is jnp code — run it on the host CPU backend; a TPU
    # round-trip here would slow every later sync (utils/host.py).
    from sba_tpu.utils.host import on_host
    with on_host():
        qi, ti = jnp.asarray(qvecs[ei]), jnp.asarray(tvecs[ei])
        qj, tj = jnp.asarray(qvecs[ej]), jnp.asarray(tvecs[ej])
        rq, rt = relative_pose(qi, ti, qj, tj)
        rq, rt = np.asarray(rq), np.asarray(rt)
    d = 7 if sim3 else 6
    sqrt_info = np.sqrt(cw)[:, None, None] * np.eye(d)[None]

    problem = make_problem(qvecs, tvecs, ei, ej, np.asarray(rq),
                           np.asarray(rt), sqrt_info=sqrt_info, sim3=sim3,
                           dtype=dtype)
    return problem, img_ids


def apply_pose_graph_result(rec, problem: PoseGraphProblem, img_ids):
    """Write optimized poses back into the Reconstruction (in place)."""
    q = np.asarray(problem.qvecs, np.float64)
    t = np.asarray(problem.tvecs, np.float64)
    for k, im in enumerate(img_ids):
        rec.images[im].qvec = q[k]
        rec.images[im].tvec = t[k]
    return rec


def pad_edges_pow2(problem: PoseGraphProblem, min_edges: int = 8
                   ) -> PoseGraphProblem:
    """Pad edge arrays to the next power of two (mask=0) so regrown
    graphs reuse compiled executables."""
    e = problem.edge_i.shape[0]
    target = max(min_edges, 1 << (e - 1).bit_length())
    if target == e:
        return problem
    pad = target - e

    def padv(a, fill=0):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=fill)

    # Identity-quaternion fill keeps padded residuals finite (w channel).
    rel_q = jnp.concatenate(
        [problem.rel_q,
         jnp.zeros((pad, 4), problem.rel_q.dtype).at[:, 0].set(1.0)])
    return problem._replace(
        edge_i=padv(problem.edge_i), edge_j=padv(problem.edge_j),
        rel_q=rel_q, rel_t=padv(problem.rel_t),
        rel_log_s=padv(problem.rel_log_s),
        sqrt_info=padv(problem.sqrt_info),
        edge_mask=padv(problem.edge_mask))


def shard_edges(problem: PoseGraphProblem, mesh, axis_name: str = "edges"):
    """Place edge arrays sharded over `axis_name`, poses replicated.
    Pair with PoseGraphOptions(axis_name=...) inside shard_map."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis_name]
    e = problem.edge_i.shape[0]
    if e % n_dev:
        pad = n_dev - e % n_dev

        def padv(a, fill=0):
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)

        rel_q = jnp.concatenate(
            [problem.rel_q,
             jnp.zeros((pad, 4), problem.rel_q.dtype).at[:, 0].set(1.0)])
        problem = problem._replace(
            edge_i=padv(problem.edge_i), edge_j=padv(problem.edge_j),
            rel_q=rel_q, rel_t=padv(problem.rel_t),
            rel_log_s=padv(problem.rel_log_s),
            sqrt_info=padv(problem.sqrt_info),
            edge_mask=padv(problem.edge_mask))

    edge_s = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return PoseGraphProblem(
        qvecs=jax.device_put(problem.qvecs, rep),
        tvecs=jax.device_put(problem.tvecs, rep),
        log_scales=jax.device_put(problem.log_scales, rep),
        edge_i=jax.device_put(problem.edge_i, edge_s),
        edge_j=jax.device_put(problem.edge_j, edge_s),
        rel_q=jax.device_put(problem.rel_q, edge_s),
        rel_t=jax.device_put(problem.rel_t, edge_s),
        rel_log_s=jax.device_put(problem.rel_log_s, edge_s),
        sqrt_info=jax.device_put(problem.sqrt_info, edge_s),
        edge_mask=jax.device_put(problem.edge_mask, edge_s),
        pose_fixed=jax.device_put(problem.pose_fixed, rep))


def distributed_optimize_pose_graph(problem: PoseGraphProblem,
                                    options: Optional[PoseGraphOptions],
                                    mesh, axis_name: str = "edges"):
    """SPMD pose-graph solve: edges sharded over `axis_name`, per-pose
    reductions psum'd over ICI. The whole LM loop is one shard_map."""
    from jax.sharding import PartitionSpec as P

    opt = dataclasses.replace(options or PoseGraphOptions(),
                              axis_name=axis_name)
    problem = shard_edges(problem, mesh, axis_name)

    e_spec = PoseGraphProblem(
        qvecs=P(), tvecs=P(), log_scales=P(),
        edge_i=P(axis_name), edge_j=P(axis_name),
        rel_q=P(axis_name), rel_t=P(axis_name), rel_log_s=P(axis_name),
        sqrt_info=P(axis_name), edge_mask=P(axis_name), pose_fixed=P())
    out_spec = (e_spec, PoseGraphSummary(P(), P(), P(), P(), P(), P()))

    fn = jax.shard_map(lambda p: _optimize_impl(p, opt), mesh=mesh,
                       in_specs=(e_spec,), out_specs=out_spec,
                       check_vma=False)
    return jax.jit(fn)(problem)
