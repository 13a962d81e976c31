"""Distributed bundle adjustment: SPMD Schur/PCG over a device mesh.

The reference has NO distributed solver — its largest solve is single-node
Ceres or the vendored multicore/GPU PBA (ref: lib/PBA, SURVEY.md section 2.3).
This module is the TPU-native scaling design those map onto:

- **Partitioning:** observations (residual blocks) are sharded over a 1-D
  mesh axis ``"obs"``; camera poses, intrinsics, and points are replicated.
  Per-shard landmark (point) elimination and the reduced-camera PCG then
  need exactly one collective per reduction: `jax.lax.psum` over ICI.
  (This is the BASELINE.json north star: "camera/point blocks partitioned
  across a pod slice, landmarks eliminated locally, reduced camera system
  solved by PCG with psum/all-gather over ICI".)
- **Execution:** the entire LM solve (`optim.ba._bundle_adjust_impl`) runs
  inside one `shard_map` — the while_loops, linearization, PCG, and all
  collectives compile into a single XLA program per device. Nothing crosses
  the host boundary during the solve.
- Parameters are O(N+P) small relative to observations O(O); replicating
  them and sharding the O(O) work is the right bandwidth trade until P is
  huge (point-sharded elimination is a later extension).

Multi-host: under `jax.distributed.initialize`, the same code spans hosts —
the mesh covers all global devices and psum rides ICI within a slice / DCN
across slices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sba_tpu.optim.ba import BAOptions, BAProblem, _bundle_adjust_impl


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "obs") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def pad_observations(problem: BAProblem, multiple: int) -> BAProblem:
    """Pad the observation table to a multiple of the mesh size with
    mask-0 entries (they index image/point/cam 0 and contribute nothing)."""
    # Gather layouts index the unsharded obs table; the distributed path
    # reduces with segment_sum + psum instead, so drop them.
    problem = problem._replace(pt_gather=None, pt_mask=None,
                               img_gather=None, img_mask=None,
                               image_cam=None)
    o = problem.obs_image.shape[0]
    pad = (-o) % multiple
    if pad == 0:
        return problem
    zi = jnp.zeros(pad, problem.obs_image.dtype)
    return problem._replace(
        obs_image=jnp.concatenate([problem.obs_image, zi]),
        obs_point=jnp.concatenate([problem.obs_point, zi]),
        obs_cam=jnp.concatenate([problem.obs_cam, zi]),
        obs_xy=jnp.concatenate([problem.obs_xy, jnp.zeros((pad, 2), problem.obs_xy.dtype)]),
        obs_mask=jnp.concatenate([problem.obs_mask, jnp.zeros(pad, problem.obs_mask.dtype)]),
    )


def _problem_specs(axis_name: str):
    """PartitionSpecs: observation table sharded, parameters replicated."""
    sh = P(axis_name)
    rep = P()
    return BAProblem(
        qvecs=rep, tvecs=rep, points=rep, cam_params=rep,
        obs_image=sh, obs_point=sh, obs_cam=sh, obs_xy=sh, obs_mask=sh,
        free_rot=rep, free_trans=rep, free_points=rep, free_cam=rep,
    )


def shard_problem(problem: BAProblem, mesh: Mesh) -> BAProblem:
    """Pad + place the problem arrays with their mesh shardings."""
    axis_name = mesh.axis_names[0]
    problem = pad_observations(problem, mesh.devices.size)
    specs = _problem_specs(axis_name)
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        problem, specs)


def distributed_bundle_adjust(problem: BAProblem, options: Optional[BAOptions],
                              mesh: Mesh):
    """Solve BA SPMD over `mesh`. Semantically identical to
    `optim.bundle_adjust` (tests assert bit-level agreement up to reduction
    order); wall-clock scales with devices because linearization, matvecs,
    and preconditioner assembly are all observation-sharded.
    """
    options = options or BAOptions()
    axis_name = mesh.axis_names[0]
    options = BAOptions(**{**options.__dict__, "axis_name": axis_name})
    problem = pad_observations(problem, mesh.devices.size)

    specs = _problem_specs(axis_name)
    fn = jax.shard_map(
        functools.partial(_bundle_adjust_impl, options=options, use_dense=False),
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),  # sharded problem out; replicated summary
        check_vma=False,
    )
    out, summary = fn(problem)
    return out, summary


# ---------------------------------------------------------------------------
# Point-sharded (track-aware) partitioning + the point-major SPMD solve.
# ---------------------------------------------------------------------------


def shard_problem_by_points(problem: BAProblem, n_shards: int):
    """Track-aware partition: every point and its ENTIRE track live on one
    shard (SURVEY.md §7 stage 7: local landmark elimination, psum only on
    the reduced camera system). Round-robin over track-length-sorted
    points balances observation counts.

    Returns (sharded BAProblem in per-shard point-major layout with
    leading dim n_shards * Pmax, point_perm) where point_perm[global_row]
    = original point index (-1 for padding)."""
    op = np.asarray(problem.obs_point)
    om = np.asarray(problem.obs_mask)
    oi = np.asarray(problem.obs_image)
    oc = np.asarray(problem.obs_cam)
    oxy = np.asarray(problem.obs_xy)
    P = problem.points.shape[0]
    counts = np.bincount(op[om > 0], minlength=P)
    K = max(int(counts.max()), 1)
    order = np.argsort(-counts, kind="stable")
    shard_of = np.empty(P, np.int64)
    shard_of[order] = np.arange(P) % n_shards
    locals_ = [np.nonzero(shard_of == d)[0] for d in range(n_shards)]
    Pmax = max(max(len(l) for l in locals_), 1)

    obs_order = np.argsort(op, kind="stable")
    offs = np.concatenate([[0], np.cumsum(np.bincount(op, minlength=P))])

    pts = np.zeros((n_shards * Pmax, 3))
    freep = np.zeros(n_shards * Pmax)
    perm = np.full(n_shards * Pmax, -1, np.int64)
    Ob = Pmax * K
    s_oi = np.zeros(n_shards * Ob, np.int32)
    s_oc = np.zeros(n_shards * Ob, np.int32)
    s_op = np.zeros(n_shards * Ob, np.int32)
    s_xy = np.zeros((n_shards * Ob, 2))
    s_m = np.zeros(n_shards * Ob)
    pts_np = np.asarray(problem.points)
    freep_np = np.asarray(problem.free_points)
    for d, idx in enumerate(locals_):
        base_p = d * Pmax
        pts[base_p:base_p + len(idx)] = pts_np[idx]
        freep[base_p:base_p + len(idx)] = freep_np[idx]
        perm[base_p:base_p + len(idx)] = idx
        for local, p in enumerate(idx):
            rows = obs_order[offs[p]:offs[p + 1]]
            if len(rows) > K:
                rows = rows[np.argsort(-om[rows], kind="stable")][:K]
            base = d * Ob + local * K
            n = len(rows)
            s_oi[base:base + n] = oi[rows]
            s_oc[base:base + n] = oc[rows]
            s_xy[base:base + n] = oxy[rows]
            s_m[base:base + n] = om[rows]
        # local point indices within the shard
        s_op[d * Ob:(d + 1) * Ob] = np.repeat(
            np.arange(Pmax, dtype=np.int32), K)

    dtype = problem.points.dtype
    image_cam = problem.image_cam
    if image_cam is None:
        from sba_tpu.optim.ba import _image_cam_of

        image_cam = jnp.asarray(_image_cam_of(problem))
    sharded = problem._replace(
        points=jnp.asarray(pts, dtype),
        free_points=jnp.asarray(freep, dtype),
        obs_image=jnp.asarray(s_oi), obs_point=jnp.asarray(s_op),
        obs_cam=jnp.asarray(s_oc),
        obs_xy=jnp.asarray(s_xy, dtype),
        obs_mask=jnp.asarray(s_m, dtype),
        pt_gather=None, pt_mask=None, img_gather=None, img_mask=None,
        image_cam=image_cam)
    return sharded, jnp.asarray(perm)


def distributed_bundle_adjust_pm(problem: BAProblem,
                                 options: Optional[BAOptions],
                                 mesh: Mesh):
    """Point-sharded SPMD solve using the point-major explicit-Schur step
    (the measured-fast single-chip formulation) with ONE psum each for
    the image payload, the Schur correction, and the RHS per iteration —
    landmark elimination is entirely shard-local by construction.
    """
    options = options or BAOptions()
    axis_name = mesh.axis_names[0]
    n = mesh.devices.size
    import dataclasses

    options = dataclasses.replace(
        options, axis_name=axis_name, solver="explicit_schur",
        obs_layout="point_major")
    sharded, perm = shard_problem_by_points(problem, n)

    sh, rep = P(axis_name), P()
    specs = BAProblem(
        qvecs=rep, tvecs=rep, points=sh, cam_params=rep,
        obs_image=sh, obs_point=sh, obs_cam=sh, obs_xy=sh, obs_mask=sh,
        free_rot=rep, free_trans=rep, free_points=sh, free_cam=rep,
        image_cam=rep)

    fn = jax.shard_map(
        functools.partial(_bundle_adjust_impl, options=options,
                          use_dense=False),
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),
        check_vma=False,
    )
    out, summary = fn(sharded)
    # Un-permute points to the original order.
    perm_np = np.asarray(perm)
    valid = perm_np >= 0
    pts = np.asarray(problem.points).copy()
    pts[perm_np[valid]] = np.asarray(out.points)[valid]
    out = problem._replace(qvecs=out.qvecs, tvecs=out.tvecs,
                           points=jnp.asarray(pts, problem.points.dtype),
                           cam_params=out.cam_params)
    return out, summary
