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
