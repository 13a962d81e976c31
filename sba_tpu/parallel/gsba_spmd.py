"""SPMD geometric-semantic bundle adjustment: images sharded over a mesh.

The GSBA residual matrix is [N images x K cylinders], each entry one
soft-IoU rasterization over the image's semantic mask — the compute
scales with N*K*H*W while the parameter space (6N + kdim*K) stays tiny.
Sharding layout:

- images (poses, intrinsics, semantic masks, the rasterization) are
  split along the mesh axis — per-device HBM for masks scales down
  with the mesh, which is what lets forest-scale scenes (hundreds of
  images x many cylinders) fit;
- cylinders are replicated (kdim*K floats);
- per LM iteration the only collectives are one psum of the global
  normal equations (dim = 6N + kdim*K, a few hundred) + scalar costs;
  the dense solve is replicated.

Shard padding: images are padded to a multiple of the mesh size with
`img_weight = 0` rows (the per-image geometry weight that implements
the reference's ScaledLoss(1/num_images), ref
src/optim/geometric_semantic_bundle_adjustment.cc:714-726), so padding
contributes neither cost nor gradient. The landmark term is not
sharded yet (its observations index images globally) — the wrapper
requires landmark_error_weight == 0.

This gives the fork's second workload a multi-chip story the
single-node Ceres reference never had. Correctness: 8-device CPU-mesh
parity test (tests/test_distributed_gsba.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from sba_tpu.optim.gsba import GSBAOptions, GSBAProblem, _gsba_solve

_AXIS = "gsba_images"


def _pad_images(problem: GSBAProblem, ndev: int) -> GSBAProblem:
    N = int(problem.qvecs.shape[0])
    wt = (problem.img_weight if problem.img_weight is not None
          else jnp.full((N,), 1.0 / N, problem.tvecs.dtype))
    pad = (-N) % ndev
    if pad == 0:
        return problem._replace(img_weight=wt)

    def padrow(a):
        reps = jnp.repeat(a[-1:], pad, axis=0)
        return jnp.concatenate([a, reps], axis=0)

    return problem._replace(
        qvecs=padrow(problem.qvecs), tvecs=padrow(problem.tvecs),
        cam_params=padrow(problem.cam_params),
        sem_masks=padrow(problem.sem_masks),
        free_rot=jnp.concatenate(
            [problem.free_rot, jnp.zeros(pad, problem.free_rot.dtype)]),
        free_trans=jnp.concatenate(
            [problem.free_trans,
             jnp.zeros((pad, 3), problem.free_trans.dtype)]),
        img_weight=jnp.concatenate(
            [wt, jnp.zeros(pad, wt.dtype)]))


def geometric_semantic_bundle_adjust_spmd(
        problem: GSBAProblem, options: Optional[GSBAOptions] = None,
        mesh: Optional[Mesh] = None):
    """Drop-in `geometric_semantic_bundle_adjust` over a 1-D mesh."""
    opt = options or GSBAOptions()
    if opt.landmark_error_weight > 0 and problem.obs_xy.shape[0] > 0:
        raise NotImplementedError(
            "SPMD GSBA requires landmark_error_weight == 0 (see module "
            "docstring)")
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (_AXIS,))
    ndev = mesh.devices.size
    problem = _pad_images(problem, ndev)
    N = int(problem.qvecs.shape[0])
    opt = dataclasses.replace(opt, axis_name=_AXIS, spmd_num_images=N)

    sh = P(_AXIS)
    pspec = GSBAProblem(
        qvecs=sh, tvecs=sh, cam_params=sh, sem_masks=sh,
        cyl_qvec=P(), cyl_tvec=P(), cyl_log_radius=P(),
        cyl_log_height=P(),
        free_rot=sh, free_trans=sh,
        points=P(), obs_image=P(), obs_point=P(), obs_xy=P(),
        obs_mask=P(), free_points=P(), img_weight=sh)

    def local(p):
        out, summary = _gsba_solve(p, opt)
        return out, summary

    out_problem_spec = GSBAProblem(
        qvecs=sh, tvecs=sh, cam_params=sh, sem_masks=sh,
        cyl_qvec=P(), cyl_tvec=P(), cyl_log_radius=P(),
        cyl_log_height=P(),
        free_rot=sh, free_trans=sh,
        points=P(), obs_image=P(), obs_point=P(), obs_xy=P(),
        obs_mask=P(), free_points=P(), img_weight=sh)
    # per_image_iou is per-shard; everything else replicated after psums.
    from sba_tpu.optim.gsba import GSBASummary
    out_summary_spec = GSBASummary(
        initial_cost=P(), final_cost=P(), num_iterations=P(),
        cost_trace=P(), per_image_iou=sh, mean_iou=P())

    fn = shard_map(local, mesh=mesh, in_specs=(pspec,),
                   out_specs=(out_problem_spec, out_summary_spec))
    out, summary = jax.jit(fn)(problem)
    # Strip shard padding back off.
    N_real = int(np.count_nonzero(np.asarray(problem.img_weight) > 0)) \
        if problem.img_weight is not None else N
    if N_real < N:
        out = out._replace(
            qvecs=out.qvecs[:N_real], tvecs=out.tvecs[:N_real],
            cam_params=out.cam_params[:N_real],
            sem_masks=out.sem_masks[:N_real],
            free_rot=out.free_rot[:N_real],
            free_trans=out.free_trans[:N_real],
            img_weight=out.img_weight[:N_real])
        summary = summary._replace(
            per_image_iou=summary.per_image_iou[:N_real])
    return out, summary
