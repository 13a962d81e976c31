"""SPMD fused bundle adjustment: the Pallas fast path over a device mesh.

Combines the two measured-best designs in this codebase:

- the fused Pallas LM step (ops/ba_kernels.py + optim/ba_fused.py,
  ~285 LM it/s single chip at South-Building scale), and
- the track-aware point partitioning of parallel/distributed_ba.py
  (every point and its whole track live on one shard, so landmark
  elimination is shard-local).

Sharding layout: each track-length bucket's point BLOCKS (TP=128
points each, slot-major observations) are divided contiguously over a
1-D mesh axis; camera poses/intrinsics are replicated. Per LM
iteration each device runs kernel 1 on its local blocks, then exactly
three psums — the Schur correction S_corr [Dk,Dk], the per-image
payload, and the RHS coupling Ey — make the replicated epilogue (tiny
reduced-system assembly + Jacobi-PCG) see the global system; kernel 2
back-substitution and the trial-cost kernel stay local with scalar
psums. This is the TPU-native replacement for the reference's
single-node PBA/Ceres solvers (ref: lib/PBA/pba.h ParallelBA,
src/optim/bundle_adjustment.cc:567-596 ParallelBundleAdjuster), which
have no distributed mode at all (SURVEY.md §2.3).

Multi-host: under `jax.distributed.initialize` the same code spans
hosts; the S_corr/payload psums ride ICI within a slice, DCN across
slices. Communication per iteration is O(Dk^2) (the reduced camera
system), independent of observation count — the point/observation
payloads (the O(O) data) never cross devices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sba_tpu.optim.ba import BAOptions, BAProblem
from sba_tpu.optim import ba_fused as bf
from sba_tpu.ops.ba_kernels import KernelStatic


def _static_specs(axis_name: str) -> KernelStatic:
    """PartitionSpecs for a bucket's KernelStatic: observation-lane
    arrays are sharded along the block axis, image-side tables are
    replicated."""
    sh2 = P(None, axis_name)
    return KernelStatic(
        obs_sta=sh2, obs_img=sh2, obs_cam=sh2,
        free_sta=P(), free_pts=sh2, image_cam=P(), perm_obs=P(axis_name),
        blk_rng=P(axis_name, None))


def prepare_spmd(problem: BAProblem, options: BAOptions, mesh: Mesh,
                 TP: int = 128, max_buckets: int = 3):
    """Host-side prep: bucketize with block counts padded to a multiple
    of the mesh size, place the static tables with their shardings, and
    derive the per-device (local) kernel layouts."""
    ndev = int(mesh.devices.size)
    axis_name = mesh.axis_names[0]
    ctx = bf.prepare(problem, options, TP=TP, max_buckets=max_buckets,
                     block_multiple=ndev)
    statics, lays, pts0, idxs, problem_f, options_f, free_arrays = ctx

    # Local layouts: each device sees 1/ndev of every bucket's blocks.
    local_lays = tuple(
        lay._replace(Pp=lay.Pp // ndev, nb=lay.nb // ndev) for lay in lays)

    # Place with make_array_from_callback, NOT device_put: under
    # multi-process meshes (jax.distributed) device_put of a host array
    # onto a global sharding runs a cross-process assert_equal collective
    # per array (slow, and gloo-timeout-prone); the callback form
    # materializes only this process's addressable shards — the correct
    # multi-host ingest pattern (each host feeds its local point blocks).
    def _place(a, s):
        a = np.asarray(a)
        sharding = NamedSharding(mesh, s)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx, a=a: a[idx])

    specs = _static_specs(axis_name)
    statics = tuple(jax.tree.map(_place, st, specs) for st in statics)
    pts0 = tuple(_place(p, P(None, axis_name)) for p in pts0)
    return (statics, lays, local_lays, pts0, idxs, problem_f, options_f,
            free_arrays, mesh)


def solve_prepared_spmd(ctx, interpret: bool = False):
    (statics, lays, local_lays, pts0, idxs, problem, options,
     free_arrays, mesh) = ctx
    axis_name = mesh.axis_names[0]

    from sba_tpu.optim.ba import BASummary

    rep = P()
    static_specs = tuple(_static_specs(axis_name) for _ in statics)
    pts_specs = tuple(P(None, axis_name) for _ in pts0)
    prob_specs = jax.tree.map(lambda _: rep, problem)
    free_specs = jax.tree.map(lambda _: rep, free_arrays)
    out_specs = ((rep, rep, pts_specs, rep),
                 BASummary(rep, rep, rep, rep, rep, rep))

    def inner(statics, pts0, problem, free_arrays):
        return bf._fused_lm_loop_impl(
            statics, local_lays, pts0, problem, options, free_arrays,
            axis_name=axis_name, interpret=interpret)

    fn = jax.jit(jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(static_specs, pts_specs, prob_specs, free_specs),
        out_specs=out_specs,
        check_vma=False,
    ))

    (q, t, pts_t, k), summary = fn(statics, pts0, problem, free_arrays)
    pts_out = bf.unpack_bucket_points(pts_t, idxs, problem.points.shape[0])
    out = problem._replace(qvecs=q, tvecs=t, points=pts_out, cam_params=k)
    return out, summary


def distributed_bundle_adjust_fused(problem: BAProblem,
                                    options: Optional[BAOptions],
                                    mesh: Mesh, interpret: bool = False,
                                    TP: int = 128, max_buckets: int = 3):
    """Solve BA with the fused Pallas kernels SPMD over `mesh`.

    Semantically identical to `optim.ba_fused.bundle_adjust_fused`
    (tests assert agreement up to reduction order); per-iteration
    communication is three psums of the reduced camera system only.
    """
    options = options or BAOptions()
    ctx = prepare_spmd(problem, options, mesh, TP=TP,
                       max_buckets=max_buckets)
    return solve_prepared_spmd(ctx, interpret=interpret)
