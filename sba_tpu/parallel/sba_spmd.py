"""SPMD semantic bundle adjustment: ordered pairs sharded over a mesh.

The SBA residual field is embarrassingly parallel over ordered image
pairs (Q = N(N-1) at the production shape), and its parameter space is
pose-only ([6N] — 300 floats at 50 images). So the natural sharding is:

- pair lists (pair_src/pair_dst/pair_mask) split along the mesh axis,
- poses, intrinsics, and the packed depth/semantic map stacks
  REPLICATED (50 full-res map pairs = ~130 MB packed — comfortably
  replicable; map sharding would force all-to-all pixel gathers),
- per LM iteration, ONE psum of (H [6N,6N], g [6N], cost) makes the
  replicated dense solve see the global normal equations. At 50 images
  that is ~360 KB/iteration over ICI — communication is O((6N)^2),
  independent of Q and of map resolution.

This gives the fork's namesake workload (ref:
src/optim/semantic_bundle_adjustment.cc, single-node Ceres with
OpenMP threading only) a multi-chip scaling story the reference never
had. Correctness: 8-device CPU-mesh parity test vs the single-device
path (tests/test_distributed_sba.py).

WHERE MAP REPLICATION BREAKS (measured 2026-08-22, v5e): the
replicated per-image device footprint at 640x480 is 3.7 MB/image
(joint-packed u32 map 1.2 MB + f32 depth/semantic stacks for the
hard-mode evaluation 2.5 MB; src tables are negligible). On a 16 GB
HBM chip that caps REPLICATED maps at ~4,000 images — the BASELINE
1k-image config fits with 12 GB to spare (measured single-chip:
100 img / 9.9k pairs / 30M samples at 2.62 LM it/s, 200 img / 40k
pairs at 0.66 it/s; time scales linearly in pair count at
~12.5 ns/sample in the pair-chunked regime). Past the cap, the
sharded-map design is DST-GROUPED pair sharding: partition the
ordered-pair list by DESTINATION image (the gathers only ever touch
the destination's maps) so each device stores only its destination
subset of joint_packed, while the small [N, S] source tables
(24 KB/image) stay replicated — the same psum-of-normal-equations
communication pattern, zero cross-device gathers. Not implemented:
the largest driver config (1k images) sits comfortably inside the
replication cap.
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

from sba_tpu.optim.sba import (SBAOptions, SBAProblem, _sba_solve)

_AXIS = "sba_pairs"


def _pad_pairs(problem: SBAProblem, ndev: int) -> SBAProblem:
    Q = int(problem.pair_src.shape[0])
    pad = (-Q) % ndev
    if pad == 0:
        return problem
    z = jnp.zeros(pad, problem.pair_src.dtype)
    return problem._replace(
        pair_src=jnp.concatenate([problem.pair_src, z]),
        pair_dst=jnp.concatenate([problem.pair_dst, z]),
        pair_mask=jnp.concatenate(
            [problem.pair_mask,
             jnp.zeros(pad, problem.pair_mask.dtype)]))


def semantic_bundle_adjust_spmd(problem: SBAProblem,
                                options: Optional[SBAOptions] = None,
                                mesh: Optional[Mesh] = None):
    """Drop-in `semantic_bundle_adjust` over a 1-D device mesh."""
    opt = options or SBAOptions()
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), (_AXIS,))
    ndev = mesh.devices.size
    problem = _pad_pairs(problem, ndev)
    opt = dataclasses.replace(opt, axis_name=_AXIS)

    pspec = SBAProblem(
        qvecs=P(), tvecs=P(), cam_params=P(), depth_maps=P(),
        semantic_maps=P(), pix_xy=P(), src_depth=P(), src_label=P(),
        pair_src=P(_AXIS), pair_dst=P(_AXIS), pair_mask=P(_AXIS),
        free_rot=P(), free_trans=P(),
        depth_packed=None if problem.depth_packed is None else P(),
        label_packed=None if problem.label_packed is None else P(),
        depth_range=None if problem.depth_range is None else P(),
        joint_packed=None if problem.joint_packed is None else P(),
        src_code=None if problem.src_code is None else P(),
    )

    def local(p):
        out, summary = _sba_solve(p, opt)
        # Return only replicated outputs (the pair shards stay local).
        return out.qvecs, out.tvecs, summary

    fn = shard_map(local, mesh=mesh, in_specs=(pspec,),
                   out_specs=P())
    q, t, summary = jax.jit(fn)(problem)
    return problem._replace(qvecs=q, tvecs=t), summary
