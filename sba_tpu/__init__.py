"""sba_tpu — a TPU-native Structure-from-Motion framework.

A brand-new JAX/XLA/Pallas implementation of the capability set of the
reference `AlainSchoebi/semantic-bundle-adjustment-colmap` (a COLMAP 3.8 fork
with semantic segmentation-aided bundle adjustment), designed TPU-first:

- scene state as struct-of-arrays pytrees (poses ``[N,7]``, points ``[P,3]``,
  observations as a COO table) instead of pointer-heavy C++ objects,
- Ceres replaced by a pure-JAX Levenberg-Marquardt / trust-region engine with
  batched residual + Jacobian evaluation and an implicit-Schur PCG solver,
- the fork's dense semantic-consistency BA and cylinder geometric-semantic BA
  as batched, differentiable (soft) kernels with a hard parity mode,
- SIFT-style feature extraction/matching as batched convolution + matmul
  kernels, RANSAC as fixed-size vmapped hypothesis evaluation,
- multi-chip scaling via `jax.sharding.Mesh` + `shard_map` with XLA
  collectives (`psum`) over ICI, not NCCL/MPI.

Layout (capability map to the reference's `src/` tree):

- ``geometry/``  — quaternion/pose algebra, camera models, projection,
                   triangulation (ref: ``src/base/*`` math).
- ``models/``    — scene containers: `Reconstruction`, cylinders, database
                   (ref: ``src/base/reconstruction.*``, ``util/cylinder.h``).
- ``optim/``     — LM engine, bundle adjustment, semantic BA, geometric
                   semantic BA, RANSAC (ref: ``src/optim/*``).
- ``estimators/``— minimal solvers: P3P/EPnP, 5pt/8pt E, 7pt/8pt F,
                   homography, two-view geometry (ref: ``src/estimators/*``).
- ``features/``  — SIFT extraction + matching pipelines (ref: ``src/feature/*``).
- ``retrieval/`` — vocab-tree retrieval (ref: ``src/retrieval/*``).
- ``sfm/``       — incremental mapper + triangulator (ref: ``src/sfm/*``).
- ``mvs/``       — PatchMatch stereo + fusion (ref: ``src/mvs/*``).
- ``parallel/``  — device-mesh sharded BA / distributed Schur-PCG.
- ``io/``        — COLMAP model binary/text IO, TIFF maps, PLY export.
- ``utils/``     — options/config, timing, logging.
- ``cli/``       — `colmap`-compatible command surface.
"""

__version__ = "0.1.0"
