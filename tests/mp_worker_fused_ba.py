"""Multi-process SPMD worker: fused BA + pose graph over a 2-process mesh.

Launched by tests/test_multiprocess.py as
`python mp_worker_fused_ba.py <process_id> <num_processes> <port>`.
Each process owns 4 virtual CPU devices; `jax.distributed.initialize`
forms the 8-device global mesh and XLA's gloo CPU collectives carry the
psums — the same program a 2-host TPU slice runs over ICI/DCN
(SURVEY.md §4 implication (c): the multi-host path the reference lacks).
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
from sba_tpu.utils.host import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir(os.path.join(_here, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sba_tpu.optim.ba import BAOptions  # noqa: E402
from sba_tpu.utils.synthetic import make_ba_problem  # noqa: E402
from sba_tpu.parallel import distributed_bundle_adjust_fused  # noqa: E402


def scalar(x) -> float:
    """Read a fully-replicated global array's local shard."""
    return float(np.asarray(x.addressable_data(0)))


assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nproc
mesh = Mesh(np.array(jax.devices()), ("points",))

# Form the full-mesh gloo context NOW with a trivial psum, while the two
# processes are still in lockstep: gloo rendezvous has a fixed ~30 s
# timeout, and the big program's first collective would otherwise race
# against the other process's compile time.
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

warm = jax.make_array_from_callback(
    (4 * nproc,), NamedSharding(mesh, P("points")),
    lambda idx: np.ones(1, np.float32))
warm_out = jax.jit(jax.shard_map(
    lambda x: jax.lax.psum(x, "points"), mesh=mesh,
    in_specs=P("points"), out_specs=P("points")))(warm)
assert float(np.asarray(warm_out.addressable_data(0))[0]) == 4 * nproc

# Identical problem in every process (deterministic seed) — the sharded
# make_array_from_callback slices each process's local point blocks out
# of it. Constructed under the local default device (multi-controller
# eager ops otherwise produce global-replicated arrays whose values this
# process cannot fetch), then dropped to host numpy.
with jax.default_device(jax.local_devices()[0]):
    problem, _ = make_ba_problem(
        num_images=6, num_points=150, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=23,
        dtype=jnp.float32)
problem = jax.tree.map(lambda a: np.asarray(a), problem)
opt = BAOptions(model_id=0, max_iterations=20, dtype="float32",
                schur_bf16=False)

out, summary = distributed_bundle_adjust_fused(
    problem, opt, mesh, interpret=True)

final = scalar(summary.final_cost)
initial = scalar(summary.initial_cost)
tvecs = np.asarray(out.tvecs.addressable_data(0)) \
    if hasattr(out.tvecs, "addressable_data") else np.asarray(out.tvecs)

# Pose-graph relaxation over the same global mesh (edge-sharded psums).
from sba_tpu.optim.pose_graph import (  # noqa: E402
    PoseGraphOptions, distributed_optimize_pose_graph, make_problem)

rng = np.random.default_rng(0)
npg = 16
qg = np.tile(np.array([1.0, 0, 0, 0]), (npg, 1))
tg = rng.normal(size=(npg, 3)) * 0.1
ei = np.arange(npg - 1, dtype=np.int32)
ej = ei + 1
rel_q = np.tile(np.array([1.0, 0, 0, 0]), (npg - 1, 1))
rel_t = tg[ej] - tg[ei]
pg = make_problem(qg, tg, ei, ej, rel_q, rel_t)
pg_mesh = Mesh(np.array(jax.devices()), ("edges",))
_, pg_sum = distributed_optimize_pose_graph(
    pg, PoseGraphOptions(max_iterations=5, cg_iterations=10), pg_mesh)
pg_final = scalar(pg_sum.final_cost)

# Parent parses these lines.
print(f"RESULT {pid} initial={initial:.10e} final={final:.10e} "
      f"t0={tvecs[1, 0]:.8e} t1={tvecs[1, 1]:.8e} "
      f"pg_final={pg_final:.10e}", flush=True)
