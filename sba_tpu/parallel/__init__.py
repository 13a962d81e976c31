from sba_tpu.parallel.distributed_ba import (
    make_mesh,
    shard_problem,
    shard_problem_by_points,
    distributed_bundle_adjust,
    distributed_bundle_adjust_pm,
)
from sba_tpu.parallel.ba_fused_spmd import distributed_bundle_adjust_fused
