from sba_tpu.parallel.distributed_ba import (
    make_mesh,
    shard_problem,
    shard_problem_by_points,
    distributed_bundle_adjust,
    distributed_bundle_adjust_pm,
)
