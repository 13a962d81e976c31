from sba_tpu.parallel.distributed_ba import (
    make_mesh,
    shard_problem,
    distributed_bundle_adjust,
)
