from sba_tpu.optim.losses import LOSSES, loss_value, loss_weight
from sba_tpu.optim.ba import (
    BAProblem,
    BAOptions,
    BASummary,
    bundle_adjust,
    build_problem,
    evaluate_cost,
)
from sba_tpu.optim.pose_graph import (
    PoseGraphProblem,
    PoseGraphOptions,
    PoseGraphSummary,
    optimize_pose_graph,
    distributed_optimize_pose_graph,
    pose_graph_from_reconstruction,
    apply_pose_graph_result,
)
