from sba_tpu.optim.losses import LOSSES, loss_value, loss_weight
from sba_tpu.optim.ba import (
    BAProblem,
    BAOptions,
    BASummary,
    bundle_adjust,
    build_problem,
    evaluate_cost,
)
