from sba_tpu.controllers.semantic_ba import (
    SemanticBAControllerOptions,
    run_semantic_bundle_adjustment,
)
from sba_tpu.controllers.geometric_semantic_ba import (
    GeometricSemanticBAControllerOptions,
    run_geometric_semantic_bundle_adjustment,
)
