from sba_tpu.estimators.absolute_pose import p3p_solve, epnp_solve
from sba_tpu.estimators.fundamental_matrix import (
    fundamental_8pt,
    fundamental_7pt,
    sampson_error_f,
)
from sba_tpu.estimators.essential_matrix import (
    essential_8pt,
    essential_5pt,
    pose_from_essential,
    sampson_error_e,
)
from sba_tpu.estimators.homography_matrix import homography_dlt, homography_transfer_error
from sba_tpu.estimators.generalized_relative_pose import (
    GeneralizedRelativePoseOptions,
    estimate_generalized_relative_pose,
    generalized_sampson_errors,
    gr6p_solve,
)
