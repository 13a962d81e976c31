from sba_tpu.geometry.quaternions import (
    quat_normalize,
    quat_conjugate,
    quat_inverse_rotation,
    quat_multiply,
    quat_rotate,
    quat_to_rotmat,
    rotmat_to_quat,
    angle_axis_to_quat,
    quat_to_angle_axis,
    angle_axis_rotate,
    quat_retract,
    pose_inverse,
    pose_product,
    pose_transform,
    quat_slerp,
)
from sba_tpu.geometry import camera_models
from sba_tpu.geometry.projection import (
    pose_matrix,
    project_simple_pinhole,
    project_points,
    reprojection_error,
    calculate_depth,
    has_point_positive_depth,
)
from sba_tpu.geometry.triangulation import (
    triangulate_point,
    triangulate_points_batch,
    triangulate_midpoint,
    triangulation_angle,
)
