from sba_tpu.models.reconstruction import Reconstruction, SceneArrays
from sba_tpu.models.cylinder import (
    Cylinder,
    cylinder_to_string,
    cylinder_from_string,
    read_cylinders_text,
    write_cylinders_text,
    cylinder_from_two_points,
    two_points_from_cylinder,
)
