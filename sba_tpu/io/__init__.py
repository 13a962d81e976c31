from sba_tpu.io.colmap_models import (
    read_model,
    write_model,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
    read_cameras_text,
    read_images_text,
    read_points3d_text,
    write_cameras_text,
    write_images_text,
    write_points3d_text,
    export_ply,
)
from sba_tpu.io.maps import read_float_map_tiff, write_float_map_tiff, load_depth_semantic_maps
