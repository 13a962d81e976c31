from sba_tpu.mvs.patch_match import (
    PatchMatchOptions,
    patch_match_stereo,
)
from sba_tpu.mvs.fusion import (
    StereoFusionOptions,
    fuse_depth_maps,
)
from sba_tpu.mvs.depth_maps import (
    read_colmap_map,
    write_colmap_map,
)
