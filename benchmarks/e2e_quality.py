"""End-to-end quality metric: render -> SIFT -> match -> map -> ATE.

Run as a subprocess by bench.py (CPU backend: the incremental mapper is
a host-driven loop of small solves; the axon TPU tunnel's fixed ~25-55ms
sync tax per host read would dominate and say nothing about quality).
Prints one JSON line: {"ate_frac": ..., "registered_frac": ...,
"mean_reproj_px": ..., "num_points": ...}.

Matches the reference's judgment path: automatic_reconstructor output
compared by model_comparer pose error
(ref: src/controllers/automatic_reconstruction.cc:139-167,
src/exe/model.cc).
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from sba_tpu.utils.host import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", machine_cache_dir(
    os.path.join(_REPO, "tests", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import tempfile

    from sba_tpu.cli import _align_models, main as cli
    from sba_tpu.models.reconstruction import Reconstruction
    from sba_tpu.utils.render import (gt_reconstruction, render_scene,
                                      write_scene_images)

    RING_RADIUS = 1.6
    with tempfile.TemporaryDirectory() as td:
        scene = render_scene(num_images=6, image_size=(320, 240),
                             ring_radius=RING_RADIUS, seed=0)
        img_dir = os.path.join(td, "images")
        names = write_scene_images(scene, img_dir)
        gt = gt_reconstruction(scene, names)
        db = os.path.join(td, "db.db")
        assert cli(["database_creator", "--database_path", db]) == 0
        assert cli(["feature_extractor", "--database_path", db,
                    "--image_path", img_dir,
                    "--ImageReader.camera_model", "SIMPLE_PINHOLE",
                    "--ImageReader.single_camera", "1",
                    "--SiftExtraction.max_num_features", "2048"]) == 0
        assert cli(["exhaustive_matcher", "--database_path", db]) == 0
        sparse = os.path.join(td, "sparse")
        assert cli(["mapper", "--database_path", db,
                    "--image_path", img_dir,
                    "--output_path", sparse]) == 0

        rec = Reconstruction.read(os.path.join(sparse, "0"))
        s, R, t, common, src, dst = _align_models(rec, gt)
        err = np.linalg.norm((s * (src @ R.T)) + t - dst, axis=-1)
        print(json.dumps({
            "ate_frac": float(err.mean() / RING_RADIUS),
            "registered_frac": rec.num_registered_images() / 6.0,
            "mean_reproj_px": float(rec.compute_mean_reprojection_error()),
            "num_points": rec.num_points3d(),
        }), flush=True)


if __name__ == "__main__":
    main()
