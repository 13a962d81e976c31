"""Per-method wall-time probe for the incremental mapper host loop.

Monkey-wraps IncrementalMapper's public methods with timers and runs the
12-image pipeline, printing cumulative seconds after every registration
(flushed — readable even if the run is killed).
"""

import os
import sys
import time
from collections import defaultdict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from sba_tpu.utils.host import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", machine_cache_dir(
    os.path.join(_REPO, "tests", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

TIMES = defaultdict(float)
CALLS = defaultdict(int)


def _wrap(cls, name):
    fn = getattr(cls, name)

    def wrapped(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return fn(self, *a, **k)
        finally:
            dt = time.perf_counter() - t0
            TIMES[name] += dt
            CALLS[name] += 1
            if dt > 2.0 or name == "register_next_image":
                tot = {k2: round(v, 1) for k2, v in sorted(
                    TIMES.items(), key=lambda x: -x[1])}
                print(f"[{name} +{dt:.1f}s] {tot}", flush=True)

    setattr(cls, name, wrapped)


def main(n=12):
    import tempfile

    from sba_tpu.sfm.incremental_mapper import IncrementalMapper
    for name in ("find_initial_image_pair", "register_initial_image_pair",
                 "find_next_images", "register_next_image",
                 "triangulate_image", "adjust_local_bundle",
                 "adjust_global_bundle", "filter_points", "filter_images",
                 "_filter_small_angle_points"):
        _wrap(IncrementalMapper, name)

    from sba_tpu.cli import main as cli
    from sba_tpu.utils.render import render_scene, write_scene_images

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        scene = render_scene(num_images=n, image_size=(320, 240),
                             ring_radius=1.8, jitter=0.06, seed=0)
        img_dir = os.path.join(td, "images")
        write_scene_images(scene, img_dir)
        print(f"render {time.perf_counter()-t0:.0f}s", flush=True)
        db = os.path.join(td, "db.db")
        cli(["database_creator", "--database_path", db])
        t0 = time.perf_counter()
        cli(["feature_extractor", "--database_path", db,
             "--image_path", img_dir,
             "--ImageReader.camera_model", "SIMPLE_PINHOLE",
             "--ImageReader.single_camera", "1",
             "--SiftExtraction.max_num_features", "2048"])
        print(f"extract {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        cli(["exhaustive_matcher", "--database_path", db])
        print(f"match {time.perf_counter()-t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        cli(["mapper", "--database_path", db, "--image_path", img_dir,
             "--output_path", os.path.join(td, "sparse")])
        print(f"mapper {time.perf_counter()-t0:.0f}s", flush=True)
        print("FINAL", dict(sorted(TIMES.items(), key=lambda x: -x[1])),
              flush=True)
        print("CALLS", dict(CALLS), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
