"""Semantic Bundle Adjustment controller: model + maps in, refined model out.

Capability parity with ref: src/controllers/semantic_bundle_adjustment.{h,cc}
(`SemanticBundleAdjustmentController::Run` :73): check >= 2 registered
images (:83-86), filter observations with negative depth (:92), fix gauge
(first pose constant + tvec x of second image, :106-109), set all
intrinsics constant (:112-115), run the adjuster, write the refined model;
plus the per-iteration state export of `SBACallbackFunctor`
(ref: optim/semantic_bundle_adjustment.cc:1090-1123 -> run/optim_steps/).

The reference enforces SimplePinhole cameras + constant intrinsics +
extrinsic refinement (Assert, ref .cc:604-644) — mirrored here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from sba_tpu.geometry import camera_models
from sba_tpu.io.maps import load_depth_semantic_maps
from sba_tpu.models.reconstruction import Reconstruction
from sba_tpu.optim.sba import (
    SBAOptions,
    build_sba_problem,
    evaluate_hard,
    semantic_bundle_adjust,
)


@dataclass
class SemanticBAControllerOptions:
    """Controller-level options (ref: RunSemanticBundleAdjuster
    exe/sfm.cc:169 flag surface)."""

    input_path: str = ""
    output_path: str = ""
    data_path: str = ""              # per-image *_depth/_semantic .tiff dir
    run_path: Optional[str] = None   # per-iteration export dir (optional)
    export_steps: bool = False
    sba: SBAOptions = field(default_factory=SBAOptions)


def _assert_simple_pinhole(rec: Reconstruction):
    """Ref: optim/semantic_bundle_adjustment.cc:604-644 Assert()."""
    sp_id = camera_models.model_by_name("SIMPLE_PINHOLE").model_id
    for cam in rec.cameras.values():
        if cam.model_id != sp_id:
            raise ValueError(
                "SemanticBundleAdjustment requires SIMPLE_PINHOLE cameras "
                f"(camera {cam.camera_id} has model {cam.model_id})")


def run_semantic_bundle_adjustment(
    options: SemanticBAControllerOptions,
    reconstruction: Optional[Reconstruction] = None,
    callback: Optional[Callable[[int, float], bool]] = None,
) -> Reconstruction:
    """Full SBA workflow. Returns the refined reconstruction (also written
    to `output_path` if set)."""
    rec = reconstruction or Reconstruction.read(options.input_path)

    reg = sorted(i for i in rec.images if rec.is_registered(i))
    if len(reg) < 2:
        raise ValueError(
            "semantic bundle adjustment needs >= 2 registered images "
            "(ref: controllers/semantic_bundle_adjustment.cc:83)")
    _assert_simple_pinhole(rec)
    rec.filter_observations_with_negative_depth()

    names = [rec.images[i].name for i in reg]
    depth_maps, semantic_maps = load_depth_semantic_maps(
        options.data_path, names)

    qvecs = np.stack([rec.images[i].qvec for i in reg])
    tvecs = np.stack([rec.images[i].tvec for i in reg])
    cam_params = np.stack([
        rec.cameras[rec.images[i].camera_id].params[:3] for i in reg])

    problem = build_sba_problem(
        qvecs, tvecs, cam_params, depth_maps, semantic_maps,
        options=options.sba)

    if options.run_path and options.export_steps:
        # Per-iteration state export (ref: SBACallbackFunctor writes poses
        # each LM iteration into run/optim_steps/step_<i>/,
        # optim/semantic_bundle_adjustment.cc:1090-1123). The jitted LM
        # loop cannot call back to host mid-solve, so export mode re-runs
        # the solve one iteration at a time — slower, bit-identical path.
        import dataclasses

        one_iter = dataclasses.replace(options.sba, max_iterations=1)
        out = problem
        summary = None
        for step in range(options.sba.max_iterations):
            out, summary = semantic_bundle_adjust(out, one_iter)
            step_dir = os.path.join(options.run_path, "optim_steps",
                                    f"step_{step}")
            os.makedirs(step_dir, exist_ok=True)
            q_s = np.asarray(out.qvecs)
            t_s = np.asarray(out.tvecs)
            for row, iid in enumerate(reg):
                rec.images[iid].qvec = q_s[row]
                rec.images[iid].tvec = t_s[row]
            rec.write(step_dir, ext=".txt")
            if int(np.asarray(summary.num_iterations)) == 0:
                break
    else:
        out, summary = semantic_bundle_adjust(problem, options.sba)

    q_new = np.asarray(out.qvecs)
    t_new = np.asarray(out.tvecs)
    for row, iid in enumerate(reg):
        rec.images[iid].qvec = q_new[row]
        rec.images[iid].tvec = t_new[row]

    if options.output_path:
        os.makedirs(options.output_path, exist_ok=True)
        rec.write(options.output_path)

    if callback is not None:
        callback(int(np.asarray(summary.num_iterations)),
                 float(np.asarray(summary.final_cost)))
    rec._last_sba_summary = summary  # stats surface for CLI reporting
    return rec
