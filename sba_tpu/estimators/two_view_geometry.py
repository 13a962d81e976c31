"""Two-view geometry estimation + configuration classification.

Capability parity with ref: src/estimators/two_view_geometry.{h,cc} —
`TwoViewGeometry::Estimate` (:113), `EstimateCalibrated` (:232),
`EstimateUncalibrated` (:371), `EstimateHomography` (:445), plus
`DetectWatermark` (:514) and `EstimateRelativePose` (:52).

TPU-first design: the three robust fits (E, F, H) that the reference runs
sequentially are three independent batched RANSACs over the SAME
correspondences — launched back to back on device (each is one vmapped
minimal-solver + one support matmul), then a handful of scalar comparisons
on host pick the configuration exactly as the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.estimators.essential_matrix import (
    essential_5pt,
    pose_from_essential,
    sampson_error_e,
)
from sba_tpu.estimators.fundamental_matrix import (
    fundamental_7pt,
    fundamental_8pt,
    sampson_error_f,
)
from sba_tpu.estimators.homography_matrix import (
    homography_dlt,
    homography_transfer_error,
)
from sba_tpu.geometry.quaternions import rotmat_to_quat
from sba_tpu.optim.ransac import RANSACOptions, ransac


def _h_solve(a, b):
    """4pt homography as a 1-model solver (module-level for the jitted
    RANSAC program cache)."""
    return homography_dlt(a, b)[None], jnp.ones(1, bool)


class TwoViewConfig(IntEnum):
    """Ref: two_view_geometry.h ConfigurationType enum (same values)."""

    UNDEFINED = 0
    DEGENERATE = 1
    CALIBRATED = 2
    UNCALIBRATED = 3
    PLANAR = 4
    PANORAMIC = 5
    PLANAR_OR_PANORAMIC = 6
    WATERMARK = 7
    MULTIPLE = 8


@dataclass(frozen=True)
class TwoViewGeometryOptions:
    """Subset of ref: two_view_geometry.h `Options` (via
    SiftMatchingOptions defaults in matching code)."""

    min_num_inliers: int = 15
    max_error: float = 4.0           # px
    confidence: float = 0.999
    min_inlier_ratio: float = 0.25
    max_num_trials: int = 4096
    min_E_F_inlier_ratio: float = 0.95
    max_H_inlier_ratio: float = 0.8
    watermark_min_inlier_ratio: float = 0.7
    watermark_border_size: float = 0.1
    detect_watermark: bool = True
    compute_relative_pose: bool = True


class TwoViewGeometryResult(NamedTuple):
    config: int
    E: np.ndarray            # [3,3]
    F: np.ndarray            # [3,3]
    H: np.ndarray            # [3,3]
    qvec: np.ndarray         # [4] relative rotation (cam1 -> cam2)
    tvec: np.ndarray         # [3] relative translation (unit norm)
    inlier_mask: np.ndarray  # [N] bool, for the winning model
    num_inliers: int


def _pixel_to_normalized(xy, fx, fy, cx, cy):
    return jnp.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy], -1)


def estimate_two_view_geometry(
    xy1, xy2,
    cam1_fxycxy=None, cam2_fxycxy=None,
    image_size1=None, image_size2=None,
    options: Optional[TwoViewGeometryOptions] = None,
    seed: int = 0,
    mask=None,
) -> TwoViewGeometryResult:
    """Classify a matched image pair and estimate its relative geometry.

    xy1/xy2: [N, 2] matched pixel keypoints (already matched 1:1).
    cam*_fxycxy: (fx, fy, cx, cy) intrinsics; if given the CALIBRATED
    path (essential matrix) runs, else only F/H (UNCALIBRATED).
    `mask`: optional [N] validity mask — callers pad N to a fixed bucket
    size so every jax op in the RANSAC stack hits the shape cache (one
    compile per bucket instead of one per pair; the dynamic-shape
    discipline SURVEY.md §7 calls the central engineering problem).
    Decision logic mirrors ref two_view_geometry.cc:232-369.
    """
    opt = options or TwoViewGeometryOptions()
    n = int(xy1.shape[0])
    n_true = n if mask is None else int(np.asarray(mask).sum())
    empty3 = np.eye(3)
    if n_true < opt.min_num_inliers:
        return TwoViewGeometryResult(
            int(TwoViewConfig.DEGENERATE), empty3, empty3, empty3,
            np.array([1.0, 0, 0, 0]), np.zeros(3),
            np.zeros(n, bool), 0)
    if mask is not None:
        mask = jnp.asarray(mask)

    xy1 = jnp.asarray(xy1, jnp.float64 if jax.config.jax_enable_x64
                      else jnp.float32)
    xy2 = jnp.asarray(xy2, xy1.dtype)
    key = jax.random.PRNGKey(seed)
    kE, kF, kH = jax.random.split(key, 3)
    ropt = RANSACOptions(
        max_error=opt.max_error, min_inlier_ratio=opt.min_inlier_ratio,
        confidence=opt.confidence, max_num_trials=opt.max_num_trials)

    calibrated = cam1_fxycxy is not None and cam2_fxycxy is not None

    # --- F (7pt minimal; residual = squared Sampson in px) ---
    # Module-level fns: stable identities -> the jitted RANSAC program
    # caches across pairs (optim/ransac.py).
    repF = ransac(
        kF, (xy1, xy2),
        fundamental_7pt,
        sampson_error_f,
        7, ropt, mask=mask,
        refit_fn=_weighted_f_refit)

    # --- H (4pt DLT; residual = squared transfer error in px) ---
    repH = ransac(
        kH, (xy1, xy2),
        _h_solve,
        homography_transfer_error,
        4, ropt, mask=mask)

    nF = int(repF.num_inliers)
    nH = int(repH.num_inliers)

    repE = None
    nE = 0
    if calibrated:
        f1x, f1y, c1x, c1y = [float(v) for v in cam1_fxycxy]
        f2x, f2y, c2x, c2y = [float(v) for v in cam2_fxycxy]
        n1 = _pixel_to_normalized(xy1, f1x, f1y, c1x, c1y)
        n2 = _pixel_to_normalized(xy2, f2x, f2y, c2x, c2y)
        # Threshold scaled to normalized coords by the mean focal
        # (ref: two_view_geometry.cc:262-265).
        fmean = (f1x + f1y + f2x + f2y) / 4.0
        roptE = RANSACOptions(
            max_error=opt.max_error / fmean,
            min_inlier_ratio=opt.min_inlier_ratio,
            confidence=opt.confidence, max_num_trials=opt.max_num_trials)
        repE = ransac(
            kE, (n1, n2),
            essential_5pt,
            sampson_error_e,
            5, roptE, mask=mask,
            refit_fn=_weighted_e_refit)
        nE = int(repE.num_inliers)

    cam1_t = cam2_t = None
    if calibrated:
        cam1_t = (f1x, f1y, c1x, c1y)
        cam2_t = (f2x, f2y, c2x, c2y)
    return _finalize(
        opt, calibrated,
        None if repE is None else (np.asarray(repE.model),
                                   np.asarray(repE.inlier_mask), nE),
        (np.asarray(repF.model), np.asarray(repF.inlier_mask), nF),
        (np.asarray(repH.model), np.asarray(repH.inlier_mask), nH),
        np.asarray(xy1), np.asarray(xy2),
        None if repE is None else np.asarray(n1),
        None if repE is None else np.asarray(n2),
        cam1_t, cam2_t, image_size1, image_size2)


_pose_from_essential_jit = jax.jit(
    lambda E, n1, n2, m: pose_from_essential(E, n1, n2, m))


def _finalize(opt, calibrated, repE, repF, repH, xy1, xy2, n1, n2,
              cam1_fxycxy, cam2_fxycxy, image_size1, image_size2):
    """Host-side configuration decision + pose recovery from the three
    robust fits (all-numpy inputs; rep* = (model, inlier_mask, n) or
    None). Shared by the per-pair and batched estimators — decision
    logic mirrors ref two_view_geometry.cc:286-338."""
    empty3 = np.eye(3)
    Fm, Fmask, nF = repF
    Hm, Hmask, nH = repH
    Em, Emask, nE = repE if repE is not None else (None, None, 0)

    best_n = max(nE, nF, nH)
    if best_n < opt.min_num_inliers:
        config = TwoViewConfig.DEGENERATE
        win = (Fm, Fmask, nF)
    elif calibrated and nE >= opt.min_E_F_inlier_ratio * max(nF, 1):
        win = (Em, Emask, nE)
        config = TwoViewConfig.CALIBRATED
        if nH >= opt.max_H_inlier_ratio * nE:
            config = TwoViewConfig.PLANAR_OR_PANORAMIC
    else:
        win = (Fm, Fmask, nF)
        config = TwoViewConfig.UNCALIBRATED
        if nH >= opt.max_H_inlier_ratio * nF:
            config = TwoViewConfig.PLANAR_OR_PANORAMIC

    inlier_mask = np.asarray(win[1])
    num_inliers = int(win[2])

    # --- watermark detection (ref: two_view_geometry.cc:514-583):
    # pure border translation => demote to WATERMARK.
    if (opt.detect_watermark and config != TwoViewConfig.DEGENERATE
            and image_size1 is not None and image_size2 is not None
            and num_inliers >= opt.min_num_inliers):
        if _is_watermark(xy1, xy2, inlier_mask,
                         image_size1, image_size2, opt):
            config = TwoViewConfig.WATERMARK

    qvec = np.array([1.0, 0, 0, 0])
    tvec = np.zeros(3)
    if (opt.compute_relative_pose and calibrated
            and config == TwoViewConfig.CALIBRATED and Em is not None):
        # Jitted (cached per correspondence-bucket shape): the eager
        # per-op dispatch of the cheirality triangulation measured
        # ~140 ms per pair in the batched matcher loop.
        R, t, _ = _pose_from_essential_jit(Em, n1, n2, Emask)
        from sba_tpu.geometry.quaternions import np_rotmat_to_quat
        qvec = np_rotmat_to_quat(np.asarray(R))
        nrm = float(jnp.linalg.norm(t))
        tvec = np.asarray(t) / (nrm if nrm > 1e-12 else 1.0)
    elif (opt.compute_relative_pose and calibrated
          and config == TwoViewConfig.PLANAR_OR_PANORAMIC):
        # Planar/panoramic pairs: pose from the HOMOGRAPHY decomposition
        # (Malis/Vargas + cheirality voting), not from E — E is degenerate
        # for pure rotation (t ~ 0) and ill-conditioned for planar scenes
        # (ref: src/estimators/two_view_geometry.cc:203 ->
        # src/base/homography_matrix.cc:186 PoseFromHomographyMatrix).
        from sba_tpu.estimators.homography_matrix import \
            pose_from_homography
        from sba_tpu.geometry.quaternions import np_rotmat_to_quat
        f1x, f1y, c1x, c1y = cam1_fxycxy
        f2x, f2y, c2x, c2y = cam2_fxycxy
        K1 = np.array([[f1x, 0, c1x], [0, f1y, c1y], [0, 0, 1.0]])
        K2 = np.array([[f2x, 0, c2x], [0, f2y, c2y], [0, 0, 1.0]])
        R, t, _, _ = pose_from_homography(
            Hm, K1, K2, xy1, xy2, inlier_mask=Hmask)
        qvec = np_rotmat_to_quat(np.asarray(R))
        nrm = float(np.linalg.norm(t))
        # |t| = 0 resolves the ambiguity to PANORAMIC, else PLANAR
        # (ref: two_view_geometry.cc:221-228).
        if nrm <= 1e-12:
            config = TwoViewConfig.PANORAMIC
            tvec = np.zeros(3)
        else:
            config = TwoViewConfig.PLANAR
            tvec = np.asarray(t) / nrm

    return TwoViewGeometryResult(
        config=int(config),
        E=Em if Em is not None else empty3,
        F=Fm, H=Hm,
        qvec=qvec, tvec=tvec,
        inlier_mask=inlier_mask, num_inliers=num_inliers)


def _weighted_f_refit(w, xy1, xy2):
    """Weighted 8-point refit for LO-RANSAC on F."""
    from sba_tpu.estimators.fundamental_matrix import _epipolar_rows, \
        _normalize_points

    n1, T1 = _normalize_points(xy1)
    n2, T2 = _normalize_points(xy2)
    A = _epipolar_rows(n1, n2) * w[:, None]
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    F = V[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    F = (U * jnp.stack([S[0], S[1], jnp.zeros_like(S[2])])) @ Vt
    F = T2.T @ F @ T1
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-12)


def _weighted_e_refit(w, n1, n2):
    """Weighted 8-point refit with (1, 1, 0) singular enforcement for
    LO-RANSAC on E (the non-minimal inner refinement the reference gets
    from LORANSAC's Refine, ref: optim/loransac.h:54)."""
    from sba_tpu.estimators.fundamental_matrix import _epipolar_rows, \
        _normalize_points

    p1, T1 = _normalize_points(n1)
    p2, T2 = _normalize_points(n2)
    A = _epipolar_rows(p1, p2)

    def fit(weights):
        Aw = A * weights[:, None]
        _, V = jnp.linalg.eigh(Aw.T @ Aw)
        E = V[:, 0].reshape(3, 3)
        E = T2.T @ E @ T1
        U, S, Vt = jnp.linalg.svd(E)
        s = 0.5 * (S[0] + S[1])
        E = (U * jnp.stack([s, s, jnp.zeros_like(s)])) @ Vt
        return E / jnp.maximum(jnp.linalg.norm(E), 1e-12)

    # IRLS: reweight algebraic rows by the Sampson denominator so the fit
    # approximates geometric (Sampson) minimization, not just algebraic.
    E = fit(w)
    h1 = jnp.concatenate([n1, jnp.ones_like(n1[:, :1])], -1)
    h2 = jnp.concatenate([n2, jnp.ones_like(n2[:, :1])], -1)
    for _ in range(2):
        l2 = h1 @ E.T
        l1 = h2 @ E
        den = (l2[:, 0] ** 2 + l2[:, 1] ** 2
               + l1[:, 0] ** 2 + l1[:, 1] ** 2)
        E = fit(w / jnp.sqrt(jnp.maximum(den, 1e-12)))
    # Gauss-Newton polish of the (R, t) pose minimizing weighted Sampson
    # error — the TPU equivalent of the reference's Ceres
    # `RefineEssentialMatrix` (ref: estimators/essential_matrix.cc), done
    # with autodiff Jacobians instead of autodiff cost functors.
    return refine_essential_sampson(E, n1, n2, w, num_iterations=8)


def refine_essential_sampson(E, n1, n2, w, num_iterations: int = 8):
    """GN refinement of E over its (qvec, tvec-direction) parametrization,
    minimizing the weighted Sampson error. Jit-safe, static iteration count."""
    from sba_tpu.geometry.quaternions import quat_normalize, quat_to_rotmat

    # Initialize pose from E by cheirality-aware decomposition.
    R0, t0, _ = pose_from_essential(E, n1, n2, w > 0)
    q0 = rotmat_to_quat(R0)
    p0 = jnp.concatenate([q0, t0 / jnp.maximum(jnp.linalg.norm(t0), 1e-12)])

    h1 = jnp.concatenate([n1, jnp.ones_like(n1[:, :1])], -1)
    h2 = jnp.concatenate([n2, jnp.ones_like(n2[:, :1])], -1)
    sw = jnp.sqrt(w)

    def e_of(p):
        q = quat_normalize(p[:4])
        t = p[4:]
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        R = quat_to_rotmat(q)
        tx = jnp.array([[0.0, -t[2], t[1]],
                        [t[2], 0.0, -t[0]],
                        [-t[1], t[0], 0.0]], p.dtype)
        Em = tx @ R
        l2 = h1 @ Em.T
        l1 = h2 @ Em
        num = jnp.sum(h2 * l2, -1)
        den = (l2[:, 0] ** 2 + l2[:, 1] ** 2
               + l1[:, 0] ** 2 + l1[:, 1] ** 2)
        return sw * num / jnp.sqrt(jnp.maximum(den, 1e-18))

    jac = jax.jacfwd(e_of)

    def huber_w(r):
        # IRLS Cauchy (redescending) weights with MAD scale: threshold
        # "inliers" that are actually outliers get their influence driven
        # to ~0 instead of biasing flat cost directions. (The reference
        # relies on Ceres CauchyLoss for the same reason,
        # ref: optim/semantic_bundle_adjustment.cc loss options.)
        a = jnp.abs(r)
        a_act = jnp.where(w > 0, a, jnp.nan)
        delta = 3.0 * (1.48 * jnp.nanmedian(a_act) + 1e-18)
        return 1.0 / jnp.sqrt(1.0 + (a / delta) ** 2)

    def step(p, _):
        r = e_of(p)
        hw = huber_w(r)
        r_w = hw * r
        J = hw[:, None] * jac(p)
        JtJ = J.T @ J
        g = J.T @ r_w
        dp = jnp.linalg.solve(
            JtJ + 1e-8 * jnp.eye(7, dtype=p.dtype)
            * jnp.maximum(jnp.trace(JtJ) / 7.0, 1e-12), -g)
        p_new = p + dp
        better = jnp.sum((hw * e_of(p_new)) ** 2) < jnp.sum(r_w ** 2)
        return jnp.where(better, p_new, p), None

    p, _ = jax.lax.scan(step, p0, None, length=num_iterations)
    q = quat_normalize(p[:4])
    t = p[4:]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    from sba_tpu.geometry.quaternions import quat_to_rotmat as q2r
    R = q2r(q)
    tx = jnp.array([[0.0, -t[2], t[1]],
                    [t[2], 0.0, -t[0]],
                    [-t[1], t[0], 0.0]], p.dtype)
    E_out = tx @ R
    return E_out / jnp.maximum(jnp.linalg.norm(E_out), 1e-12)


def estimate_two_view_geometry_multiple(
    xy1, xy2,
    cam1_fxycxy=None, cam2_fxycxy=None,
    image_size1=None, image_size2=None,
    options: Optional[TwoViewGeometryOptions] = None,
    seed: int = 0,
    max_models: int = 8,
):
    """Recursive multi-model two-view estimation
    (ref: two_view_geometry.h:158-166 EstimateMultiple, .cc:128):
    estimate, remove the inliers, re-estimate on the remainder, until
    too few correspondences survive or a model fails. Returns a list
    of TwoViewGeometryResult; each result's inlier_mask indexes the
    ORIGINAL correspondence array. When more than one model is found,
    every returned result's config is MULTIPLE (the reference's
    marker for scenes with several rigid motions / watermark overlays;
    the per-model geometry is preserved in E/F/H/qvec/tvec)."""
    opt = options or TwoViewGeometryOptions()
    xy1 = np.asarray(xy1)
    xy2 = np.asarray(xy2)
    n = len(xy1)
    remaining = np.ones(n, bool)
    results = []
    for k in range(max_models):
        if remaining.sum() < opt.min_num_inliers:
            break
        # Pad to the pow2 bucket so the jitted RANSAC programs cache.
        idx = np.nonzero(remaining)[0]
        m = len(idx)
        mpad = 1 << max(5, (m - 1).bit_length())
        x1 = np.zeros((mpad, 2))
        x2 = np.zeros((mpad, 2))
        x1[:m] = xy1[idx]
        x2[:m] = xy2[idx]
        mask = np.zeros(mpad, bool)
        mask[:m] = True
        tv = estimate_two_view_geometry(
            x1, x2, cam1_fxycxy, cam2_fxycxy, image_size1, image_size2,
            options=opt, seed=seed + k, mask=mask)
        if (tv.config == int(TwoViewConfig.DEGENERATE)
                or tv.num_inliers < opt.min_num_inliers):
            break
        full_mask = np.zeros(n, bool)
        full_mask[idx[np.nonzero(tv.inlier_mask[:m])[0]]] = True
        results.append(tv._replace(inlier_mask=full_mask))
        remaining &= ~full_mask
    if len(results) > 1:
        results = [r._replace(config=int(TwoViewConfig.MULTIPLE))
                   for r in results]
    return results


# ---------------------------------------------------------------------------
# Batched verification (round 5): the CLI matcher's device path
# ---------------------------------------------------------------------------

_TVG_BATCH_CACHE: dict = {}
_TVG_EVAL_CACHE: dict = {}

# RANSAC correspondence cap for the batched verifier: minimal-solver
# sampling and support ranking run on an evenly-strided subsample of at
# most this many correspondences (support from 512 points ranks models
# as reliably as from 2048), then the WINNING models' inlier masks and
# counts are re-evaluated on the FULL set in one cheap batched pass —
# the DB masks and the configuration decision see every match, exactly
# like the reference. 4-8x less verification compute at dense-match
# pairs.
_TVG_RANSAC_CAP = 512


def _tvg_eval_fn(N: int, opt: TwoViewGeometryOptions, dtype):
    """Jitted full-set evaluation of the three winning models: returns
    per-pair (F mask/count, H mask/count, E mask/count) over ALL N
    correspondences."""
    key_ = (N, opt, dtype)
    hit = _TVG_EVAL_CACHE.get(key_)
    if hit is not None:
        return hit

    def one(xy1, xy2, mask, c1, c2, Fm, Hm, Em):
        thr2 = opt.max_error ** 2
        rF = sampson_error_f(Fm, xy1, xy2)
        mF = (rF <= thr2) & mask
        rH = homography_transfer_error(Hm, xy1, xy2)
        mH = (rH <= thr2) & mask
        n1 = jnp.stack([(xy1[:, 0] - c1[2]) / c1[0],
                        (xy1[:, 1] - c1[3]) / c1[1]], axis=-1)
        n2 = jnp.stack([(xy2[:, 0] - c2[2]) / c2[0],
                        (xy2[:, 1] - c2[3]) / c2[1]], axis=-1)
        fmean = (c1[0] + c1[1] + c2[0] + c2[1]) / 4.0
        rE = sampson_error_e(Em, n1, n2)
        mE = (rE <= (opt.max_error / fmean) ** 2) & mask
        return (mF, jnp.sum(mF), mH, jnp.sum(mH), mE, jnp.sum(mE),
                n1, n2)

    fn = jax.jit(lambda *a: jax.vmap(one)(*a))
    if len(_TVG_EVAL_CACHE) > 32:
        _TVG_EVAL_CACHE.clear()
    _TVG_EVAL_CACHE[key_] = fn
    return fn


def _tvg_model_fn(kind: str, N: int, opt: TwoViewGeometryOptions, dtype,
                  trials: int):
    """Jitted device program running ONE model family's RANSAC
    (`trials` each) for a batch of pairs: vmap over (key, xy1 [N,2],
    xy2, mask [N], fxycxy1 [4], fxycxy2 [4]). Per-model programs let
    the adaptive escalation re-run ONLY the family that needs more
    trials — H's inlier ratio is inherently low on 3D scenes (4-point
    bound ~850 trials at 30% inliers), and a joint program would drag
    E and F to the 4096-trial round on every pair. The per-pair E
    threshold (max_error / mean focal, ref two_view_geometry.cc:
    262-265) rides the traced-threshold path of optim.ransac."""
    key_ = (kind, N, opt, dtype, trials)
    hit = _TVG_BATCH_CACHE.get(key_)
    if hit is not None:
        return hit
    from sba_tpu.optim.ransac import _ransac_impl

    ropt = RANSACOptions(
        max_error=opt.max_error, min_inlier_ratio=opt.min_inlier_ratio,
        confidence=opt.confidence, max_num_trials=opt.max_num_trials)

    def one(key, xy1, xy2, mask, c1, c2):
        if kind == "F":
            rep = _ransac_impl(key, (xy1, xy2), fundamental_7pt,
                               sampson_error_f, 7, ropt, mask,
                               _weighted_f_refit, False,
                               num_trials=trials)
        elif kind == "H":
            rep = _ransac_impl(key, (xy1, xy2), _h_solve,
                               homography_transfer_error, 4, ropt, mask,
                               None, False, num_trials=trials)
        else:  # E
            n1 = jnp.stack([(xy1[:, 0] - c1[2]) / c1[0],
                            (xy1[:, 1] - c1[3]) / c1[1]], axis=-1)
            n2 = jnp.stack([(xy2[:, 0] - c2[2]) / c2[0],
                            (xy2[:, 1] - c2[3]) / c2[1]], axis=-1)
            fmean = (c1[0] + c1[1] + c2[0] + c2[1]) / 4.0
            rep = _ransac_impl(key, (n1, n2), essential_5pt,
                               sampson_error_e, 5, ropt, mask,
                               _weighted_e_refit, False,
                               max_error=opt.max_error / fmean,
                               num_trials=trials)
            return (rep.model, rep.inlier_mask, rep.num_inliers, n1, n2)
        return rep.model, rep.inlier_mask, rep.num_inliers

    fn = jax.jit(lambda keys, xy1, xy2, masks, c1, c2:
                 jax.vmap(one)(keys, xy1, xy2, masks, c1, c2))
    if len(_TVG_BATCH_CACHE) > 64:
        _TVG_BATCH_CACHE.clear()
    _TVG_BATCH_CACHE[key_] = fn
    return fn


def _trials_needed(num_inliers, num_valid, sample_size, confidence):
    """Reference adaptive stopping criterion (ref: ransac.h:143-182)
    evaluated post-hoc: trials needed at the OBSERVED inlier ratio."""
    w = max(num_inliers / max(num_valid, 1), 1e-3) ** sample_size
    if w >= 1.0:
        return 1
    import math
    return math.log(max(1.0 - confidence, 1e-12)) \
        / math.log(1.0 - w + 1e-300)


def estimate_two_view_geometry_batch(
    xy1, xy2, masks,
    cams1_fxycxy, cams2_fxycxy,
    image_sizes1, image_sizes2,
    options: Optional[TwoViewGeometryOptions] = None,
    seed: int = 0,
    dtype=None,
):
    """Batched `estimate_two_view_geometry`: ONE device program runs the
    E/F/H RANSACs for Bp pairs (xy1/xy2 [Bp, N, 2], masks [Bp, N],
    cams*_fxycxy [Bp, 4]); one D2H read; then the per-pair
    configuration decision + pose recovery runs host-side via the same
    `_finalize` the per-pair path uses. Returns a list of
    TwoViewGeometryResult. Calibrated-path only (the CLI matchers always
    have camera intrinsics). `dtype`: accelerator callers pass
    jnp.float32 explicitly (f64 is software-emulated on TPU) even when
    the process runs x64 for the host-side mapper math."""
    opt = options or TwoViewGeometryOptions()
    masks_np = np.asarray(masks)
    Bp, N_full = masks_np.shape
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    keys = jax.random.split(jax.random.PRNGKey(seed), Bp)
    xy1_full = np.asarray(xy1)
    xy2_full = np.asarray(xy2)

    # Correspondence cap (see _TVG_RANSAC_CAP): evenly-strided subsample
    # of each pair's valid prefix for the RANSAC stage.
    if N_full > _TVG_RANSAC_CAP:
        cap = _TVG_RANSAC_CAP
        sub_idx = np.zeros((Bp, cap), np.int64)
        sub_mask = np.zeros((Bp, cap), bool)
        for i in range(Bp):
            m = int(masks_np[i].sum())
            k = min(m, cap)
            if k:
                sub_idx[i, :k] = (np.arange(k) * max(m, 1)) // max(k, 1)
                sub_mask[i, :k] = True
        r = np.arange(Bp)[:, None]
        xy1_r = xy1_full[r, sub_idx]
        xy2_r = xy2_full[r, sub_idx]
        masks_r = sub_mask
        N = cap
    else:
        xy1_r, xy2_r, masks_r, N = xy1_full, xy2_full, masks_np, N_full

    xy1j = jnp.asarray(xy1_r, dtype)
    xy2j = jnp.asarray(xy2_r, dtype)
    mj = jnp.asarray(masks_r)
    c1j = jnp.asarray(cams1_fxycxy, dtype)
    c2j = jnp.asarray(cams2_fxycxy, dtype)
    nvalid = masks_r.sum(axis=1)

    # Adaptive trial escalation — the batched equivalent of the
    # reference's adaptive termination (ref: ransac.h:143-182): run
    # everything at a small trial budget, then re-run ONLY the pairs
    # AND MODEL FAMILIES whose observed inlier ratios say more trials
    # are needed. Clean pairs (the common case) resolve in round 1 at
    # a fraction of the static worst-case budget.
    rounds = []
    t = 256
    while t < opt.max_num_trials:
        rounds.append(t)
        t *= 4
    rounds.append(opt.max_num_trials)

    kind_cfg = {"F": (7, 3), "H": (4, 1), "E": (5, 10)}
    res = {k: [None] * Bp for k in kind_cfg}
    for kind, (ssz, nmodels) in kind_cfg.items():
        active = np.arange(Bp)
        for trials in rounds:
            fn = _tvg_model_fn(kind, N, opt, dtype, trials)
            # Device sub-batching: the support matrix is
            # trials*models*N floats PER PAIR; cap launches inside HBM.
            sub = max(1, min(len(active),
                             int(2.5e9 / max(trials * nmodels * N * 4,
                                             1))))
            for s0 in range(0, len(active), sub):
                sel = active[s0:s0 + sub]
                if len(sel) < sub:  # pad tail to the compiled shape
                    sel = np.r_[sel, np.full(sub - len(sel), sel[-1])]
                with jax.enable_x64(dtype == jnp.float64):
                    o = fn(keys[sel], xy1j[sel], xy2j[sel], mj[sel],
                           c1j[sel], c2j[sel])
                o = [np.asarray(a) for a in o]
                for j, p in enumerate(sel):
                    if res[kind][p] is None or trials > res[kind][p][0]:
                        res[kind][p] = (trials, [a[j] for a in o])
            if trials >= opt.max_num_trials:
                break
            still = [p for p in active
                     if _trials_needed(int(res[kind][p][1][2]),
                                       int(nvalid[p]), ssz,
                                       opt.confidence) > trials]
            active = np.asarray(still, int)
            if len(active) == 0:
                break
    Fm, Fmask, nFs = [np.stack([res["F"][p][1][i] for p in range(Bp)])
                      for i in range(3)]
    Hm, Hmask, nHs = [np.stack([res["H"][p][1][i] for p in range(Bp)])
                      for i in range(3)]
    Em, Emask, nEs, n1s, n2s = [
        np.stack([res["E"][p][1][i] for p in range(Bp)])
        for i in range(5)]

    if N_full > _TVG_RANSAC_CAP:
        # Re-evaluate the winning models' inlier masks and counts over
        # ALL correspondences (one cheap batched pass) so the DB masks
        # and the configuration decision see every match.
        fe = _tvg_eval_fn(N_full, opt, dtype)
        with jax.enable_x64(dtype == jnp.float64):
            ev = fe(jnp.asarray(xy1_full, dtype),
                    jnp.asarray(xy2_full, dtype), jnp.asarray(masks_np),
                    c1j, c2j, jnp.asarray(Fm, dtype),
                    jnp.asarray(Hm, dtype), jnp.asarray(Em, dtype))
        (Fmask, nFs, Hmask, nHs, Emask, nEs, n1s, n2s) = \
            [np.asarray(a) for a in ev]

    xy1 = np.asarray(xy1)
    xy2 = np.asarray(xy2)
    results = []
    from sba_tpu.utils.host import on_host
    with on_host():  # pose recovery is tiny jnp math; keep it off the chip
        for i in range(Bp):
            n_true = int(np.asarray(masks[i]).sum())
            if n_true < opt.min_num_inliers:
                results.append(TwoViewGeometryResult(
                    int(TwoViewConfig.DEGENERATE), np.eye(3), np.eye(3),
                    np.eye(3), np.array([1.0, 0, 0, 0]), np.zeros(3),
                    np.zeros(N_full, bool), 0))
                continue
            results.append(_finalize(
                opt, True,
                (Em[i], Emask[i], int(nEs[i])),
                (Fm[i], Fmask[i], int(nFs[i])),
                (Hm[i], Hmask[i], int(nHs[i])),
                xy1[i], xy2[i], n1s[i], n2s[i],
                tuple(float(v) for v in cams1_fxycxy[i]),
                tuple(float(v) for v in cams2_fxycxy[i]),
                tuple(image_sizes1[i]), tuple(image_sizes2[i])))
    return results


def _is_watermark(xy1, xy2, inlier_mask, size1, size2,
                  opt: TwoViewGeometryOptions) -> bool:
    """Pure-translation border match test (ref: two_view_geometry.cc:514)."""
    idx = np.nonzero(inlier_mask)[0]
    if idx.size < opt.min_num_inliers:
        return False
    p1, p2 = xy1[idx], xy2[idx]
    d = p2 - p1
    med = np.median(d, axis=0)
    trans_ok = np.hypot(*(d - med).T) <= opt.max_error
    w1, h1 = size1
    w2, h2 = size2
    b1 = opt.watermark_border_size * min(w1, h1)
    b2 = opt.watermark_border_size * min(w2, h2)
    border1 = ((p1[:, 0] < b1) | (p1[:, 0] > w1 - b1)
               | (p1[:, 1] < b1) | (p1[:, 1] > h1 - b1))
    border2 = ((p2[:, 0] < b2) | (p2[:, 0] > w2 - b2)
               | (p2[:, 1] < b2) | (p2[:, 1] > h2 - b2))
    both = border1 & border2
    in_border = both & trans_ok
    if both.sum() == 0:
        return False
    ratio_all = in_border.sum() / idx.size
    ratio_border = in_border.sum() / max(both.sum(), 1)
    return (ratio_border >= opt.watermark_min_inlier_ratio
            and ratio_all >= opt.watermark_min_inlier_ratio * 0.5)
