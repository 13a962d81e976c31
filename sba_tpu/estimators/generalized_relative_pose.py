"""Generalized (rig-to-rig) relative pose: the GR6P capability.

Capability parity with ref: src/estimators/generalized_relative_pose.{h,cc}
(`GR6PEstimator`, Kneip & Li CVPR 2014 "Efficient Computation of Relative
Pose for Multi-Camera Systems"): given 2D-2D correspondences observed by
the cameras of two generalized-camera (rig) frames, estimate the rig1->rig2
transform. Minimal sample = 8 (6 DoF; 8 is the stable count the reference
uses, ref .h:76-77).

Design (not a transliteration): the reference carries OpenGV's ~300-line
expanded ComposeG polynomial tables. Here the same objective is built
directly from the generalized epipolar constraint in matrix form:

    a_i(R) . t + b_i(R) = 0,   a_i = (R f1_i) x f2_i,
    b_i = f2_i . (R m1_i) + m2_i . (R f1_i)

for Pluecker lines (f, m = c x f) in each rig frame. Stacking rows
[a_i | b_i] gives M(R) = [A b]^T [A b] in R^{4x4}; the Kneip cost is the
smallest eigenvalue of M, minimized over a Cayley rotation by the same
normalized-gradient backtracking descent with random restarts the
reference uses (ref .cc:485-570), with lambda_min from a closed-form
4x4 symmetric eigensolve (numpy) instead of the expanded quartic. The
translation is the homogeneous part of the smallest eigenvector.

This is a host-side f64 solver: rig-to-rig relative pose runs once per
rig frame pair in mapping — a scalar minimal solver inside RANSAC, not
a device hot path (the reference's is single-threaded C++ too).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np


def _cayley_to_rotmat(c):
    c0, c1, c2 = c
    s = 1.0 + c0 * c0 + c1 * c1 + c2 * c2
    R = np.array([
        [1 + c0 * c0 - c1 * c1 - c2 * c2, 2 * (c0 * c1 - c2),
         2 * (c0 * c2 + c1)],
        [2 * (c0 * c1 + c2), 1 - c0 * c0 + c1 * c1 - c2 * c2,
         2 * (c1 * c2 - c0)],
        [2 * (c0 * c2 - c1), 2 * (c1 * c2 + c0),
         1 - c0 * c0 - c1 * c1 + c2 * c2],
    ])
    return R / s


def _rotmat_to_cayley(R):
    C = (R - np.eye(3)) @ np.linalg.inv(R + np.eye(3))
    return np.array([-C[1, 2], C[0, 2], -C[0, 1]])


def compose_pluecker(cam_R, cam_t, xy):
    """Per-correspondence Pluecker lines in the RIG frame.

    cam_R [K,3,3], cam_t [K,3]: camera-from-rig extrinsics of the camera
    observing each correspondence; xy [K,2] normalized image points.
    Returns (f [K,3] unit bearings, m [K,3] moments = c x f)
    (ref: generalized_relative_pose.cc:71-80 ComposePlueckerData)."""
    xyh = np.concatenate([xy, np.ones((len(xy), 1))], axis=1)
    f = np.einsum("kji,kj->ki", cam_R, xyh)          # R^T x
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    c = -np.einsum("kji,kj->ki", cam_R, cam_t)       # camera center in rig
    m = np.cross(c, f)
    return f, m


def _build_M(R, f1, m1, f2, m2):
    """[A b]^T [A b]: the 4x4 generalized-epipolar normal matrix."""
    Rf1 = f1 @ R.T
    Rm1 = m1 @ R.T
    a = np.cross(Rf1, f2)                            # [K,3]
    b = np.sum(f2 * Rm1, axis=1) + np.sum(m2 * Rf1, axis=1)
    Ab = np.concatenate([a, b[:, None]], axis=1)     # [K,4]
    return Ab.T @ Ab


def _lambda_min(cayley, f1, m1, f2, m2, which=0):
    R = _cayley_to_rotmat(cayley)
    w = np.linalg.eigvalsh(_build_M(R, f1, m1, f2, m2))
    return w[which]


def _build_Ab(R, f1, m1, f2, m2):
    Rf1 = f1 @ R.T
    Rm1 = m1 @ R.T
    a = np.cross(Rf1, f2)
    b = np.sum(f2 * Rm1, axis=1) + np.sum(m2 * Rf1, axis=1)
    return np.concatenate([a, b[:, None]], axis=1)      # [K,4]


def _lambda_min_and_grad(cayley, f1, m1, f2, m2):
    """Exact gradient of the smallest eigenvalue:
    d lambda = 2 (Ab v) . (dAb v), v the unit eigenvector."""
    R = _cayley_to_rotmat(cayley)
    Ab = _build_Ab(R, f1, m1, f2, m2)
    w, V = np.linalg.eigh(Ab.T @ Ab)
    v = V[:, 0]
    r = Ab @ v                                          # [K]
    grad = np.zeros(3)
    eps = 1e-7
    for j in range(3):
        dR = (_cayley_to_rotmat(cayley + eps * np.eye(3)[j])
              - _cayley_to_rotmat(cayley - eps * np.eye(3)[j])) / (2 * eps)
        dRf1 = f1 @ dR.T
        da = np.cross(dRf1, f2)
        db = np.sum(f2 * (m1 @ dR.T), axis=1) + np.sum(m2 * dRf1, axis=1)
        dAb = np.concatenate([da, db[:, None]], axis=1)
        grad[j] = 2.0 * np.dot(r, dAb @ v)
    return w[0], grad


def _central_essential_init(f1, f2):
    """Rotation inits from the 8-point essential matrix on the bearing
    vectors, treating both rigs as central cameras (offsets ignored).
    Returns the two rotations of the E decomposition — good starting
    points whenever the rig baseline is small against scene depth."""
    # Linear system e^T (f2 f1^T) = 0 rows.
    A = np.einsum("ki,kj->kij", f2, f1).reshape(len(f1), 9)
    _, _, Vt = np.linalg.svd(A)
    E = Vt[-1].reshape(3, 3)
    U, _, Vt2 = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U[:, 2] *= -1
    if np.linalg.det(Vt2) < 0:
        Vt2[2] *= -1
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    return [U @ W @ Vt2, U @ W.T @ Vt2]


def _init_rotation(f1, f2):
    """Kabsch alignment of the bearing clouds (the reference's
    ComputeRotationBetweenPoints, ref .cc:116-153): rotation taking
    frame-1 bearings onto frame-2 bearings."""
    g1 = f1 - f1.mean(axis=0)
    g2 = f2 - f2.mean(axis=0)
    H = g2.T @ g1
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U @ Vt))
    R = U @ np.diag([1.0, 1.0, d]) @ Vt
    return R


def gr6p_solve(cam_R1, cam_t1, xy1, cam_R2, cam_t2, xy2, seed=0,
               max_iterations=50, fast=False):
    """Solve the GR6P problem for >= 6 (use 8) correspondences.

    cam_R*/cam_t*: camera-from-rig extrinsics per correspondence in each
    rig frame; xy*: normalized points. Returns a list of candidate
    (R, t) rig1->rig2 transforms (up to 4, one per eigenvector, matching
    the reference's 4-model output, ref .cc:577-585)."""
    f1, m1 = compose_pluecker(cam_R1, cam_t1, xy1)
    f2, m2 = compose_pluecker(cam_R2, cam_t2, xy2)
    rng = np.random.default_rng(seed)
    init = _rotmat_to_cayley(_init_rotation(f1, f2))

    # Minimize lambda_min over the Cayley rotation with the EXACT
    # eigenvalue gradient (the reference descends a normalized
    # forward-difference gradient with a hand-rolled step schedule,
    # ref .cc:485-570). The landscape carries shallow local minima near
    # the Kabsch init, so ALWAYS multi-start — Kabsch, a central-camera
    # essential-matrix init (rig offsets ignored; a good rotation guess
    # whenever the rig baseline is small against scene depth), and
    # random perturbations — and keep the lowest eigenvalue. This
    # subsumes the reference's near-identity restart policy.
    from scipy.optimize import minimize

    starts = [init]
    try:
        E_init = _central_essential_init(f1, f2)
        starts.extend(_rotmat_to_cayley(Rc) for Rc in E_init)
    except np.linalg.LinAlgError:
        pass
    # `fast` (RANSAC inner trials): 2 starts (Kabsch + best essential),
    # fewer L-BFGS iterations, looser early exit — contaminated samples
    # are not worth polishing, and the LO refit re-solves on all
    # inliers with the full start set. ~6x cheaper per trial.
    if fast:
        starts = starts[:2]
        max_iterations = min(max_iterations, 25)
    else:
        for trial in range(3):
            amp = 0.3 if trial < 2 else 0.6
            starts.append(init + rng.uniform(-amp, amp, 3))

    exit_cost = 1e-11 if fast else 1e-14
    best = init
    best_cost = np.inf
    for cay0 in starts:
        res = minimize(
            lambda c: _lambda_min_and_grad(c, f1, m1, f2, m2),
            cay0, jac=True, method="L-BFGS-B",
            options={"maxiter": max_iterations, "gtol": 1e-16,
                     "ftol": 1e-18})
        if res.fun < best_cost:
            best, best_cost = res.x, res.fun
        if best_cost < exit_cost:
            break

    R = _cayley_to_rotmat(best)
    M = _build_M(R, f1, m1, f2, m2)
    _, V = np.linalg.eigh(M)
    models = []
    for i in range(4):
        v = V[:, i]
        if abs(v[3]) < 1e-12:
            continue
        t = v[:3] / v[3]
        models.append((R, t))
    return models


def generalized_sampson_errors(R, t, cam_R1, cam_t1, xy1, cam_R2, cam_t2,
                               xy2):
    """Squared Sampson error through each correspondence's camera pair
    (ref: generalized_relative_pose.cc:588-617 Residuals): compose the
    per-correspondence relative camera pose cam1 -> cam2 through the rig
    transform, build E, evaluate Sampson."""
    # cam2-from-cam1 = cam2-from-rig2 . rig2-from-rig1 . rig1-from-cam1
    R12 = np.einsum("kij,jl,kml->kim", cam_R2, R, cam_R1)
    t12 = (cam_t2 + np.einsum("kij,j->ki", cam_R2, t)
           - np.einsum("kij,kj->ki", R12, cam_t1))
    # E[k] = [t12_k]x R12_k
    tx = np.zeros_like(R12)
    tx[:, 0, 1] = -t12[:, 2]
    tx[:, 0, 2] = t12[:, 1]
    tx[:, 1, 0] = t12[:, 2]
    tx[:, 1, 2] = -t12[:, 0]
    tx[:, 2, 0] = -t12[:, 1]
    tx[:, 2, 1] = t12[:, 0]
    E = np.einsum("kij,kjl->kil", tx, R12)
    h1 = np.concatenate([xy1, np.ones((len(xy1), 1))], axis=1)
    h2 = np.concatenate([xy2, np.ones((len(xy2), 1))], axis=1)
    Ex1 = np.einsum("kij,kj->ki", E, h1)
    Etx2 = np.einsum("kji,kj->ki", E, h2)
    num = np.sum(h2 * Ex1, axis=1)
    den = (Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
           + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2)
    return num * num / np.maximum(den, 1e-18)


@dataclass(frozen=True)
class GeneralizedRelativePoseOptions:
    max_error: float = 0.01          # Sampson, normalized coords
    min_inlier_ratio: float = 0.2
    confidence: float = 0.999
    max_num_trials: int = 100
    min_num_inliers: int = 10


class GeneralizedRelativePoseReport(NamedTuple):
    R: np.ndarray                    # [3,3] rig1->rig2
    t: np.ndarray                    # [3]
    inlier_mask: np.ndarray          # [K] bool
    num_inliers: int
    success: bool


def estimate_generalized_relative_pose(
        cam_R1, cam_t1, xy1, cam_R2, cam_t2, xy2,
        options: Optional[GeneralizedRelativePoseOptions] = None,
        seed: int = 0) -> GeneralizedRelativePoseReport:
    """RANSAC GR6P over rig-to-rig correspondences (host-side; see
    module docstring). Inputs are per-correspondence camera extrinsics
    (camera-from-rig) and normalized image points in both rig frames."""
    opt = options or GeneralizedRelativePoseOptions()
    K = len(xy1)
    rng = np.random.default_rng(seed)
    best = GeneralizedRelativePoseReport(
        np.eye(3), np.zeros(3), np.zeros(K, bool), 0, False)
    if K < 8:
        return best
    thr = opt.max_error
    max_trials = opt.max_num_trials
    trial = 0
    while trial < max_trials:
        trial += 1
        idx = rng.choice(K, size=8, replace=False)
        try:
            models = gr6p_solve(cam_R1[idx], cam_t1[idx], xy1[idx],
                                cam_R2[idx], cam_t2[idx], xy2[idx],
                                seed=int(rng.integers(2**31)), fast=True)
        except np.linalg.LinAlgError:
            continue
        for R, t in models:
            err = generalized_sampson_errors(
                R, t, cam_R1, cam_t1, xy1, cam_R2, cam_t2, xy2)
            inl = err < thr * thr
            n = int(inl.sum())
            if n > best.num_inliers:
                best = GeneralizedRelativePoseReport(R, t, inl, n, True)
                # adaptive trial count (standard RANSAC bound)
                ratio = max(n / K, opt.min_inlier_ratio)
                denom = np.log(max(1.0 - ratio ** 8, 1e-12))
                if denom < 0:
                    need = int(np.ceil(np.log(max(1.0 - opt.confidence,
                                                  1e-12)) / denom))
                    max_trials = min(max_trials, max(trial, need))
        # High-support early exit: past 85% support further sampling
        # is vanishingly unlikely to find a better model and the LO
        # refit polishes on all inliers anyway (the 8-point adaptive
        # bound above stays ~100 trials even at 70% inliers — the
        # nonlinear per-trial solve makes that a minute of wall time).
        if best.num_inliers >= 0.85 * K:
            break
    if best.num_inliers >= opt.min_num_inliers:
        # Local optimization: re-solve on ALL inliers (the solver
        # accepts arbitrary K >= 8) and keep if support improves —
        # the LO-RANSAC inner refinement of ref optim/loransac.h:54.
        keep = np.nonzero(best.inlier_mask)[0]
        try:
            models = gr6p_solve(cam_R1[keep], cam_t1[keep], xy1[keep],
                                cam_R2[keep], cam_t2[keep], xy2[keep],
                                seed=seed + 1)
            for R, t in models:
                err = generalized_sampson_errors(
                    R, t, cam_R1, cam_t1, xy1, cam_R2, cam_t2, xy2)
                inl = err < thr * thr
                if int(inl.sum()) >= best.num_inliers:
                    best = GeneralizedRelativePoseReport(
                        R, t, inl, int(inl.sum()), True)
        except np.linalg.LinAlgError:
            pass
    else:
        best = best._replace(success=False)
    return best
