"""Fused Pallas BA kernel tests (interpret mode on CPU).

Parity of ops/ba_kernels.py + optim/ba_fused.py against the XLA
reference path in optim/ba.py — cost, full linearize+reduce outputs,
one LM step, and end-to-end convergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.optim import ba_fused as bf
from sba_tpu.optim.ba import (
    BAOptions,
    _linearize,
    _solve_step_explicit_pm,
    _sym3_inverse,
    evaluate_cost,
    to_point_major,
)
from sba_tpu.ops import ba_kernels as bk
from sba_tpu.utils.synthetic import make_ba_problem


# Small nonzero distortion per model so the analytic kernel heads are
# exercised off the pinhole special case (params: see camera_models.py).
_DISTORT = {
    2: {3: 0.02},
    3: {3: 0.02, 4: -0.005},
    4: {4: 0.02, 5: -0.005, 6: 1e-3, 7: -2e-3},
    5: {4: 0.02, 5: -0.005, 6: 1e-3, 7: -2e-3},
    6: {4: 0.02, 5: -0.005, 6: 1e-3, 7: -2e-3, 8: 1e-3,
        9: 0.01, 10: -2e-3, 11: 5e-4},
    7: {4: 0.08},
    8: {3: 0.02},
    9: {3: 0.02, 4: -0.005},
    10: {4: 0.02, 5: -0.005, 6: 1e-3, 7: -2e-3, 8: 1e-3, 9: -5e-4,
         10: 8e-4, 11: -6e-4},
}


def _setup(model_id=0, **kw):
    problem, truth = make_ba_problem(
        num_images=6, num_points=150, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=0,
        dtype=jnp.float32, model_id=model_id, **kw)
    cam = np.array(problem.cam_params)
    for i, val in _DISTORT.get(model_id, {}).items():
        cam[:, i] = val
    problem = problem._replace(cam_params=jnp.asarray(cam, jnp.float32))
    # schur_bf16=False + tight CG: these are exact-parity tests of the
    # f32 math (the bf16 default is covered by test_fused_converges_bf16;
    # the production cg_tolerance=1e-2 inexact-Newton default is covered
    # by the convergence tests).
    opt = BAOptions(model_id=model_id, dtype="float32", schur_bf16=False,
                    cg_iterations=200, cg_tolerance=1e-9,
                    solver="explicit_schur", obs_layout="point_major")
    pm = to_point_major(problem)
    lay = bk.plan_layout(pm, opt)
    static = bk.build_static(pm, opt, lay)
    par = bk.pack_params(pm.qvecs.astype(jnp.float32),
                         pm.tvecs.astype(jnp.float32),
                         pm.cam_params.astype(jnp.float32),
                         static.image_cam, lay)
    pts = bk.pack_points(pm.points.astype(jnp.float32), lay)
    return problem, truth, pm, opt, lay, static, par, pts


@pytest.mark.parametrize("model_id", list(range(11)))
def test_fused_cost_matches_xla(model_id):
    _, _, pm, opt, lay, static, par, pts = _setup(model_id)
    c_k = bk.fused_cost(static, par, pts, lay, opt, interpret=True)
    c_x = evaluate_cost(pm, opt)
    np.testing.assert_allclose(float(c_k), float(c_x), rtol=1e-4)


def test_fused_payloads_match_xla():
    _, _, pm, opt, lay, static, par, pts = _setup()
    lam = jnp.float32(1e-3)
    s_corr, img_red, ey, pt_pay, jw = bk.fused_schur(
        static, par, pts, lam, lay, opt, interpret=True)

    r, Jq, Jt, Jx, Jk = _linearize(pm, opt)
    N = pm.qvecs.shape[0]
    P = pm.points.shape[0]
    O = r.shape[0]
    K = O // P
    Jc = jnp.concatenate([Jq, Jt], axis=-1)
    pt_reduce = lambda v: jnp.sum(v.reshape((P, K) + v.shape[1:]), axis=1)
    g_pts = pt_reduce(jnp.einsum("oki,ok->oi", Jx, r))
    Hpp = pt_reduce(jnp.einsum("oki,okj->oij", Jx, Jx))
    scale = float(jnp.abs(g_pts).max())
    np.testing.assert_allclose(np.asarray(pt_pay[:3, :P].T),
                               np.asarray(g_pts), atol=1e-5 * scale)
    onehot = (pm.obs_image[:, None]
              == jnp.arange(N, dtype=pm.obs_image.dtype)).astype(r.dtype)
    g_pose = jnp.einsum("on,od->nd", onehot,
                        jnp.einsum("oki,ok->oi", Jc, r))
    np.testing.assert_allclose(
        np.asarray(img_red[:N, :6]), np.asarray(g_pose),
        atol=1e-5 * float(jnp.abs(g_pose).max()))

    # Schur correction EL EL^T (pose block; kernel rows are i*Npad+n).
    d_pts_l = lam * jnp.clip(jnp.einsum("pii->pi", Hpp), 1e-6, 1e32)
    Hppd = Hpp + jax.vmap(jnp.diag)(d_pts_l) \
        + 1e-12 * jnp.eye(3, dtype=r.dtype)
    Lp = jnp.linalg.cholesky(_sym3_inverse(Hppd)
                             + 1e-14 * jnp.eye(3, dtype=r.dtype))
    W_pose = jnp.einsum("oki,okj->oij", Jc, Jx)
    WL = jnp.einsum("oij,ojk->oik", W_pose, Lp[pm.obs_point])
    EL = jnp.einsum("pkn,pkij->nipj", onehot.reshape(P, K, N),
                    WL.reshape(P, K, 6, 3)).reshape(6 * N, 3 * P)
    corr = np.asarray(EL @ EL.T)
    rows_k = (np.arange(N)[:, None]
              + np.arange(6)[None, :] * lay.Npad).reshape(-1)
    k_pp = np.asarray(s_corr)[np.ix_(rows_k, rows_k)]
    np.testing.assert_allclose(k_pp, corr, atol=3e-5 * np.abs(corr).max())

    # RHS coupling Ey.
    Ltg = jnp.einsum("pji,pj->pi", Lp, g_pts).reshape(-1)
    Ey = np.asarray(EL @ Ltg)
    np.testing.assert_allclose(np.asarray(ey[0])[rows_k], Ey,
                               atol=3e-5 * np.abs(Ey).max())


@pytest.mark.parametrize("model_id", [0, 3, 4, 5, 6, 7, 9, 10])
def test_fused_step_matches_xla(model_id):
    _, _, pm, opt, lay, static, par, pts = _setup(model_id)
    lam = jnp.float32(1e-3)
    u_pose_x, u_cam_x, dpts_x, pred_x, ginf_x = \
        _solve_step_explicit_pm(pm, opt, lam)

    ctx = bf.prepare(pm, opt)
    (statics, lays, pts0, idxs, prob_f, options, free_arrays) = ctx
    u_pose_k, u_cam_k, dp_list_k, pred_k, ginf_k = bf._fused_step(
        statics, lays, options, prob_f.qvecs, prob_f.tvecs, pts0,
        prob_f.cam_params, lam, free_arrays, interpret=True)
    scale = float(jnp.abs(u_pose_x).max())
    np.testing.assert_allclose(np.asarray(u_pose_k), np.asarray(u_pose_x),
                               atol=2e-3 * scale)
    P = pm.points.shape[0]
    dp_full = np.zeros((P, 3), np.float32)
    for dp_b, idx in zip(dp_list_k, idxs):
        dp_full[idx] = np.asarray(dp_b)[:, :len(idx)].T
    np.testing.assert_allclose(dp_full, np.asarray(dpts_x),
                               atol=2e-3 * float(jnp.abs(dpts_x).max()))
    np.testing.assert_allclose(float(pred_k), float(pred_x), rtol=1e-3)
    np.testing.assert_allclose(float(ginf_k), float(ginf_x), rtol=1e-4)


def test_fused_lm_converges():
    problem, truth, *_ = _setup()
    opt = BAOptions(model_id=0, max_iterations=25, dtype="float32")
    out, summary = bf.bundle_adjust_fused(problem, opt, interpret=True)
    assert float(summary.final_cost) < 1e-4 * float(summary.initial_cost)
    dq = min(np.abs(np.asarray(out.qvecs) - truth["qvecs"]).max(),
             np.abs(np.asarray(out.qvecs) + truth["qvecs"]).max())
    assert dq < 1e-2


def test_fused_lm_converges_beyond_128_images():
    """N > 128 exercises the Npad=256 layout (Dk 1664); the fused path
    accepts up to 256 images (S stays under the scoped-VMEM limit)."""
    problem, truth = make_ba_problem(
        num_images=140, num_points=250, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=3,
        dtype=jnp.float32)
    opt = BAOptions(model_id=0, max_iterations=15, dtype="float32")
    out, summary = bf.bundle_adjust_fused(problem, opt, interpret=True)
    assert float(summary.final_cost) < 1e-3 * float(summary.initial_cost)


def test_fused_converges_bf16():
    """bf16 Schur-correction products (the TPU default) must reach the
    same optimum as the all-f32 path — S_corr only steers the step."""
    problem, truth, *_ = _setup()
    opt16 = BAOptions(model_id=0, max_iterations=25, dtype="float32",
                      schur_bf16=True)
    opt32 = BAOptions(model_id=0, max_iterations=25, dtype="float32",
                      schur_bf16=False)
    out16, s16 = bf.bundle_adjust_fused(problem, opt16, interpret=True)
    out32, s32 = bf.bundle_adjust_fused(problem, opt32, interpret=True)
    assert float(s16.final_cost) < 1e-4 * float(s16.initial_cost)
    np.testing.assert_allclose(np.asarray(out16.tvecs),
                               np.asarray(out32.tvecs), atol=5e-3)


def test_fused_respects_gauge_masks():
    problem, _, pm, opt, lay, static, par, pts = _setup()
    opt = BAOptions(model_id=0, max_iterations=5, dtype="float32")
    out, _ = bf.bundle_adjust_fused(problem, opt, interpret=True)
    # Row 0 pose is constant in make_ba_problem's gauge.
    if float(problem.free_rot[0]) == 0.0:
        np.testing.assert_allclose(np.asarray(out.qvecs[0]),
                                   np.asarray(problem.qvecs[0]), atol=0)
        np.testing.assert_allclose(np.asarray(out.tvecs[0]),
                                   np.asarray(problem.tvecs[0]), atol=0)


@pytest.mark.parametrize("model_id", [0, 3, 4])
def test_implicit_step_matches_dense(model_id):
    """The large-N implicit path (fused matvec PCG, no materialized S)
    must produce the same LM step as the dense-S path at small N."""
    _, _, pm, _, _, _, _, _ = _setup(model_id)
    lam = jnp.float32(1e-3)
    outs = {}
    for mode in ("dense", "implicit"):
        opt = BAOptions(model_id=model_id, dtype="float32",
                        schur_bf16=False, matvec_bf16=False,
                        fused_mode=mode,
                        cg_iterations=200, cg_tolerance=1e-9,
                        solver="explicit_schur", obs_layout="point_major")
        ctx = bf.prepare(pm, opt)
        (statics, lays, pts0, idxs, prob_f, options, free_arrays) = ctx
        outs[mode] = bf._fused_step(
            statics, lays, options, prob_f.qvecs, prob_f.tvecs, pts0,
            prob_f.cam_params, lam, free_arrays, interpret=True)
    u_d, c_d, dp_d, pred_d, ginf_d = outs["dense"]
    u_i, c_i, dp_i, pred_i, ginf_i = outs["implicit"]
    scale = float(jnp.abs(u_d).max())
    np.testing.assert_allclose(np.asarray(u_i), np.asarray(u_d),
                               atol=1e-3 * scale)
    np.testing.assert_allclose(float(pred_i), float(pred_d), rtol=1e-3)
    np.testing.assert_allclose(float(ginf_i), float(ginf_d), rtol=1e-4)
    for a, b in zip(dp_i, dp_d):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-3 * max(float(jnp.abs(b).max()), 1e-12))


def test_implicit_lm_converges_beyond_256_images():
    """N > 256 exceeds the dense-S VMEM bound; fused_mode=auto must
    route to the implicit path and still converge."""
    problem, truth = make_ba_problem(
        num_images=300, num_points=400, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=5,
        dtype=jnp.float32)
    opt = BAOptions(model_id=0, max_iterations=15, dtype="float32")
    ctx = bf.prepare(problem, opt)
    lays = ctx[1]
    assert bf.use_implicit(lays[0], opt)
    out, summary = bf.solve_prepared(ctx, interpret=True)
    assert float(summary.final_cost) < 1e-3 * float(summary.initial_cost)


@pytest.mark.parametrize("model_id", [0, 4])
def test_ranged_step_matches_onehot(model_id):
    """The ranged kernels (per-block image-sub-block loops, the large-N
    path) must produce the same LM step as the [Npad, B] one-hot
    kernels, forced on at small N."""
    _, _, pm, _, _, _, _, _ = _setup(model_id)
    lam = jnp.float32(1e-3)
    outs = {}
    for ranged in ("on", "off"):
        # matvec_bf16=False: this test isolates the RANGED INDEXING
        # equivalence; the bf16-coupling delta (ranged-only) is covered
        # by test_implicit_bf16_couplings_close_and_converges.
        opt = BAOptions(model_id=model_id, dtype="float32",
                        schur_bf16=False, matvec_bf16=False,
                        fused_mode="implicit",
                        fused_ranged=ranged,
                        cg_iterations=200, cg_tolerance=1e-9,
                        solver="explicit_schur", obs_layout="point_major")
        ctx = bf.prepare(pm, opt)
        (statics, lays, pts0, idxs, prob_f, options, free_arrays) = ctx
        assert lays[0].ranged == (ranged == "on")
        outs[ranged] = bf._fused_step(
            statics, lays, options, prob_f.qvecs, prob_f.tvecs, pts0,
            prob_f.cam_params, lam, free_arrays, interpret=True)
    u_r, c_r, dp_r, pred_r, ginf_r = outs["on"]
    u_o, c_o, dp_o, pred_o, ginf_o = outs["off"]
    scale = float(jnp.abs(u_o).max())
    np.testing.assert_allclose(np.asarray(u_r), np.asarray(u_o),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(float(pred_r), float(pred_o), rtol=1e-5)
    np.testing.assert_allclose(float(ginf_r), float(ginf_o), rtol=1e-5)
    for a, b in zip(dp_r, dp_o):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-5 * max(float(jnp.abs(b).max()), 1e-12))


def test_ranged_lm_converges_sequential_scene():
    """End-to-end ranged LM on a sequential-capture scene (contiguous
    per-point image windows — the locality the ranged path exploits)."""
    from sba_tpu.utils.synthetic import make_sequential_ba_problem

    problem, truth = make_sequential_ba_problem(
        num_images=40, num_points=500, track_len=5, pose_noise=0.005,
        point_noise=0.03, pixel_noise=0.0, seed=3)
    opt = BAOptions(model_id=0, max_iterations=15, dtype="float32",
                    fused_ranged="on")
    ctx = bf.prepare(problem, opt)
    lays = ctx[1]
    assert lays[0].ranged and bf.use_implicit(lays[0], opt)
    # Locality sort: per-block image ranges must be narrow, not [0, N).
    rng = np.asarray(ctx[0][0].blk_rng)
    widths = rng[:, 1] - rng[:, 0]
    assert widths.max() <= 1 + (40 // lays[0].IB + 1)
    out, summary = bf.solve_prepared(ctx, interpret=True)
    assert float(summary.final_cost) < 1e-2 * float(summary.initial_cost)


def _two_camera_problem(seed=9):
    """C=2: odd images use a second camera with different intrinsics —
    exercises the cam-block indexing (ci_np rows, obs_cam one-hots,
    per-camera segment reductions) that single-camera problems never
    touch."""
    problem, truth = make_ba_problem(
        num_images=6, num_points=120, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=seed,
        dtype=jnp.float32)
    cam2 = np.tile(np.asarray(problem.cam_params), (2, 1))
    cam2[1, 0] = 520.0                     # camera 1 starts off-truth
    image_cam = np.arange(problem.qvecs.shape[0], dtype=np.int32) % 2
    obs_cam = image_cam[np.asarray(problem.obs_image)]
    free_cam = np.ones((2, problem.free_cam.shape[1]), np.float32)
    return problem._replace(
        cam_params=jnp.asarray(cam2, jnp.float32),
        obs_cam=jnp.asarray(obs_cam),
        image_cam=jnp.asarray(image_cam),
        free_cam=jnp.asarray(free_cam, jnp.float32)), truth


@pytest.mark.parametrize("mode", ["dense", "implicit"])
def test_fused_step_two_cameras_matches_xla(mode):
    problem, _ = _two_camera_problem()
    opt = BAOptions(model_id=0, dtype="float32", schur_bf16=False,
                    matvec_bf16=False,
                    fused_mode=mode, cg_iterations=200, cg_tolerance=1e-9,
                    solver="explicit_schur", obs_layout="point_major")
    pm = to_point_major(problem)
    lam = jnp.float32(1e-3)
    u_pose_x, u_cam_x, dpts_x, pred_x, ginf_x = \
        _solve_step_explicit_pm(pm, opt, lam)

    ctx = bf.prepare(pm, opt)
    (statics, lays, pts0, idxs, prob_f, options, free_arrays) = ctx
    u_pose_k, u_cam_k, dp_list_k, pred_k, ginf_k = bf._fused_step(
        statics, lays, options, prob_f.qvecs, prob_f.tvecs, pts0,
        prob_f.cam_params, lam, free_arrays, interpret=True)
    scale = float(jnp.abs(u_pose_x).max())
    np.testing.assert_allclose(np.asarray(u_pose_k), np.asarray(u_pose_x),
                               atol=2e-3 * scale)
    cscale = max(float(jnp.abs(u_cam_x).max()), 1e-12)
    np.testing.assert_allclose(np.asarray(u_cam_k)[:, :3],
                               np.asarray(u_cam_x)[:, :3],
                               atol=2e-3 * cscale)
    np.testing.assert_allclose(float(pred_k), float(pred_x), rtol=1e-3)


def test_fused_lm_two_cameras_converges():
    problem, _ = _two_camera_problem(seed=10)
    opt = BAOptions(model_id=0, max_iterations=30, dtype="float32")
    out, summary = bf.bundle_adjust_fused(problem, opt, interpret=True)
    assert float(summary.final_cost) < 1e-3 * float(summary.initial_cost)
    # camera 1 started at f=520 but was generated with f=500: the free
    # focal must be pulled back toward truth, independently of camera 0.
    assert abs(float(out.cam_params[1, 0]) - 500.0) < 2.0
    assert abs(float(out.cam_params[0, 0]) - 500.0) < 2.0


@pytest.mark.parametrize("model_id", list(range(11)))
def test_kernel_head_jacobians_match_finite_differences(model_id):
    """SURVEY §4(b): independent numeric check of the hand-derived
    analytic heads — central differences of the projection itself, not
    autodiff (the XLA reference path uses jacfwd, so the step-parity
    tests alone would not catch a derivation error mirrored there)."""
    from sba_tpu.geometry import camera_models as cm

    spec = cm.model_by_id(model_id)
    nparams = spec.num_params
    rng = np.random.default_rng(model_id)
    B = 64
    u = jnp.asarray(rng.uniform(-0.3, 0.3, (1, B)), jnp.float64)
    v = jnp.asarray(rng.uniform(-0.3, 0.3, (1, B)), jnp.float64)
    kvals = np.zeros((nparams, 1, B))
    kvals[0] = 500.0
    if model_id in (1, 4, 5, 6, 7, 10):   # fx, fy models
        kvals[1] = 480.0
        kvals[2] = 320.0
        kvals[3] = 240.0
    else:
        kvals[1] = 320.0
        kvals[2] = 240.0
    for i, val in _DISTORT.get(model_id, {}).items():
        kvals[i] = val
    k = [jnp.asarray(kvals[i], jnp.float64) for i in range(nparams)]

    px, py, A2, dk = bk._head(model_id, k, u, v)
    eps = 1e-6

    def proj(uu, vv, kk):
        pxx, pyy, _, _ = bk._head(model_id, kk, uu, vv)
        return pxx, pyy

    # dA/d(u,v) central differences
    for var, (a_x, a_y) in (("u", (A2[0][0], A2[1][0])),
                            ("v", (A2[0][1], A2[1][1]))):
        du = eps if var == "u" else 0.0
        dv = eps if var == "v" else 0.0
        px_p, py_p = proj(u + du, v + dv, k)
        px_m, py_m = proj(u - du, v - dv, k)
        np.testing.assert_allclose(np.asarray(a_x),
                                   np.asarray((px_p - px_m) / (2 * eps)),
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a_y),
                                   np.asarray((py_p - py_m) / (2 * eps)),
                                   rtol=2e-3, atol=1e-4)

    # dk central differences (relative step for the big focal params)
    for m in range(nparams):
        h = eps * max(1.0, abs(float(kvals[m, 0, 0])))
        kp = [k[i] + (h if i == m else 0.0) for i in range(nparams)]
        km = [k[i] - (h if i == m else 0.0) for i in range(nparams)]
        px_p, py_p = proj(u, v, kp)
        px_m, py_m = proj(u, v, km)
        np.testing.assert_allclose(np.asarray(dk[m][0]),
                                   np.asarray((px_p - px_m) / (2 * h)),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"model {model_id} dk[{m}] x")
        np.testing.assert_allclose(np.asarray(dk[m][1]),
                                   np.asarray((py_p - py_m) / (2 * h)),
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"model {model_id} dk[{m}] y")


def test_implicit_bf16_couplings_close_and_converges():
    """matvec_bf16 (active in the ranged large-N regime): the PCG
    operator uses bf16 whitened couplings — step close to the f32
    implicit step, and full LM still converges (the f32 trial cost gates
    every step). Forces fused_ranged="on" since bf16 only applies
    there (see ops/ba_kernels.py fused_reduce)."""
    _, _, pm, _, _, _, _, _ = _setup(0)
    lam = jnp.float32(1e-3)
    outs = {}
    for bf16 in (False, True):
        opt = BAOptions(model_id=0, dtype="float32",
                        schur_bf16=False, matvec_bf16=bf16,
                        fused_mode="implicit", fused_ranged="on",
                        cg_iterations=200, cg_tolerance=1e-9,
                        solver="explicit_schur", obs_layout="point_major")
        ctx = bf.prepare(pm, opt)
        (statics, lays, pts0, idxs, prob_f, options, free_arrays) = ctx
        outs[bf16] = bf._fused_step(
            statics, lays, options, prob_f.qvecs, prob_f.tvecs, pts0,
            prob_f.cam_params, lam, free_arrays, interpret=True)
    u_32 = np.asarray(outs[False][0]).reshape(-1)
    u_16 = np.asarray(outs[True][0]).reshape(-1)
    # bf16 (~3 decimal digits) through an ill-conditioned PCG solve moves
    # individual small elements at the % level; what must survive is the
    # step DIRECTION (inexact Newton: any descent-aligned step the f32
    # trial cost accepts is valid).
    cos = float(u_16 @ u_32 / (np.linalg.norm(u_16)
                               * np.linalg.norm(u_32) + 1e-30))
    assert cos > 0.99, f"bf16 step direction diverged: cos={cos:.4f}"
    # Norm deviation scales with the reduced system's conditioning; this
    # tiny 6-image fixture is near the worst case (~0.19 measured). The
    # binding guarantees are direction (above) + the full-solve
    # convergence below.
    rel = float(np.linalg.norm(u_16 - u_32) / np.linalg.norm(u_32))
    assert rel < 0.3, f"bf16 step norm deviation {rel:.3f}"

    problem, _ = make_ba_problem(
        num_images=20, num_points=200, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=7,
        dtype=jnp.float32)
    opt = BAOptions(model_id=0, max_iterations=25, dtype="float32",
                    fused_mode="implicit", fused_ranged="on")
    out, summary = bf.bundle_adjust_fused(problem, opt, interpret=True)
    assert float(summary.final_cost) < 1e-4 * float(summary.initial_cost)


@pytest.mark.parametrize("mode", ["dense", "implicit"])
def test_cg_warm_start_converges(mode):
    """Warm-started PCG (optimally rescaled previous-step seed,
    optim/ba_fused.py::_pcg_2block) must reach the cold-start basin on
    both reduced-solve paths — including surviving the NaN steps the
    trust region emits (and rejects) at over-small damping, which the
    seed's finite-s guard must not carry into later iterations."""
    problem, _ = make_ba_problem(
        num_images=24, num_points=300, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=5,
        dtype=jnp.float32)
    finals = {}
    for ws in (False, True):
        opt = BAOptions(model_id=0, max_iterations=20, dtype="float32",
                        fused_mode=mode, cg_warm_start=ws)
        out, summary = bf.bundle_adjust_fused(problem, opt,
                                              interpret=True)
        finals[ws] = float(summary.final_cost)
        assert finals[ws] < 1e-3 * float(summary.initial_cost)
    # Same basin: warm start changes the CG iteration path, not the
    # fixed point the trust region converges to.
    assert finals[True] < 2.0 * finals[False] + 1e-6
