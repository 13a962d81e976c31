"""Fused-kernel bundle adjustment: the single-chip fast path.

Drives the Pallas kernels in ops/ba_kernels.py inside the same
Levenberg-Marquardt trust-region loop as optim/ba.py (Madsen-Nielsen
damping, accept/reject on actual-vs-predicted reduction — the
trust-region semantics of Ceres LM used by the reference,
ref: src/optim/bundle_adjustment.cc:258 Solve).

Per LM iteration:
  kernel 1 (fused linearize+reduce)  -> per-image/point payloads,
      Schur correction S_corr = EL EL^T, RHS coupling Ey, stored blocks
  XLA epilogue (tiny): assemble the reduced system S, damping, gauge
      masks, solve for du (dense Cholesky or Jacobi-PCG)
  kernel 2 (back-substitution)       -> point step dp + predicted sums
  kernel 3 (cost)                    -> trial cost for accept/reject

f32 only; dispatched from optim.ba.bundle_adjust when the problem fits
(supported camera model, <=256 images, single device, f32). The SPMD
multi-chip variant (point blocks sharded over a mesh, psum on the
reduced system) lives in parallel/ba_fused_spmd.py and reuses
`_fused_lm_loop_impl` via its `axis_name` parameter.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import quat_retract
from sba_tpu.ops import ba_kernels as bk
from sba_tpu.optim.ba import BAOptions, BAProblem, BASummary, to_point_major

MAXP = 12


DENSE_MAX_IMAGES = 128   # auto-policy crossover, NOT a capability cap:
# the dense kernel works to N=256 (S [Dk,Dk] VMEM-resident, 11 MB), but
# with the slim jcorr matvec store the implicit PCG path overtakes it
# above 128 images (v5e, 2026-08-21: N=128 dense 460 vs implicit 368
# it/s; N=256 dense 210 vs implicit 413; N=512 implicit 276).
# fused_mode="dense" still forces the dense kernel up to 256.
#   Mosaic's 16 MB scoped-vmem; N=512 -> 41 MB OOMs. Beyond it the
#   implicit matvec-PCG path takes over (no S at all).


def use_implicit(lay, options: BAOptions) -> bool:
    if lay.ranged:
        return True   # the dense kernel has no ranged variant
    mode = getattr(options, "fused_mode", "auto")
    if mode == "dense":
        return False
    if mode == "implicit":
        return True
    return lay.N > DENSE_MAX_IMAGES


def can_use_fused(problem: BAProblem, options: BAOptions) -> bool:
    if options.axis_name is not None:
        return False
    if options.model_id not in bk.SUPPORTED_MODELS:
        return False
    if problem.points.dtype != jnp.float32:
        return False
    npad = (problem.qvecs.shape[0] + 127) // 128 * 128
    op = np.asarray(problem.obs_point)
    om = np.asarray(problem.obs_mask)
    kmax = int(np.bincount(
        op[om > 0], minlength=problem.points.shape[0]).max())
    from sba_tpu.geometry import camera_models
    nparams = camera_models.model_by_id(options.model_id).num_params
    if npad < bk.RANGED_MIN_NPAD:
        # One-hot [Npad, K*TP] must fit VMEM next to the payload
        # arrays; bucketing caps most K but the top bucket carries max
        # track length.
        if npad * kmax * 128 * 4 > 8 * 2 ** 20:
            return False
    else:
        # Ranged path: the VMEM-resident terms are the image payload
        # [Npad, DI] plus the param/free tables [~2*(7+np), Npad]; the
        # per-block terms (oh_sub [IB, B], payload [DI, B], jw [JW, B])
        # scale with the top bucket's K.
        di = 6 + 36 + 6 * nparams + nparams + nparams * nparams
        di = (di + 127) // 128 * 128
        resident = npad * di * 4 + 2 * (7 + nparams) * npad * 4
        B = kmax * 128
        per_block = (256 * B + di * B + 80 * B + 16 * B) * 4
        if resident + 2 * per_block > 12 * 2 ** 20:
            return False
    if problem.cam_params.shape[0] > 10:
        return False
    O = problem.obs_image.shape[0]
    P = problem.points.shape[0]
    if O % P != 0 and options.obs_layout != "point_major":
        pass  # to_point_major below will pad
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform in ("tpu", "axon")


def _solve_reduced(S, b, free, opt: BAOptions, x0=None, have_seed=None):
    """Dense solve of the masked reduced system.

    TPU note: jnp Cholesky goes through the XLA expander (~9 ms at
    D=896); Jacobi-PCG on the explicit S is latency-bound instead
    (~60 matvecs of a VMEM-resident [D, D]) and converges far below LM
    step tolerance because S is SPD + damped. `x0` warm-starts from the
    previous LM iteration's step (opt.cg_warm_start); `have_seed`
    (traced bool) gates the seed matvec behind lax.cond so the first LM
    iteration's all-zero seed pays nothing, and the seed matvec counts
    against opt.cg_iterations (the loop counter starts at 1 when a seed
    matvec was spent), keeping matvec-budget comparisons honest.
    """
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    b = b * free
    d = jnp.diag(S)
    dinv = 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1.0)

    def body(state):
        i, x, r, p, rz = state
        Ap = S @ p
        alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = dinv * r
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, p, rz_new

    def cond(state):
        i, x, r, p, rz = state
        return (i < opt.cg_iterations) & \
            (jnp.dot(r, r) > (opt.cg_tolerance ** 2) * bnorm2)

    bnorm2 = jnp.maximum(jnp.dot(b, b), 1e-30)
    if x0 is None:
        x_init, r_init, i0 = jnp.zeros_like(b), b, 0
    else:
        def _seeded(_):
            # Optimally scaled seed (see _pcg_2block): ||r0|| <= ||b||,
            # with the same finite-s guard against NaN carry-over.
            xi = x0 * free
            Ax0 = S @ xi
            s = jnp.dot(b, Ax0) / jnp.maximum(jnp.dot(Ax0, Ax0), 1e-30)
            ok = jnp.isfinite(s)
            return (jnp.where(ok, s * xi, 0.0),
                    jnp.where(ok, b - s * Ax0, b), jnp.int32(1))

        def _cold(_):
            return jnp.zeros_like(b), b, jnp.int32(0)

        if have_seed is None:
            x_init, r_init, i0 = _seeded(None)
        else:
            x_init, r_init, i0 = jax.lax.cond(have_seed, _seeded, _cold,
                                              None)
    z0 = dinv * r_init
    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(i0), x_init, r_init, z0,
                     jnp.dot(r_init, z0)))
    return x * free

def _pcg_2block(matvec, b_pose, b_cam, prec_p, d_cam, opt: BAOptions,
                x0=None, have_seed=None):
    """PCG over the (pose [N,6], cam [C,np]) block pair with an implicit
    operator. `prec_p` applies the pose preconditioner (block-Jacobi
    [N,6,6] inverse or scalar Jacobi); the cam side is scalar Jacobi.
    Same stopping rule as `_solve_reduced`. `x0 = (x0p, x0c)` warm-starts
    from the previous LM step at the cost of one extra matvec, gated by
    `have_seed` (lax.cond: the first iteration's zero seed skips it) and
    counted against opt.cg_iterations."""
    dinv_c = 1.0 / jnp.where(d_cam > 1e-20, d_cam, 1.0)

    def dot(xp, xc, yp, yc):
        return jnp.sum(xp * yp) + jnp.sum(xc * yc)

    def body(state):
        i, xp, xc, rp, rc, pp, pc, rz = state
        Ap_p, Ap_c = matvec(pp, pc)
        alpha = rz / jnp.maximum(dot(pp, pc, Ap_p, Ap_c), 1e-30)
        xp = xp + alpha * pp
        xc = xc + alpha * pc
        rp = rp - alpha * Ap_p
        rc = rc - alpha * Ap_c
        zp = prec_p(rp)
        zc = dinv_c * rc
        rz_new = dot(rp, rc, zp, zc)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        pp = zp + beta * pp
        pc = zc + beta * pc
        return i + 1, xp, xc, rp, rc, pp, pc, rz_new

    def cond(state):
        i, xp, xc, rp, rc, pp, pc, rz = state
        return (i < opt.cg_iterations) & \
            (dot(rp, rc, rp, rc) > (opt.cg_tolerance ** 2) * bnorm2)

    bnorm2 = jnp.maximum(dot(b_pose, b_cam, b_pose, b_cam), 1e-30)
    if x0 is None:
        xp0, xc0 = jnp.zeros_like(b_pose), jnp.zeros_like(b_cam)
        rp0, rc0 = b_pose, b_cam
        i0 = 0
    else:
        # Seed with the optimally SCALED previous step: s minimizing
        # ||b - s A x0|| makes ||r0|| <= ||b|| unconditionally, so the
        # warm start can never regress past the cold start — unscaled
        # seeds diverge after LM rejects, where the damping jump makes
        # ||A x0|| >> ||b|| and PCG spends its whole budget undoing the
        # seed (observed: reject death-spiral to lambda=1e10).
        def _seeded(_):
            sp, sc = x0
            Ap0, Ac0 = matvec(sp, sc)
            s = (dot(b_pose, b_cam, Ap0, Ac0)
                 / jnp.maximum(dot(Ap0, Ac0, Ap0, Ac0), 1e-30))
            # A non-finite s means the seed itself (a rejected NaN step
            # at over-small damping) or A x0 overflowed — fall back to
            # the cold start, otherwise the NaN re-enters every later
            # iteration through the carried seed. (0 * NaN = NaN:
            # jnp.where, not s=0.)
            ok = jnp.isfinite(s)
            return (jnp.where(ok, s * sp, 0.0),
                    jnp.where(ok, s * sc, 0.0),
                    jnp.where(ok, b_pose - s * Ap0, b_pose),
                    jnp.where(ok, b_cam - s * Ac0, b_cam),
                    jnp.int32(1))

        def _cold(_):
            return (jnp.zeros_like(b_pose), jnp.zeros_like(b_cam),
                    b_pose, b_cam, jnp.int32(0))

        if have_seed is None:
            xp0, xc0, rp0, rc0, i0 = _seeded(None)
        else:
            xp0, xc0, rp0, rc0, i0 = jax.lax.cond(
                have_seed, _seeded, _cold, None)
    zp0 = prec_p(rp0)
    zc0 = dinv_c * rc0
    init = (jnp.int32(i0), xp0, xc0, rp0, rc0, zp0, zc0,
            dot(rp0, rc0, zp0, zc0))
    _, xp, xc, *_ = jax.lax.while_loop(cond, body, init)
    return xp, xc


def _bucketize(problem: BAProblem, options: BAOptions, TP: int = 128,
               max_buckets: int = 3, block_multiple: int = 1):
    """Partition points into track-length buckets (host-side).

    One global K (max track length) wastes up to K_max/K_mean in kernel
    1 lanes; bucketing points by pow2-rounded track length bounds the
    padding at 2x per bucket. Returns buckets = [(static, lay, idx)]
    with idx the bucket's original point indices ([Pb] np.int64); the
    bucket's padded point array is [3, lay.Pp] with columns [0, Pb)
    real. `block_multiple` pads each bucket's block count so the point
    blocks divide evenly over an SPMD mesh (parallel/ba_fused_spmd.py).
    """
    op = np.asarray(problem.obs_point)
    oi = np.asarray(problem.obs_image)
    oc = np.asarray(problem.obs_cam)
    oxy = np.asarray(problem.obs_xy)
    om = np.asarray(problem.obs_mask)
    P = problem.points.shape[0]
    counts = np.bincount(op[om > 0], minlength=P).astype(np.int64)
    counts = np.maximum(counts, 1)

    # Exact quantile-based slot counts (a pow2 rounding would inflate
    # the top bucket; lanes are fine with any K since B = K*TP is
    # always a multiple of 128).
    qs = np.linspace(0, 1, max_buckets + 1)[1:]
    ks = sorted({int(np.ceil(np.quantile(counts, q))) for q in qs})
    ks[-1] = int(counts.max())
    ks = sorted(set(ks))
    k_of_point = np.empty(P, np.int64)
    for p in range(P):
        c = counts[p]
        k_of_point[p] = next((k for k in ks if k >= c), ks[-1])

    # Sort obs by point for slot assignment.
    order = np.argsort(op, kind="stable")
    offs = np.concatenate([[0], np.cumsum(np.bincount(op, minlength=P))])

    # Locality sort: order points by mean observing image so each
    # TP-point block touches a narrow image range — the ranged kernels'
    # per-block [lo, hi) image-sub-block loops (ops/ba_kernels.py
    # _gather_rows/_scatter_accum) then skip almost all of [0, Npad).
    # Sequential-capture scenes (the common SfM case) get near-constant
    # ranges; for the one-hot kernels the order is irrelevant.
    sum_img = np.zeros(P)
    real = om > 0
    np.add.at(sum_img, op[real], oi[real].astype(np.float64))
    mean_img = sum_img / counts

    buckets = []
    for K in ks:
        idx = np.nonzero(k_of_point == K)[0]
        if len(idx) == 0:
            continue
        idx = idx[np.argsort(mean_img[idx], kind="stable")]
        Pb = len(idx)
        Ob = Pb * K
        sub_oi = np.zeros(Ob, np.int32)
        sub_oc = np.zeros(Ob, np.int32)
        sub_xy = np.zeros((Ob, 2), np.float64)
        sub_m = np.zeros(Ob, np.float64)
        for local, p in enumerate(idx):
            rows = order[offs[p]:offs[p + 1]]
            if len(rows) > K:
                # Keep real observations ahead of masked/padding rows.
                rows = rows[np.argsort(-om[rows], kind="stable")][:K]
            n = len(rows)
            base = local * K
            sub_oi[base:base + n] = oi[rows]
            sub_oc[base:base + n] = oc[rows]
            sub_xy[base:base + n] = oxy[rows]
            sub_m[base:base + n] = om[rows]
        # Host (numpy) sub-arrays: build_static reads them right back on
        # the host — a jnp round-trip here would be a device->host read
        # during prep (utils/host.py).
        sub = problem._replace(
            points=np.asarray(problem.points)[idx],
            free_points=np.asarray(problem.free_points)[idx],
            obs_image=sub_oi,
            obs_point=np.repeat(np.arange(Pb, dtype=np.int32), K),
            obs_cam=sub_oc,
            obs_xy=sub_xy.astype(np.asarray(problem.obs_xy).dtype),
            obs_mask=sub_m.astype(np.asarray(problem.obs_mask).dtype),
            pt_gather=None, pt_mask=None, img_gather=None, img_mask=None,
            image_cam=problem.image_cam)
        lay = bk.plan_layout(sub, options, TP, block_multiple)
        static = bk.build_static(sub, options, lay)
        buckets.append((static, lay, idx))
    return buckets


def _fused_step(statics, lays, opt, qvecs, tvecs, pts_list, cams,
                lam, free_arrays, axis_name=None, interpret=False,
                warm=None, have_seed=None):
    """One linearize + solve over all buckets. Returns (u_pose [N,6],
    u_cam [C,12], dp_list (per-bucket [3, Pp]), predicted, g_inf).

    With `axis_name`, point blocks are sharded over that mesh axis
    (parallel/ba_fused_spmd.py): the point-side work stays local and
    exactly three psums (S_corr, image payload, Ey) plus the scalar
    accumulator reductions make the replicated epilogue see the global
    reduced system — the SURVEY §7 stage-7 design (local landmark
    elimination, collectives only on the reduced camera system)."""
    lay0 = lays[0]
    N, C, Npad, Dk = lay0.N, lay0.C, lay0.Npad, lay0.Dk
    nparams = lay0.nparams
    image_cam = statics[0].image_cam
    implicit = use_implicit(lay0, opt)

    par = bk.pack_params(qvecs, tvecs, cams, image_cam, lay0)
    img_red = jnp.zeros((Npad, lay0.DI), jnp.float32)
    per_bucket = []
    if implicit:
        s_corr = ey = None
        for static, lay, pts_b in zip(statics, lays, pts_list):
            i_b, pt_pay, jw, jcorr = bk.fused_reduce(
                static, par, pts_b, lam, lay, opt, interpret=interpret)
            img_red = img_red + i_b
            per_bucket.append((pt_pay, jw, jcorr))
    else:
        s_corr = jnp.zeros((Dk, Dk), jnp.float32)
        ey = jnp.zeros((8, Dk), jnp.float32)
        for static, lay, pts_b in zip(statics, lays, pts_list):
            s_b, i_b, e_b, pt_pay, jw = bk.fused_schur(
                static, par, pts_b, lam, lay, opt,
                interpret=interpret)
            s_corr = s_corr + s_b
            img_red = img_red + i_b
            ey = ey + e_b
            per_bucket.append((pt_pay, jw, None))
    if axis_name is not None:
        img_red = jax.lax.psum(img_red, axis_name)
        if not implicit:
            s_corr = jax.lax.psum(s_corr, axis_name)
            ey = jax.lax.psum(ey, axis_name)

    # ---- unpack image payload ----
    ofs = np.cumsum([0, 6, 36, 6 * nparams, nparams, nparams * nparams])
    red = img_red[:N]
    g_pose = red[:, ofs[0]:ofs[1]]                          # [N, 6]
    Hcc_pose = red[:, ofs[1]:ofs[2]].reshape(N, 6, 6)
    Hpc_img = red[:, ofs[2]:ofs[3]].reshape(N, 6, nparams)
    g_cam = jax.ops.segment_sum(red[:, ofs[3]:ofs[4]],
                                image_cam[:N], num_segments=C)
    Hcc_cam = jax.ops.segment_sum(
        red[:, ofs[4]:ofs[5]].reshape(N, nparams, nparams),
        image_cam[:N], num_segments=C)
    clamp = lambda d: jnp.clip(d, 1e-6, 1e32)
    d_pose = jnp.einsum("nii->ni", Hcc_pose)
    d_cam = jnp.einsum("cii->ci", Hcc_cam)
    d_pose_l = lam * clamp(d_pose)
    d_cam_l = lam * clamp(d_cam)

    free, free_pose, free_cam_np = free_arrays
    if implicit:
        # ---- implicit reduced solve: PCG with a fused matvec kernel ----
        # S v = (H_glob + D_lam) v - EL (EL^T v); EL never materialized.
        base = 6 + 36 + 6 * nparams + nparams + nparams * nparams
        ey_pose = red[:, base:base + 6]                     # [N, 6]
        ey_cam = jax.ops.segment_sum(
            red[:, base + 6:base + 6 + nparams], image_cam[:N],
            num_segments=C)                                 # [C, np]
        o = base + 6 + nparams
        BJ = lay0.BJ
        if BJ:
            # Full 6x6 pose block of EL EL^T (upper tri, 21 rows) for
            # block-Jacobi PCG — cuts CG iterations vs scalar Jacobi,
            # which at large N directly cuts the per-LM-iteration
            # matvec passes over the stored per-obs blocks.
            tri = red[:, o:o + 21]
            iu, ju = np.triu_indices(6)
            corr6 = jnp.zeros((N, 6, 6), jnp.float32)
            corr6 = corr6.at[:, iu, ju].set(tri)
            corr6 = corr6.at[:, ju, iu].set(tri)
            dcorr_pose = jnp.einsum("nii->ni", corr6)
            o += 21
        else:
            dcorr_pose = red[:, o:o + 6]
            o += 6
        dcorr_cam = jax.ops.segment_sum(
            red[:, o:o + nparams], image_cam[:N], num_segments=C)
        img_cam_n = image_cam[:N]

        def matvec(vp, vc):
            vp = vp * free_pose
            vc = vc * free_cam_np
            hp = (jnp.einsum("nij,nj->ni", Hcc_pose, vp)
                  + jnp.einsum("nip,np->ni", Hpc_img, vc[img_cam_n])
                  + d_pose_l * vp)
            hc = (jax.ops.segment_sum(
                jnp.einsum("nip,ni->np", Hpc_img, vp), img_cam_n,
                num_segments=C)
                + jnp.einsum("cpq,cq->cp", Hcc_cam, vc)
                + d_cam_l * vc)
            dup_t = jnp.zeros((6, Npad), jnp.float32).at[:, :N].set(vp.T)
            duc_t = jnp.zeros((12, C), jnp.float32).at[:nparams].set(vc.T)
            corr = None
            for (static, lay), (pt_pay, jw, jcorr) in zip(
                    zip(statics, lays), per_bucket):
                c_b = bk.schur_matvec(static, dup_t, duc_t, jcorr, lay,
                                      opt, interpret=interpret)
                corr = c_b if corr is None else corr + c_b
            if axis_name is not None:
                corr = jax.lax.psum(corr, axis_name)
            hp = hp - corr[:N, :6]
            hc = hc - jax.ops.segment_sum(
                corr[:N, 6:6 + nparams], img_cam_n, num_segments=C)
            # gauge: identity on frozen coordinates
            hp = hp * free_pose + (1.0 - free_pose) * vp
            hc = hc * free_cam_np + (1.0 - free_cam_np) * vc
            return hp, hc

        b_pose = (-g_pose + ey_pose) * free_pose
        b_cam = (-g_cam + ey_cam) * free_cam_np
        diag_c = (jnp.einsum("cii->ci", Hcc_cam) + d_cam_l
                  - dcorr_cam) * free_cam_np + (1.0 - free_cam_np)
        if BJ:
            # Exact 6x6 diagonal blocks of the damped reduced system;
            # gauge-frozen coordinates become identity rows/cols so the
            # preconditioner matches the operator's identity there.
            eye6 = jnp.eye(6, dtype=jnp.float32)[None]
            M = Hcc_pose - corr6 + eye6 * d_pose_l[:, None, :]
            F = free_pose
            M = (M * F[:, :, None] * F[:, None, :]
                 + eye6 * (1.0 - F)[:, :, None])
            Minv = jnp.linalg.inv(M)

            def prec_p(r):
                return jnp.einsum("nij,nj->ni", Minv, r)
        else:
            diag_p = (jnp.einsum("nii->ni", Hcc_pose) + d_pose_l
                      - dcorr_pose) * free_pose + (1.0 - free_pose)
            dinv_p = 1.0 / jnp.where(diag_p > 1e-20, diag_p, 1.0)

            def prec_p(r):
                return dinv_p * r
        x0 = None if warm is None else (warm[0] * free_pose,
                                        warm[1] * free_cam_np)
        u_pose, u_cam_np = _pcg_2block(matvec, b_pose, b_cam,
                                       prec_p, diag_c, opt, x0=x0,
                                       have_seed=have_seed)
        u_pose = u_pose * free_pose
        u_cam_np = u_cam_np * free_cam_np
    else:
        # ---- assemble the reduced system in kernel coordinates ----
        # Kernel row convention: pose row = i*Npad + n, cam row =
        # 6*Npad + m*C + c (see ops/ba_kernels.py ELb construction).
        S = -s_corr
        bi = jnp.arange(N)[:, None] + jnp.arange(6)[None, :] * Npad
        S = S.at[bi[:, :, None], bi[:, None, :]].add(Hcc_pose)
        ci_np = (6 * Npad + jnp.arange(C)[:, None]
                 + jnp.arange(nparams)[None, :] * C)        # [C, np]
        S = S.at[ci_np[:, :, None], ci_np[:, None, :]].add(Hcc_cam)
        cam_cols = ci_np[image_cam[:N]]                     # [N, np]
        S = S.at[bi[:, :, None], cam_cols[:, None, :]].add(Hpc_img)
        S = S.at[cam_cols[:, :, None], bi[:, None, :]].add(
            jnp.swapaxes(Hpc_img, 1, 2))
        d_l = jnp.zeros(Dk, jnp.float32)
        d_l = d_l.at[bi.reshape(-1)].set(d_pose_l.reshape(-1))
        d_l = d_l.at[ci_np.reshape(-1)].set(d_cam_l.reshape(-1))
        S = S + jnp.diag(d_l)

        g_u = jnp.zeros(Dk, jnp.float32)
        g_u = g_u.at[bi.reshape(-1)].set(g_pose.reshape(-1))
        g_u = g_u.at[ci_np.reshape(-1)].set(g_cam.reshape(-1))
        b = (-g_u + ey[0]) * free

        if warm is None:
            x0 = None
        else:
            x0 = jnp.zeros(Dk, jnp.float32)
            x0 = x0.at[bi.reshape(-1)].set(
                (warm[0] * free_pose).reshape(-1))
            x0 = x0.at[ci_np.reshape(-1)].set(
                (warm[1] * free_cam_np).reshape(-1))
        du = _solve_reduced(S, b, free, opt, x0=x0, have_seed=have_seed)
        u_pose = du[:6 * Npad].reshape(6, Npad).T[:N] * free_pose
        u_cam_np = du[6 * Npad:6 * Npad + 12 * C] \
            .reshape(12, C).T[:, :nparams] * free_cam_np

    # ---- back-substitute + predicted sums (per bucket) ----
    du_pose_t = jnp.zeros((6, Npad), jnp.float32).at[:, :N].set(u_pose.T)
    du_cam_t = jnp.zeros((12, C), jnp.float32).at[:nparams].set(u_cam_np.T)
    dp_list = []
    t2 = jnp.float32(0.0)
    g_dp = jnp.float32(0.0)
    d_dp2 = jnp.float32(0.0)
    g_inf_pts = jnp.float32(0.0)
    for (static, lay), (pt_pay, jw, _) in zip(zip(statics, lays),
                                              per_bucket):
        dp, acc = bk.backsub(static, du_pose_t, du_cam_t, pt_pay, jw, lam,
                             lay, opt, interpret=interpret)
        dp_list.append(dp[:3])
        t2 = t2 + acc[0, 0]
        g_dp = g_dp + acc[1, 0]
        d_dp2 = d_dp2 + acc[2, 0]
        g_inf_pts = jnp.maximum(g_inf_pts, jnp.max(jnp.abs(pt_pay[:3])))
    if axis_name is not None:
        t2 = jax.lax.psum(t2, axis_name)
        g_dp = jax.lax.psum(g_dp, axis_name)
        d_dp2 = jax.lax.psum(d_dp2, axis_name)
        g_inf_pts = jax.lax.pmax(g_inf_pts, axis_name)

    gTd = jnp.sum(g_pose * u_pose) + jnp.sum(g_cam * u_cam_np) + g_dp
    dHd = (t2 + jnp.sum(d_pose_l * u_pose * u_pose)
           + jnp.sum(d_cam_l * u_cam_np * u_cam_np) + d_dp2)
    predicted = -(gTd + 0.5 * dHd)
    g_inf = jnp.maximum(
        jnp.max(jnp.abs(g_pose)),
        jnp.maximum(jnp.max(jnp.abs(g_cam)), g_inf_pts))
    u_cam = jnp.zeros((C, MAXP), jnp.float32).at[:, :nparams].set(u_cam_np)
    return u_pose, u_cam, dp_list, predicted, g_inf


def _fused_lm_loop_impl(statics, lays, pts0, problem, options,
                        free_arrays, axis_name=None, interpret=False):
    """LM loop body shared by the single-chip jit and the shard_map SPMD
    wrapper (parallel/ba_fused_spmd.py). pts0 is a tuple of per-bucket
    [3, Pp_b] arrays (sharded along blocks in the SPMD case)."""
    opt = options
    max_it = opt.max_iterations
    lay0 = lays[0]
    q0a = problem.qvecs.astype(jnp.float32)
    t0a = problem.tvecs.astype(jnp.float32)
    k0a = problem.cam_params.astype(jnp.float32)

    def cost_of(q, t, pts_list, k):
        par = bk.pack_params(q, t, k, statics[0].image_cam, lay0)
        c = jnp.float32(0.0)
        for static, lay, pts_b in zip(statics, lays, pts_list):
            c = c + bk.fused_cost(static, par, pts_b, lay, opt,
                                  interpret=interpret)
        if axis_name is not None:
            c = jax.lax.psum(c, axis_name)
        return c

    cost0 = cost_of(q0a, t0a, pts0, k0a)

    nparams = lay0.nparams

    def body(state):
        (it, q, t, pts_t, k, lam, nu, cost, done, g_inf, trace,
         wp, wc) = state
        warm = (wp, wc) if opt.cg_warm_start else None
        u_pose, u_cam, dp_list, predicted, g_inf = _fused_step(
            statics, lays, opt, q, t, pts_t, k, lam, free_arrays,
            axis_name=axis_name, interpret=interpret, warm=warm,
            have_seed=None if warm is None else it > 0)
        q2 = quat_retract(q, u_pose[:, :3])
        t2 = t + u_pose[:, 3:]
        pts2 = tuple(p + dp for p, dp in zip(pts_t, dp_list))
        k2 = k + u_cam
        new_cost = cost_of(q2, t2, pts2, k2)
        actual = cost - new_cost
        rho = actual / jnp.maximum(predicted, 1e-30)
        accept = (actual > 0) & (predicted > 0)
        lam_acc = lam * jnp.maximum(1.0 / 3.0,
                                    1.0 - (2.0 * rho - 1.0) ** 3)
        lam_rej = lam * nu
        lam = jnp.where(accept, jnp.maximum(lam_acc, 1e-14),
                        jnp.minimum(lam_rej, 1e10))
        nu = jnp.where(accept, 2.0, nu * 2.0)
        q = jnp.where(accept, q2, q)
        t = jnp.where(accept, t2, t)
        pts_t = tuple(jnp.where(accept, p2, p)
                      for p2, p in zip(pts2, pts_t))
        k = jnp.where(accept, k2, k)
        cost_new = jnp.where(accept, new_cost, cost)
        dp2_sum = sum(jnp.sum(dp ** 2) for dp in dp_list)
        pts2_sum = sum(jnp.sum(p ** 2) for p in pts_t)
        if axis_name is not None:
            dp2_sum = jax.lax.psum(dp2_sum, axis_name)
            pts2_sum = jax.lax.psum(pts2_sum, axis_name)
        step_norm = jnp.sqrt(jnp.sum(u_pose ** 2) + jnp.sum(u_cam ** 2)
                             + dp2_sum)
        x_norm = jnp.sqrt(jnp.sum(t ** 2) + pts2_sum
                          + jnp.sum(k ** 2)) + 1.0
        done = (
            (accept & (jnp.abs(actual)
                       < opt.function_tolerance * jnp.maximum(cost, 1e-30)))
            | (g_inf < opt.gradient_tolerance)
            | (accept & (step_norm < opt.parameter_tolerance * x_norm))
            | (lam >= 1e10))
        trace = trace.at[it + 1].set(cost_new)
        # Warm-start seed for the next iteration's PCG (the solver
        # rescales it optimally against the new damped system, so no
        # accept/reject adjustment is needed here).
        return (it + 1, q, t, pts_t, k, lam, nu, cost_new, done, g_inf,
                trace, u_pose, u_cam[:, :nparams])

    def cond(state):
        return (state[0] < max_it) & (~state[8])

    trace0 = jnp.full((max_it + 1,), jnp.nan, jnp.float32).at[0].set(cost0)
    lam0 = jnp.asarray(1.0 / opt.initial_trust_radius, jnp.float32)
    init = (0, q0a, t0a, pts0, k0a, lam0, jnp.float32(2.0), cost0,
            jnp.asarray(False), jnp.asarray(jnp.inf, jnp.float32), trace0,
            jnp.zeros((lay0.N, 6), jnp.float32),
            jnp.zeros((lay0.C, nparams), jnp.float32))
    (it, q, t, pts_t, k, lam, nu, cost, done, g_inf, trace, _, _) = \
        jax.lax.while_loop(cond, body, init)

    summary = BASummary(
        initial_cost=cost0, final_cost=cost, num_iterations=it,
        num_residuals=jnp.sum(problem.obs_mask).astype(jnp.int32),
        gradient_norm=g_inf, cost_trace=trace)
    return (q, t, pts_t, k), summary


_fused_lm_loop = functools.partial(jax.jit, static_argnames=(
    "lays", "options", "axis_name", "interpret"))(_fused_lm_loop_impl)


def _pack_bucket_points(points, idxs, lays):
    """points [P,3] -> tuple of per-bucket padded [3, Pp_b] arrays."""
    return tuple(
        jnp.zeros((3, lay.Pp), jnp.float32)
        .at[:, :len(idx)].set(points[idx].astype(jnp.float32).T)
        for idx, lay in zip(idxs, lays))


def prepare(problem: BAProblem, options: BAOptions, TP: int = 128,
            max_buckets: int = 3, block_multiple: int = 1):
    """Host-side prep (track-length bucketing + static tables + gauge
    masks). Separated from the solve so repeated solves over the same
    problem structure (mapper local/global BA, benchmarking) pay the
    host cost once. Returns an opaque context for `solve_prepared`."""
    problem = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a, problem)
    if problem.image_cam is None:
        from sba_tpu.optim.ba import _image_cam_of

        problem = problem._replace(
            image_cam=jnp.asarray(_image_cam_of(problem)))
    else:
        # A stale image_cam (e.g. obs_cam edited after
        # attach_gather_layouts) silently mis-intrinsics every kernel
        # gather — fail loudly instead.
        icam = np.asarray(problem.image_cam)
        derived = icam.copy()
        derived[np.asarray(problem.obs_image)] = np.asarray(problem.obs_cam)
        if not np.array_equal(derived, icam):
            raise ValueError(
                "problem.image_cam is inconsistent with obs_image/obs_cam")
    buckets = _bucketize(problem, options, TP, max_buckets, block_multiple)
    statics = tuple(b[0] for b in buckets)
    lays = tuple(b[1] for b in buckets)
    idxs = tuple(b[2] for b in buckets)

    pts0 = _pack_bucket_points(problem.points, idxs, lays)

    # Gauge/free masks in kernel coordinates (host-side, static).
    lay0 = lays[0]
    N, C, Npad, Dk = lay0.N, lay0.C, lay0.Npad, lay0.Dk
    nparams = lay0.nparams
    free_pose = np.concatenate(
        [np.repeat(np.asarray(problem.free_rot)[:, None], 3, axis=1),
         np.asarray(problem.free_trans)], axis=1).astype(np.float32)
    if not options.refine_extrinsics:
        free_pose = free_pose * 0.0
    refine = bk._intrinsic_mask(options)[:nparams]
    free_cam_np = (np.asarray(problem.free_cam)[:, :nparams]
                   * refine).astype(np.float32)
    free = np.zeros(Dk, np.float32)
    bi = np.arange(N)[:, None] + np.arange(6)[None, :] * Npad
    free[bi.reshape(-1)] = free_pose.reshape(-1)
    ci = (6 * Npad + np.arange(C)[:, None]
          + np.arange(nparams)[None, :] * C)
    free[ci.reshape(-1)] = free_cam_np.reshape(-1)
    free_arrays = (jnp.asarray(free), jnp.asarray(free_pose),
                   jnp.asarray(free_cam_np))
    return (statics, lays, pts0, idxs, problem, options, free_arrays)


def unpack_bucket_points(pts_t, idxs, num_points):
    """Inverse of `_pack_bucket_points`: per-bucket [3, Pp_b] arrays ->
    points [P, 3] in original order. Concat + one lane gather (a row
    SCATTER of 3-wide rows measured ~10 ms at bench scale; the gather
    is ~free)."""
    cat = jnp.concatenate(pts_t, axis=1)
    perm_cols = np.zeros(num_points, np.int32)
    lo = 0
    for pts_b, idx in zip(pts_t, idxs):
        perm_cols[idx] = lo + np.arange(len(idx), dtype=np.int32)
        lo += pts_b.shape[1]
    return cat[:, jnp.asarray(perm_cols)].T


def solve_prepared(ctx, interpret: bool = False, qvecs=None, tvecs=None,
                   points=None, cam_params=None):
    """Run the LM loop on a prepared context, optionally with updated
    parameter values (same structure)."""
    (statics, lays, pts0, idxs, problem, options, free_arrays) = ctx
    if qvecs is not None:
        problem = problem._replace(
            qvecs=qvecs.astype(jnp.float32),
            tvecs=tvecs.astype(jnp.float32),
            cam_params=cam_params.astype(jnp.float32))
        pts0 = _pack_bucket_points(points, idxs, lays)
    (q, t, pts_t, k), summary = _fused_lm_loop(
        statics, lays, pts0, problem, options, free_arrays,
        interpret=interpret)
    pts_out = unpack_bucket_points(pts_t, idxs, problem.points.shape[0])
    out = problem._replace(qvecs=q, tvecs=t, points=pts_out, cam_params=k)
    return out, summary


def bundle_adjust_fused(problem: BAProblem, options: BAOptions,
                        interpret: bool = False):
    """Solve with the fused Pallas path (COO or point-major input)."""
    return solve_prepared(prepare(problem, options), interpret=interpret)
