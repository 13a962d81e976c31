"""Semantic Bundle Adjustment: dense pairwise semantic-consistency, pose-only.

TPU-native redesign of the fork's flagship workload
(ref: src/optim/semantic_bundle_adjustment.{h,cc},
src/base/semantic_cost_functions.h). What the reference does:

- For every ORDERED registered image pair (1, 2) and every pixel of image 1
  on a stride grid (``error_computation_pixel_step``, default 10; ref
  .cc:796-799), skipping zero-depth pixels (ref .cc:809), it adds one Ceres
  residual: unproject the pixel with image 1's depth map, transform through
  pose1^-1 then pose2, project into image 2 (SIMPLE_PINHOLE only, ref
  semantic_cost_functions.h:50), round to the nearest pixel, then
  - OUT_OF_BOUNDS  -> residual 0          (ref :163-181)
  - |depth2(px) - projected depth| > depth_error_threshold -> residual 0
    (INVALID_DEPTH, ref :183-196)
  - else residual = 0/1 on semantic label equality (ref :199-205).
- Gradients via numeric CENTRAL differences (relative step 1e-3; ref
  :254-257) because nothing above is differentiable.
- Intrinsics constant, first pose constant + one tvec component of the
  second pose (gauge; ref controllers/semantic_bundle_adjustment.cc:106-115).

TPU-first redesign:

- ALL (pair, pixel) residuals evaluate as one batched array program
  ``[Q, S]`` (Q ordered pairs x S grid pixels): gather source depth/labels
  once into ``[N, S]`` tables, then the whole residual field is VPU math +
  two map gathers. This replaces the reference's per-residual-block virtual
  calls (the hot path of SURVEY.md section 3.2).
- Differentiability (the 'hard part' in SURVEY.md section 7): the *soft*
  mode replaces rounding with bilinear map sampling, the depth gate with a
  sigmoid, the bounds gate with a product of sigmoids, and the 0/1 label
  residual with 1 - bilinear label-agreement probability — exact autodiff
  Jacobians via jacfwd over the 12 local pose DoF of each pair.
- The *hard* mode reproduces the reference residual exactly (same gates,
  nearest rounding, 0/1 values) for cost/status parity, and a
  numeric-central-difference Jacobian mode matches the reference's
  optimization behavior for validation.
- The normal equations are pose-only: per-pair 12x12 blocks scatter-added
  into a dense [6N, 6N] H solved by Cholesky — N is image count, so dense
  is the right call (the reference's DENSE/SPARSE/ITERATIVE switch at
  .cc:489-500 exists only because Ceres treats pairs generically).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.geometry.quaternions import (
    pose_inverse,
    pose_transform,
    quat_retract,
)
from sba_tpu.ops.interpolation import (
    JOINT_MAX_LABELS,
    bilinear_flat,
    bilinear_joint_flat,
    bilinear_joint_grad,
    bilinear_label_agreement,
    bilinear_label_agreement_flat,
    bilinear_label_agreement_flat_raw,
    bilinear_label_agreement_grad,
    bilinear_sample2d,
    bilinear_depth_u8_flat,
    bilinear_depth_u8_grad,
    nearest_sample2d,
    pack_depth_nbhd_u8,
    pack_joint_nbhd,
    pack_label_neighborhood,
)
from sba_tpu.optim.losses import loss_value, loss_weight

# Reprojection status codes (ref: src/base/semantic_cost_functions.h:45).
OUT_OF_BOUNDS = -1
INVALID_DEPTH = -2
VALID = 10


class SBAProblem(NamedTuple):
    """Pose-only dense semantic BA state (pytree).

    cam_params are per-image SIMPLE_PINHOLE (f, cx, cy) — the reference
    asserts this model and keeps intrinsics constant
    (ref: src/optim/semantic_bundle_adjustment.cc:604-644).
    """

    qvecs: jnp.ndarray        # [N, 4]
    tvecs: jnp.ndarray        # [N, 3]
    cam_params: jnp.ndarray   # [N, 3]
    depth_maps: jnp.ndarray   # [N, H, W]
    semantic_maps: jnp.ndarray  # [N, H, W]
    pix_xy: jnp.ndarray       # [S, 2] float (x, y) sample grid
    src_depth: jnp.ndarray    # [N, S] depth_1 at grid
    src_label: jnp.ndarray    # [N, S] semantic_1 at grid
    pair_src: jnp.ndarray     # [Q] int32
    pair_dst: jnp.ndarray     # [Q] int32
    pair_mask: jnp.ndarray    # [Q] float
    free_rot: jnp.ndarray     # [N]
    free_trans: jnp.ndarray   # [N, 3]
    # Packed 2x2-neighborhood maps (ops/interpolation.py pack_*),
    # FLATTENED to [N*H*W] for global-index gathers: the soft path costs
    # 2 gathers per sample (one u8-quantized depth patch, one label
    # patch) instead of the unpacked path's 8. Flat indexing measured
    # ~30% faster than batched per-map gathers on v5e.
    # None -> unpacked fallback (f64 numeric-parity tests).
    depth_packed: Optional[jnp.ndarray] = None   # [N*H*W] u32 (u8 2x2)
    label_packed: Optional[jnp.ndarray] = None   # [N*H*W] u32
    depth_range: Optional[jnp.ndarray] = None    # [N, 2] dequant (lo, hi)
    # Round-5 joint packing (ops/interpolation.py pack_joint_nbhd):
    # BOTH maps' 2x2 patches in one u32 word (5-bit depth + 3-bit label
    # palette code per corner) -> ONE gather per sample instead of two.
    # Built when the solve's label palette has <= 8 distinct values
    # (typical for the reference's tree-trunk workload); otherwise the
    # two-gather u8 path above is used. src_code holds the palette code
    # of each source grid pixel.
    joint_packed: Optional[jnp.ndarray] = None   # [N*H*W] u32
    src_code: Optional[jnp.ndarray] = None       # [N, S] int32


@dataclass(frozen=True)
class SBAOptions:
    """Mirrors SemanticBundleAdjustmentOptions
    (ref: src/optim/semantic_bundle_adjustment.h:53-133)."""

    depth_error_threshold: float = 2.0
    pixel_step: int = 10
    loss: str = "trivial"            # TRIVIAL | SOFT_L1 | CAUCHY in ref
    loss_scale: float = 1.0
    max_iterations: int = 50
    mode: str = "soft"               # soft | hard_numeric
    tau_depth: float = 0.25          # soft depth-gate sharpness (x threshold)
    tau_bounds: float = 2.0          # soft bounds-gate sharpness, pixels
    numeric_step: float = 1e-3       # ref numeric_relative_step_size
    # Soft-mode linearization: "analytic" = closed-form chain-rule
    # Jacobian blocks (one gather pass, ~4x faster than jacfwd at the
    # 50-img production shape); "jacfwd" = 12-tangent forward-mode
    # (the reference implementation of the same derivatives; kept for
    # parity tests). Packed maps required for analytic; falls back to
    # jacfwd otherwise.
    linearize: str = "analytic"
    # Pair-chunked linearization: 0 = auto (bound one chunk to ~4M
    # (pair, pixel) samples so 100+ full-res images fit; see
    # _linearize_system). Set explicitly to tune chunk size.
    pair_chunk: int = 0
    function_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-12
    parameter_tolerance: float = 1e-10
    # Conservative initial damping: the dense-semantic basin is ~1 pixel
    # wide (bilinear agreement), so early steps must stay local — unlike
    # reprojection BA where the quadratic model is globally decent.
    initial_trust_radius: float = 1e2
    # SPMD: mesh axis name the ordered pairs are sharded over (set by
    # parallel/sba_spmd.py, not by callers). Per LM iteration the only
    # collectives are one psum of (H [6N,6N], g [6N], cost) — poses are
    # replicated, pair residual work is local.
    axis_name: Optional[str] = None


class SBASummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    num_residuals: jnp.ndarray
    cost_trace: jnp.ndarray
    # Hard-mode status counts at the solution (parity with the reference's
    # setup/status reports, ref .cc:277-428).
    num_valid: jnp.ndarray
    num_out_of_bounds: jnp.ndarray
    num_invalid_depth: jnp.ndarray
    num_label_mismatch: jnp.ndarray


# ---------------------------------------------------------------------------
# Geometry core shared by both modes: warp pixels of src into dst.
# ---------------------------------------------------------------------------

def _warp_pair(q_src, t_src, q_dst, t_dst, cam_src, cam_dst, pix_xy, src_depth):
    """For one ordered pair: unproject src grid pixels -> world -> project
    into dst. Returns (xy2 [S,2] continuous, projected depth [S]).

    Math parity with compute_semantic_error steps 1-5
    (ref: src/base/semantic_cost_functions.h:100-151).
    """
    f = cam_src[0]
    c = cam_src[1:3]
    uv1 = (pix_xy - c) / f
    p3 = jnp.concatenate([uv1 * src_depth[:, None], src_depth[:, None]], axis=-1)
    qi, ti = pose_inverse(q_src, t_src)
    world = pose_transform(qi, ti, p3)
    p_cam2 = pose_transform(q_dst, t_dst, world)
    z2 = p_cam2[:, 2]
    safe_z = jnp.where(jnp.abs(z2) > 1e-12, z2, 1e-12)
    uv2 = p_cam2[:, :2] / safe_z[:, None]
    xy2 = cam_dst[0] * uv2 + cam_dst[1:3]
    return xy2, z2


def _warp_pair_lanes(q_src, t_src, q_dst, t_dst, cam_src, cam_dst,
                     px, py, src_depth):
    """Same math as `_warp_pair`, but every per-pixel array is a [S]
    COMPONENT array (x, y, z separately) instead of [S,3]/[S,2] points.

    On TPU a [S,3] array pads its trailing dim to the 128-lane tile —
    42x wasted VPU work; measured 23 ms for the warp alone at bench
    scale vs ~1 ms in this layout. The per-pair rotation matrices are
    3x3 scalars (18 scalar reads, negligible)."""
    from sba_tpu.geometry.quaternions import quat_to_rotmat

    f = cam_src[0]
    d = src_depth
    x1 = (px - cam_src[1]) / f * d
    y1 = (py - cam_src[2]) / f * d
    # world = R_src^T (p - t_src)
    Rs = quat_to_rotmat(q_src)
    ax = x1 - t_src[0]
    ay = y1 - t_src[1]
    az = d - t_src[2]
    wx = Rs[0, 0] * ax + Rs[1, 0] * ay + Rs[2, 0] * az
    wy = Rs[0, 1] * ax + Rs[1, 1] * ay + Rs[2, 1] * az
    wz = Rs[0, 2] * ax + Rs[1, 2] * ay + Rs[2, 2] * az
    # cam2 = R_dst world + t_dst
    Rd = quat_to_rotmat(q_dst)
    cx2 = Rd[0, 0] * wx + Rd[0, 1] * wy + Rd[0, 2] * wz + t_dst[0]
    cy2 = Rd[1, 0] * wx + Rd[1, 1] * wy + Rd[1, 2] * wz + t_dst[1]
    z2 = Rd[2, 0] * wx + Rd[2, 1] * wy + Rd[2, 2] * wz + t_dst[2]
    safe_z = jnp.where(jnp.abs(z2) > 1e-12, z2, 1e-12)
    x2 = cam_dst[0] * cx2 / safe_z + cam_dst[1]
    y2 = cam_dst[0] * cy2 / safe_z + cam_dst[2]
    return x2, y2, z2


def _pair_residual_soft(q_src, t_src, q_dst, t_dst, cam_src, cam_dst,
                        flat_depth, flat_sem, HW, pix_xy, src_depth,
                        src_label, opt: SBAOptions, depth_packed=None,
                        label_packed=None, base=None, depth_lo=None,
                        depth_hi=None, joint_packed=None, src_code=None):
    """Differentiable residual field for one pair: [S]. All map inputs
    are FLAT [N*H*W] stacks indexed at offset `base` (= pd * H * W):
    per-pair map gathers under vmap materialize [Q, H, W] arrays
    (11 GB at 100 images / 640x480)."""
    H, W = HW
    # Full-lane component layout ([S] x/y/z arrays, not [S,2]) — see
    # _warp_pair_lanes.
    x2, y2, z2 = _warp_pair_lanes(q_src, t_src, q_dst, t_dst, cam_src,
                                  cam_dst, pix_xy[:, 0], pix_xy[:, 1],
                                  src_depth)
    # Soft bounds gate (product of sigmoids), sharp over tau_bounds pixels.
    tb = opt.tau_bounds
    gb = (jax.nn.sigmoid(x2 / tb)
          * jax.nn.sigmoid((W - 1 - x2) / tb)
          * jax.nn.sigmoid(y2 / tb)
          * jax.nn.sigmoid((H - 1 - y2) / tb))
    # Also require the point in front of the dst camera.
    gb = gb * jax.nn.sigmoid(z2 / 0.01)
    if joint_packed is not None:
        depth2, agree = bilinear_joint_flat(joint_packed, H, W, base,
                                            x2, y2, src_code,
                                            depth_lo, depth_hi,
                                            depth_fill=-1e6)
        derr = jnp.abs(depth2 - z2)
        gd = jax.nn.sigmoid((opt.depth_error_threshold - derr)
                            / (opt.tau_depth * opt.depth_error_threshold))
        valid_src = (src_depth > 0).astype(x2.dtype)
        return valid_src * (1.0 - gb * gd * agree)
    if depth_packed is not None:
        depth2 = bilinear_depth_u8_flat(depth_packed, H, W, base, x2, y2,
                                        depth_lo, depth_hi, fill=-1e6)
    else:
        depth2 = bilinear_flat(flat_depth, H, W, base, x2, y2,
                               fill=-1e6)
    derr = jnp.abs(depth2 - z2)
    gd = jax.nn.sigmoid((opt.depth_error_threshold - derr)
                        / (opt.tau_depth * opt.depth_error_threshold))
    if label_packed is not None:
        # See the analytic path: keep the two rowsel gathers in
        # separate fusions (gather_micro4.py).
        x2c, y2c = jax.lax.optimization_barrier((x2, y2))
        agree = bilinear_label_agreement_flat(label_packed, H, W, base,
                                              x2c, y2c, src_label,
                                              fill=0.0)
    else:
        agree = bilinear_label_agreement_flat_raw(
            flat_sem, H, W, base, x2, y2, src_label, fill=0.0)
    valid_src = (src_depth > 0).astype(x2.dtype)  # ref .cc:809 skip
    # Soft objective design: r = valid_src * (1 - gate * agreement).
    # The reference's hard residual zeroes gated-away pixels; a smooth
    # relaxation of THAT form lets the optimizer game the cost by pushing
    # pixels out of bounds / out of the depth gate (residual -> 0). Charging
    # invalidity the same unit cost as a mismatch removes the escape route
    # AND makes the gate gradients purely attractive
    # (d r / d gate = -agree <= 0): the differentiable depth gate then
    # contributes the geometric depth-consistency signal that localizes
    # poses — the part the reference's hard 0/1 residual cannot express.
    return valid_src * (1.0 - gb * gd * agree)


def _pair_residual_hard(q_src, t_src, q_dst, t_dst, cam_src, cam_dst,
                        flat_depth, flat_sem, HW, base, pix_xy,
                        src_depth, src_label, opt: SBAOptions):
    """Exact reference semantics: returns (residual [S], status [S]
    int32). `flat_depth`/`flat_sem` are the FLAT [N*H*W] map stacks and
    `base` the destination map offset — per-pair `depth_maps[pd]`
    gathers under vmap materialize a [Q, H, W] array (11 GB at the
    100-image production shape), so the hard path indexes globally like
    the packed soft path does."""
    H, W = HW
    x2, y2, z2 = _warp_pair_lanes(q_src, t_src, q_dst, t_dst, cam_src,
                                  cam_dst, pix_xy[:, 0], pix_xy[:, 1],
                                  src_depth)
    xi = jnp.round(x2).astype(jnp.int32)
    yi = jnp.round(y2).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    flat = base + (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1))
    depth2 = jnp.where(inb, jnp.take(flat_depth, flat), 0.0)
    depth_ok = jnp.abs(depth2 - z2) <= opt.depth_error_threshold
    label2 = jnp.take(flat_sem, flat)
    mismatch = inb & (label2 != src_label)
    valid_src = src_depth > 0

    status = jnp.where(~inb, OUT_OF_BOUNDS,
                       jnp.where(~depth_ok, INVALID_DEPTH, VALID))
    r = jnp.where(inb & depth_ok & valid_src,
                  mismatch.astype(x2.dtype), 0.0)
    status = jnp.where(valid_src, status, OUT_OF_BOUNDS)
    return r, status


# ---------------------------------------------------------------------------
# Analytic linearization (the soft-mode hot path)
# ---------------------------------------------------------------------------

def _pair_linearize_analytic(q_src, t_src, q_dst, t_dst, cam_src, cam_dst,
                             HW, px, py, src_depth, src_label,
                             opt: SBAOptions, depth_packed, label_packed,
                             base, depth_lo, depth_hi, joint_packed=None,
                             src_code=None):
    """One ordered pair's residuals + condensed Jacobian blocks, closed
    form. Returns (r [S], P [9, S]) where P rows are the three 3-vector
    blocks (a, b, G) that generate the full 12-DoF Jacobian:

        J = [a | b | -a | G]   over (omega_src, t_src, omega_dst, t_dst)

    Derivation: with right-multiplicative quaternion retraction
    (quat_retract), the camera-point Jacobians are
        dc/d omega_src = R_d [w]x,   dc/d t_src = -R_d R_s^T,
        dc/d omega_dst = -R_d [w]x,  dc/d t_dst = I,
    so for G = dr/dc (chain through screen gates + bilinear samples,
    whose x/y derivatives come FREE from the already-gathered corner
    values): a = (R_d^T G) x w, b = -R_s (R_d^T G). One gather pass
    per map per iteration — replacing the 13-pass jacfwd over the same
    gathers (the hot kernel of ref src/base/semantic_cost_functions.h:
    88-208, which pays 2 evals x 12-14 DoF of numeric diff instead).
    All per-sample arrays are full-lane [S] components (no [S,3]
    tile padding)."""
    from sba_tpu.geometry.quaternions import quat_to_rotmat

    Hm, Wm = HW
    f = cam_src[0]
    d = src_depth
    x1 = (px - cam_src[1]) / f * d
    y1 = (py - cam_src[2]) / f * d
    Rs = quat_to_rotmat(q_src)
    ax = x1 - t_src[0]
    ay = y1 - t_src[1]
    az = d - t_src[2]
    # world point w = R_s^T (p1 - t_s)
    wx = Rs[0, 0] * ax + Rs[1, 0] * ay + Rs[2, 0] * az
    wy = Rs[0, 1] * ax + Rs[1, 1] * ay + Rs[2, 1] * az
    wz = Rs[0, 2] * ax + Rs[1, 2] * ay + Rs[2, 2] * az
    Rd = quat_to_rotmat(q_dst)
    cx2 = Rd[0, 0] * wx + Rd[0, 1] * wy + Rd[0, 2] * wz + t_dst[0]
    cy2 = Rd[1, 0] * wx + Rd[1, 1] * wy + Rd[1, 2] * wz + t_dst[1]
    z2 = Rd[2, 0] * wx + Rd[2, 1] * wy + Rd[2, 2] * wz + t_dst[2]
    okz = jnp.abs(z2) > 1e-12
    safe_z = jnp.where(okz, z2, 1e-12)
    zi = 1.0 / safe_z
    fd = cam_dst[0]
    x2 = fd * cx2 * zi + cam_dst[1]
    y2 = fd * cy2 * zi + cam_dst[2]

    # --- gates + samples (primal) ---
    tb = opt.tau_bounds
    sa = jax.nn.sigmoid(x2 / tb)
    sb = jax.nn.sigmoid((Wm - 1 - x2) / tb)
    sc = jax.nn.sigmoid(y2 / tb)
    sd_ = jax.nn.sigmoid((Hm - 1 - y2) / tb)
    sz = jax.nn.sigmoid(z2 / 0.01)
    gb = sa * sb * sc * sd_ * sz
    thr = opt.depth_error_threshold
    tau = opt.tau_depth * thr
    if joint_packed is not None:
        # Round 5: ONE gather serves both maps (joint 5-bit depth +
        # 3-bit label-code packing; ops/interpolation.py) — the r4
        # roofline said the iteration is gather-issue-bound, so halving
        # the issues is the headroom BASELINE.md named.
        depth2, dD_dx, dD_dy, agree, dA_dx, dA_dy = bilinear_joint_grad(
            joint_packed, Hm, Wm, base, x2, y2, src_code,
            depth_lo, depth_hi, depth_fill=-1e6)
        delta = depth2 - z2
        gd = jax.nn.sigmoid((thr - jnp.abs(delta)) / tau)
    else:
        depth2, dD_dx, dD_dy = bilinear_depth_u8_grad(
            depth_packed, Hm, Wm, base, x2, y2, depth_lo, depth_hi,
            fill=-1e6)
        delta = depth2 - z2
        gd = jax.nn.sigmoid((thr - jnp.abs(delta)) / tau)
        # optimization_barrier: two rowsel gathers in ONE fusion lose the
        # gather-select fusion (2.7x slowdown measured,
        # benchmarks/gather_micro4.py: 48 ms single / 133 ms fused pair /
        # 75 ms with barrier). The barrier keeps the label gather in its
        # own fusion at the cost of recomputing floor/clip setup (~free).
        x2b, y2b = jax.lax.optimization_barrier((x2, y2))
        agree, dA_dx, dA_dy = bilinear_label_agreement_grad(
            label_packed, Hm, Wm, base, x2b, y2b, src_label, fill=0.0)
    valid = (src_depth > 0).astype(x2.dtype)
    r = valid * (1.0 - gb * gd * agree)

    # --- screen-space gradient of r ---
    dgb_dx = gb * (sb - sa) / tb
    dgb_dy = gb * (sd_ - sc) / tb
    dgb_dz = gb * (1.0 - sz) / 0.01
    dgd_dDelta = -gd * (1.0 - gd) * jnp.sign(delta) / tau
    dgd_dx = dgd_dDelta * dD_dx
    dgd_dy = dgd_dDelta * dD_dy
    dgd_dz = -dgd_dDelta
    ga = gd * agree
    Gx = -valid * (dgb_dx * ga + gb * (dgd_dx * agree + gd * dA_dx))
    Gy = -valid * (dgb_dy * ga + gb * (dgd_dy * agree + gd * dA_dy))
    Gz = -valid * (dgb_dz * ga + gb * dgd_dz * agree)

    # --- chain to camera-frame gradient G = dr/dc ---
    Gcx = Gx * fd * zi
    Gcy = Gy * fd * zi
    Gcz = Gz + jnp.where(okz, -(Gx * cx2 + Gy * cy2) * fd * zi * zi, 0.0)

    # h = R_d^T G
    hx = Rd[0, 0] * Gcx + Rd[1, 0] * Gcy + Rd[2, 0] * Gcz
    hy = Rd[0, 1] * Gcx + Rd[1, 1] * Gcy + Rd[2, 1] * Gcz
    hz = Rd[0, 2] * Gcx + Rd[1, 2] * Gcy + Rd[2, 2] * Gcz
    # a = h x w (omega_src block; omega_dst = -a)
    a_x = hy * wz - hz * wy
    a_y = hz * wx - hx * wz
    a_z = hx * wy - hy * wx
    # b = -R_s h (t_src block)
    b_x = -(Rs[0, 0] * hx + Rs[0, 1] * hy + Rs[0, 2] * hz)
    b_y = -(Rs[1, 0] * hx + Rs[1, 1] * hy + Rs[1, 2] * hz)
    b_z = -(Rs[2, 0] * hx + Rs[2, 1] * hy + Rs[2, 2] * hz)
    P = jnp.stack([a_x, a_y, a_z, b_x, b_y, b_z, Gcx, Gcy, Gcz], axis=0)
    return r, P


# Column map expanding the condensed [9] block rows (a, b, G) to the
# 12 local DoF [omega_src | t_src | omega_dst | t_dst] = [a | b | -a | G].
_ANALYTIC_COLS = np.array([0, 1, 2, 3, 4, 5, 0, 1, 2, 6, 7, 8])
_ANALYTIC_SIGNS = np.array([1.0, 1, 1, 1, 1, 1, -1, -1, -1, 1, 1, 1])


def _pair_blocks_analytic(problem: SBAProblem, opt: SBAOptions,
                          pair_src, pair_dst, pair_mask):
    """(Hq [Q,12,12], gq [Q,12], cost) via the analytic path."""
    qvecs, tvecs = problem.qvecs, problem.tvecs
    Hm, Wm = problem.depth_maps.shape[-2:]

    def one(ps, pd):
        return _pair_linearize_analytic(
            qvecs[ps], tvecs[ps], qvecs[pd], tvecs[pd],
            problem.cam_params[ps], problem.cam_params[pd], (Hm, Wm),
            problem.pix_xy[:, 0], problem.pix_xy[:, 1],
            problem.src_depth[ps], problem.src_label[ps], opt,
            problem.depth_packed, problem.label_packed, pd * Hm * Wm,
            problem.depth_range[pd, 0], problem.depth_range[pd, 1],
            joint_packed=problem.joint_packed,
            src_code=None if problem.src_code is None
            else problem.src_code[ps])

    r, P = jax.vmap(one)(pair_src, pair_dst)   # r [Q,S], P [Q,9,S]
    s = r * r
    cost = 0.5 * jnp.sum(loss_value(opt.loss, s, opt.loss_scale)
                         * pair_mask[:, None])
    w = pair_mask[:, None] * loss_weight(opt.loss, s, opt.loss_scale)
    sw = jnp.sqrt(w)
    rw = r * sw
    Pw = P * sw[:, None, :]
    M9 = jnp.einsum("qis,qjs->qij", Pw, Pw)
    v9 = jnp.einsum("qis,qs->qi", Pw, rw)
    cols = _ANALYTIC_COLS
    sg = jnp.asarray(_ANALYTIC_SIGNS, r.dtype)
    Hq = M9[:, cols][:, :, cols] * (sg[:, None] * sg[None, :])[None]
    gq = v9[:, cols] * sg[None]
    # Free-parameter masks (gauge/constant poses): identical in effect
    # to masking the J columns before J^T J.
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1),
         problem.free_trans], axis=1)  # [N, 6]
    m12 = jnp.concatenate([free_pose[pair_src], free_pose[pair_dst]],
                          axis=1)      # [Q, 12]
    Hq = Hq * m12[:, :, None] * m12[:, None, :]
    gq = gq * m12
    return Hq, gq, cost


def _use_analytic(problem: SBAProblem, opt: SBAOptions) -> bool:
    return (opt.mode == "soft" and opt.linearize == "analytic"
            and (problem.joint_packed is not None
                 or (problem.depth_packed is not None
                     and problem.label_packed is not None)))


# ---------------------------------------------------------------------------
# Residual fields over all pairs
# ---------------------------------------------------------------------------

def _all_residuals(qvecs, tvecs, problem: SBAProblem, opt: SBAOptions, soft: bool):
    HW = problem.depth_maps.shape[-2:]
    flat_depth = problem.depth_maps.reshape(-1)
    flat_sem = problem.semantic_maps.reshape(-1)

    def one(ps, pd):
        base = pd * HW[0] * HW[1]
        args = (qvecs[ps], tvecs[ps], qvecs[pd], tvecs[pd],
                problem.cam_params[ps], problem.cam_params[pd],
                flat_depth, flat_sem, HW,
                problem.pix_xy, problem.src_depth[ps], problem.src_label[ps])
        if soft:
            return _pair_residual_soft(
                *args, opt,
                depth_packed=problem.depth_packed,
                label_packed=problem.label_packed,
                base=base,
                depth_lo=None if problem.depth_range is None
                else problem.depth_range[pd, 0],
                depth_hi=None if problem.depth_range is None
                else problem.depth_range[pd, 1],
                joint_packed=problem.joint_packed,
                src_code=None if problem.src_code is None
                else problem.src_code[ps])
        return _pair_residual_hard(*args[:9], base, *args[9:], opt)[0]

    r = jax.vmap(one)(problem.pair_src, problem.pair_dst)  # [Q, S]
    return r * problem.pair_mask[:, None]


def evaluate_hard(problem: SBAProblem, opt: Optional[SBAOptions] = None):
    """Reference-parity evaluation: robust cost + status counts."""
    opt = opt or SBAOptions()
    HW = problem.depth_maps.shape[-2:]
    flat_depth = problem.depth_maps.reshape(-1)
    flat_sem = problem.semantic_maps.reshape(-1)

    def one(ps, pd):
        return _pair_residual_hard(
            problem.qvecs[ps], problem.tvecs[ps], problem.qvecs[pd], problem.tvecs[pd],
            problem.cam_params[ps], problem.cam_params[pd],
            flat_depth, flat_sem, HW, pd * HW[0] * HW[1],
            problem.pix_xy, problem.src_depth[ps], problem.src_label[ps], opt)

    r, status = jax.vmap(one)(problem.pair_src, problem.pair_dst)
    m = problem.pair_mask[:, None]
    r = r * m
    s = r * r
    cost = 0.5 * jnp.sum(loss_value(opt.loss, s, opt.loss_scale) * m)
    mb = m > 0
    return dict(
        cost=cost,
        num_valid=jnp.sum((status == VALID) & mb),
        num_out_of_bounds=jnp.sum((status == OUT_OF_BOUNDS) & mb),
        num_invalid_depth=jnp.sum((status == INVALID_DEPTH) & mb),
        num_label_mismatch=jnp.sum((r > 0.5) & mb),
        residuals=r,
        status=status,
    )


def _cost(qvecs, tvecs, problem, opt, soft: bool):
    r = _all_residuals(qvecs, tvecs, problem, opt, soft)
    s = r * r
    return 0.5 * jnp.sum(loss_value(opt.loss, s, opt.loss_scale)
                         * problem.pair_mask[:, None])


# ---------------------------------------------------------------------------
# Pose-only LM with dense normal equations from per-pair 12x12 blocks
# ---------------------------------------------------------------------------

def _pair_jacobians(problem: SBAProblem, opt: SBAOptions,
                    pair_src=None, pair_dst=None, pair_mask=None):
    """r [Q,S] and J [Q,S,12] wrt the 12 local DoF (src 6, dst 6).

    pair_src/pair_dst/pair_mask default to the problem's full pair list;
    the chunked large-Q path (`_linearize_system`) passes slices."""
    if pair_src is None:
        pair_src = problem.pair_src
        pair_dst = problem.pair_dst
        pair_mask = problem.pair_mask
    qvecs, tvecs = problem.qvecs, problem.tvecs

    HW = problem.depth_maps.shape[-2:]
    flat_depth = problem.depth_maps.reshape(-1)
    flat_sem = problem.semantic_maps.reshape(-1)

    def pair_fn(d_src, d_dst, ps, pd):
        q_s = quat_retract(qvecs[ps], d_src[:3])
        t_s = tvecs[ps] + d_src[3:]
        q_d = quat_retract(qvecs[pd], d_dst[:3])
        t_d = tvecs[pd] + d_dst[3:]
        base = pd * HW[0] * HW[1]
        args = (q_s, t_s, q_d, t_d,
                problem.cam_params[ps], problem.cam_params[pd],
                flat_depth, flat_sem, HW,
                problem.pix_xy, problem.src_depth[ps], problem.src_label[ps])
        if opt.mode == "soft":
            return _pair_residual_soft(
                *args, opt,
                depth_packed=problem.depth_packed,
                label_packed=problem.label_packed,
                base=base,
                depth_lo=None if problem.depth_range is None
                else problem.depth_range[pd, 0],
                depth_hi=None if problem.depth_range is None
                else problem.depth_range[pd, 1],
                joint_packed=problem.joint_packed,
                src_code=None if problem.src_code is None
                else problem.src_code[ps])
        return _pair_residual_hard(*args[:9], base, *args[9:], opt)[0]

    z6 = jnp.zeros(6, problem.tvecs.dtype)

    if opt.mode == "soft":
        def one(ps, pd):
            r = pair_fn(z6, z6, ps, pd)
            js, jd = jax.jacfwd(pair_fn, argnums=(0, 1))(z6, z6, ps, pd)
            return r, jnp.concatenate([js, jd], axis=-1)
    else:
        # Numeric central differences over the 12 local DoF — the batched
        # equivalent of ceres::NumericDiffCostFunction<..., CENTRAL>
        # (ref: src/base/semantic_cost_functions.h:254-257).
        h = opt.numeric_step

        def one(ps, pd):
            r = pair_fn(z6, z6, ps, pd)

            def col(i):
                e = jnp.zeros(12, problem.tvecs.dtype).at[i].set(h)
                rp = pair_fn(e[:6], e[6:], ps, pd)
                rm = pair_fn(-e[:6], -e[6:], ps, pd)
                return (rp - rm) / (2.0 * h)

            J = jax.vmap(col)(jnp.arange(12))  # [12, S]
            return r, jnp.moveaxis(J, 0, -1)

    r, J = jax.vmap(one)(pair_src, pair_dst)
    # Robust cost at the linearization point — a free byproduct (the
    # evaluate-at-proposal LM loop uses it as the trial cost, saving a
    # separate residual pass per iteration).
    s = r * r
    cost = 0.5 * jnp.sum(loss_value(opt.loss, s, opt.loss_scale)
                         * pair_mask[:, None])
    # Mask + IRLS weights.
    w = pair_mask[:, None] * loss_weight(opt.loss, s, opt.loss_scale)
    sw = jnp.sqrt(w)
    r = r * sw
    J = J * sw[..., None]
    # Free-parameter masks.
    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1), problem.free_trans],
        axis=1)  # [N, 6]
    msrc = free_pose[pair_src][:, None, :]  # [Q,1,6]
    mdst = free_pose[pair_dst][:, None, :]
    J = J * jnp.concatenate([msrc, mdst], axis=-1)
    return r, J, cost


def _assemble_dense(problem: SBAProblem, r, J,
                    pair_src=None, pair_dst=None):
    """Scatter per-pair (r, J) into dense H [6N,6N], g [6N]."""
    Hq = jnp.einsum("qsi,qsj->qij", J, J)        # [Q,12,12]
    gq = jnp.einsum("qsi,qs->qi", J, r)          # [Q,12]
    return _assemble_from_blocks(problem, Hq, gq, pair_src, pair_dst)


def _assemble_from_blocks(problem: SBAProblem, Hq, gq,
                          pair_src=None, pair_dst=None):
    """Scatter per-pair 12x12 blocks into dense H [6N,6N], g [6N]."""
    N = problem.qvecs.shape[0]
    H = jnp.zeros((N, 6, N, 6), Hq.dtype)
    g = jnp.zeros((N, 6), Hq.dtype)
    ps = problem.pair_src if pair_src is None else pair_src
    pd = problem.pair_dst if pair_dst is None else pair_dst
    H = H.at[ps, :, ps, :].add(Hq[:, :6, :6])
    H = H.at[ps, :, pd, :].add(Hq[:, :6, 6:])
    H = H.at[pd, :, ps, :].add(Hq[:, 6:, :6])
    H = H.at[pd, :, pd, :].add(Hq[:, 6:, 6:])
    g = g.at[ps].add(gq[:, :6])
    g = g.at[pd].add(gq[:, 6:])
    return H.reshape(6 * N, 6 * N), g.reshape(6 * N)


# Auto pair-chunking threshold: one chunk's residual/Jacobian tensor is
# ~chunk*S*12 floats plus warp intermediates; 4M (pair, pixel) samples
# per chunk keeps peak memory ~1-2 GB regardless of Q (the 50-image
# production shape Q=2450, S=3072 = 7.5M just exceeds one chunk; 100
# images Q=9900 without chunking OOMs the remote compiler).
_SBA_CHUNK_SAMPLES = 4_000_000


def _linearize_system(problem: SBAProblem, opt: SBAOptions):
    """(H [6N,6N], g [6N], cost) with automatic pair chunking at large Q.

    The reference builds one Ceres problem with O(Q*S) residual blocks
    and lets sparse solvers page through it; the TPU equivalent is a
    lax.scan over fixed-size pair chunks accumulating the dense pose
    system — peak memory is one chunk, wall time unchanged (same total
    FLOPs, fewer but reused buffers)."""
    Q = problem.pair_src.shape[0]
    S = problem.pix_xy.shape[0]
    analytic = _use_analytic(problem, opt)
    chunk = getattr(opt, "pair_chunk", 0)
    if chunk <= 0:
        chunk = max(1, _SBA_CHUNK_SAMPLES // max(S, 1))

    def lin(src, dst, msk):
        if analytic:
            Hq, gq, c = _pair_blocks_analytic(problem, opt, src, dst,
                                              msk)
        else:
            r, J, c = _pair_jacobians(problem, opt, src, dst, msk)
            Hq = jnp.einsum("qsi,qsj->qij", J, J)
            gq = jnp.einsum("qsi,qs->qi", J, r)
        Hb, gb = _assemble_from_blocks(problem, Hq, gq, src, dst)
        return Hb, gb, c

    if Q <= chunk:
        return lin(problem.pair_src, problem.pair_dst, problem.pair_mask)

    nch = -(-Q // chunk)
    pad = nch * chunk - Q
    ps = jnp.concatenate([problem.pair_src,
                          jnp.zeros(pad, problem.pair_src.dtype)])
    pd = jnp.concatenate([problem.pair_dst,
                          jnp.zeros(pad, problem.pair_dst.dtype)])
    pm = jnp.concatenate([problem.pair_mask,
                          jnp.zeros(pad, problem.pair_mask.dtype)])
    ps = ps.reshape(nch, chunk)
    pd = pd.reshape(nch, chunk)
    pm = pm.reshape(nch, chunk)

    N = problem.qvecs.shape[0]
    dt = problem.tvecs.dtype

    def step(carry, blk):
        H, g, cost = carry
        src, dst, msk = blk
        Hb, gb, c = lin(src, dst, msk)
        return (H + Hb, g + gb, cost + c), None

    init = (jnp.zeros((6 * N, 6 * N), dt), jnp.zeros(6 * N, dt),
            jnp.zeros((), dt))
    (H, g, cost), _ = jax.lax.scan(step, init, (ps, pd, pm))
    return H, g, cost


def _linearize_global(problem: SBAProblem, opt: SBAOptions):
    """`_linearize_system` + the SPMD psum of (H, g, cost) when the
    pair list is sharded over opt.axis_name."""
    H, g, cost = _linearize_system(problem, opt)
    if opt.axis_name is not None:
        H = jax.lax.psum(H, opt.axis_name)
        g = jax.lax.psum(g, opt.axis_name)
        cost = jax.lax.psum(cost, opt.axis_name)
    return H, g, cost


def _sba_solve(problem: SBAProblem, opt: SBAOptions):
    N = problem.qvecs.shape[0]
    max_it = opt.max_iterations

    free_pose = jnp.concatenate(
        [jnp.repeat(problem.free_rot[:, None], 3, axis=1), problem.free_trans],
        axis=1).reshape(-1)

    def solve(H, g, lam):
        d = jnp.clip(jnp.diag(H), 1e-6, 1e32)
        Hd = H + jnp.diag(lam * d + (1.0 - free_pose))
        delta = -jax.scipy.linalg.solve(Hd, g, assume_a="pos") * free_pose
        predicted = -(jnp.dot(g, delta)
                      + 0.5 * jnp.dot(delta, H @ delta)
                      + 0.5 * jnp.sum(lam * d * delta * delta))
        return delta, predicted

    def propose(q, t, delta):
        du = delta.reshape(N, 6)
        return quat_retract(q, du[:, :3]), t + du[:, 3:]

    # Evaluate-at-proposal LM: each iteration runs ONE linearization pass
    # (at the pending proposal) whose residuals double as the trial cost;
    # on acceptance the pass's (H, g) seed the next solve, on rejection
    # the base linearization is reused with a larger lambda. Legal here
    # because the normal equations carry no baked-in damping (lambda is
    # applied at solve time) — unlike the fused BA path's whitened Schur
    # kernels. Halves the map-gather passes per iteration vs the
    # classic linearize + separate-trial-cost loop.
    lam0 = jnp.asarray(1.0 / opt.initial_trust_radius,
                       problem.tvecs.dtype)
    H0, g0, cost0 = _linearize_global(problem, opt)
    delta0, pred0 = solve(H0, g0, lam0)
    qp0, tp0 = propose(problem.qvecs, problem.tvecs, delta0)

    def body(state):
        (it, q, t, cost, H, g, qp, tp, pred, step_norm, lam, nu, done,
         trace) = state
        prob = problem._replace(qvecs=qp, tvecs=tp)
        Hn, gn, cost_prop = _linearize_global(prob, opt)

        actual = cost - cost_prop
        rho = actual / jnp.maximum(pred, 1e-30)
        accept = (actual > 0) & (pred > 0)

        lam = jnp.where(accept,
                        jnp.maximum(lam * jnp.maximum(
                            1.0 / 3.0, 1.0 - (2 * rho - 1.0) ** 3), 1e-14),
                        jnp.minimum(lam * nu, 1e10))
        nu = jnp.where(accept, 2.0, nu * 2.0)

        H = jnp.where(accept, Hn, H)
        g = jnp.where(accept, gn, g)
        q = jnp.where(accept, qp, q)
        t = jnp.where(accept, tp, t)
        cost_new = jnp.where(accept, cost_prop, cost)

        g_inf = jnp.max(jnp.abs(g))
        done = ((accept & (jnp.abs(actual)
                           < opt.function_tolerance
                           * jnp.maximum(cost, 1e-30)))
                | (g_inf < opt.gradient_tolerance)
                | (accept & (step_norm < opt.parameter_tolerance
                             * (1.0 + jnp.linalg.norm(t))))
                | (lam >= 1e10))

        delta, pred2 = solve(H, g, lam)
        qp2, tp2 = propose(q, t, delta)
        trace = trace.at[it + 1].set(cost_new)
        return (it + 1, q, t, cost_new, H, g, qp2, tp2, pred2,
                jnp.linalg.norm(delta), lam, nu, done, trace)

    def cond(state):
        it = state[0]
        done = state[-2]
        return (it < max_it) & (~done)

    trace0 = jnp.full((max_it + 1,), jnp.nan, cost0.dtype).at[0].set(cost0)
    init = (0, problem.qvecs, problem.tvecs, cost0, H0, g0, qp0, tp0,
            pred0, jnp.linalg.norm(delta0), lam0,
            jnp.asarray(2.0, cost0.dtype), jnp.asarray(False), trace0)
    (it, q, t, cost, H, g, qp, tp, pred, step_norm, lam, nu, done,
     trace) = jax.lax.while_loop(cond, body, init)

    out = problem._replace(qvecs=q, tvecs=t)
    hard = evaluate_hard(out, opt)
    num_res = (jnp.sum(problem.pair_mask)
               * problem.pix_xy.shape[0]).astype(jnp.int32)
    counts = (num_res, hard["num_valid"], hard["num_out_of_bounds"],
              hard["num_invalid_depth"], hard["num_label_mismatch"])
    if opt.axis_name is not None:
        counts = jax.lax.psum(counts, opt.axis_name)
    num_res, n_valid, n_oob, n_bad_depth, n_mismatch = counts
    summary = SBASummary(
        initial_cost=cost0, final_cost=cost, num_iterations=it,
        num_residuals=num_res,
        cost_trace=trace,
        num_valid=n_valid, num_out_of_bounds=n_oob,
        num_invalid_depth=n_bad_depth,
        num_label_mismatch=n_mismatch)
    return out, summary


_sba_impl = functools.partial(jax.jit, static_argnames=("opt",))(_sba_solve)


def semantic_bundle_adjust(problem: SBAProblem, options: Optional[SBAOptions] = None):
    return _sba_impl(problem, options or SBAOptions())


# ---------------------------------------------------------------------------
# Problem construction
# ---------------------------------------------------------------------------

def build_sba_problem(qvecs, tvecs, cam_params, depth_maps, semantic_maps,
                      options: Optional[SBAOptions] = None,
                      pairs=None, dtype=jnp.float64) -> SBAProblem:
    """Assemble from pose arrays + stacked maps.

    The pixel grid mirrors the reference's strided double loop
    (ref .cc:796-799): x, y in steps of `pixel_step` over the full map.
    Gauge fixing follows the SBA controller: pose 0 fully constant, tvec x
    of image 1 constant (ref: controllers/semantic_bundle_adjustment.cc:106-109).
    """
    opt = options or SBAOptions()
    qvecs = np.asarray(qvecs)
    N = qvecs.shape[0]
    Hm, Wm = np.asarray(depth_maps).shape[-2:]

    ys = np.arange(0, Hm, opt.pixel_step)
    xs = np.arange(0, Wm, opt.pixel_step)
    gx, gy = np.meshgrid(xs, ys)
    pix = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [S, 2]

    depth_np = np.asarray(depth_maps)
    sem_np = np.asarray(semantic_maps)
    src_depth = depth_np[:, pix[:, 1], pix[:, 0]]
    src_label = sem_np[:, pix[:, 1], pix[:, 0]]

    if pairs is None:
        pairs = [(i, j) for i in range(N) for j in range(N) if i != j]
    pair_src = np.array([p[0] for p in pairs], np.int32)
    pair_dst = np.array([p[1] for p in pairs], np.int32)

    free_rot = np.ones(N)
    free_trans = np.ones((N, 3))
    free_rot[0] = 0.0
    free_trans[0] = 0.0
    if N > 1:
        free_trans[1, 0] = 0.0

    # Packed neighborhood maps for the f32 production path (f64 keeps
    # the exact unpacked gathers for numeric-parity tests). When the
    # label palette has <= 8 distinct values the JOINT packing (one
    # gather per sample, round 5) is built instead of the two-gather u8
    # maps.
    packed_ok = (dtype == jnp.float32 and sem_np.min() >= 0
                 and sem_np.max() <= 255)
    depth_packed = label_packed = depth_range = None
    joint_packed = src_code = None
    palette = np.unique(sem_np)
    if packed_ok and palette.size <= JOINT_MAX_LABELS:
        code_maps = np.searchsorted(palette, sem_np)
        packs = [pack_joint_nbhd(depth_np[i], code_maps[i])
                 for i in range(N)]
        joint_packed = jnp.asarray(
            np.stack([p[0] for p in packs]).reshape(-1))
        depth_range = jnp.asarray(
            np.array([[p[1], p[2]] for p in packs], np.float32))
        src_code = jnp.asarray(
            code_maps[:, pix[:, 1], pix[:, 0]].astype(np.int32))
    elif packed_ok:
        packs = [pack_depth_nbhd_u8(depth_np[i]) for i in range(N)]
        depth_packed = jnp.asarray(
            np.stack([p[0] for p in packs]).reshape(-1))
        depth_range = jnp.asarray(
            np.array([[p[1], p[2]] for p in packs], np.float32))
        label_packed = jnp.asarray(
            np.stack([pack_label_neighborhood(sem_np[i].astype(np.int64))
                      for i in range(N)]).reshape(-1))

    return SBAProblem(
        qvecs=jnp.asarray(qvecs, dtype), tvecs=jnp.asarray(tvecs, dtype),
        cam_params=jnp.asarray(cam_params, dtype),
        depth_maps=jnp.asarray(depth_np, dtype),
        semantic_maps=jnp.asarray(sem_np, dtype),
        pix_xy=jnp.asarray(pix, dtype),
        src_depth=jnp.asarray(src_depth, dtype),
        src_label=jnp.asarray(src_label, dtype),
        pair_src=jnp.asarray(pair_src), pair_dst=jnp.asarray(pair_dst),
        pair_mask=jnp.ones(len(pairs), dtype),
        free_rot=jnp.asarray(free_rot, dtype),
        free_trans=jnp.asarray(free_trans, dtype),
        depth_packed=depth_packed, label_packed=label_packed,
        depth_range=depth_range,
        joint_packed=joint_packed, src_code=src_code,
    )
