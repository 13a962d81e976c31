"""SIFT feature extraction as batched XLA programs.

Capability parity with ref: src/feature/sift.{h,cc} (`ExtractSiftFeaturesCPU`
sift.cc:406 via VLFeat, `ExtractSiftFeaturesGPU` sift.cc:853 via SiftGPU) and
the vendored lib/SiftGPU + lib/VLFeat/sift.c pipelines — redesigned for TPU:

- The scale-space pyramid is built with separable Gaussian convolutions
  expressed as `lax.conv_general_dilated` (XLA maps these onto the MXU/VPU);
  every octave is a statically-shaped program, octaves form a short Python
  loop at trace time (shapes halve per octave, so each octave is its own
  XLA computation — no dynamic shapes).
- DoG extrema detection is a dense 26-neighbor max/min test (shifted-array
  comparisons fuse into one VPU pass) followed by one Newton step of the
  3D quadratic fit for subpixel localization — instead of VLFeat's serial
  per-pixel scan (lib/VLFeat/sift.c).
- Candidate selection is `top_k` over the dense response map: the dynamic
  "number of keypoints found" of the reference becomes a static
  `max_num_features` budget with a validity mask — the bucketing+masking
  discipline that XLA static shapes require.
- Orientation histograms and 4x4x8 descriptors are computed for all
  keypoints at once: each keypoint bilinearly samples a fixed 16x16 grid of
  pyramid gradients (gather), and trilinear binning is expressed as one-hot
  weight matmuls so the accumulation runs on the MXU.

Keypoint convention matches COLMAP (`src/feature/types.h:43-83`): (x, y,
scale, orientation), x/y in pixels with (0.5, 0.5) pixel-center origin,
orientation clockwise-positive in COLMAP's image frame.

Descriptor normalization: L1_ROOT (default, as ref sift.h:44
`Normalization::L1_ROOT`) or L2; output optionally quantized to uint8 as in
`FeatureDescriptorsToUnsignedByte` (feature/utils.cc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class SiftExtractionOptions:
    """Mirrors ref: src/feature/sift.h:44 `SiftExtractionOptions` (subset
    meaningful on TPU; GPU/threading knobs are obsolete here)."""

    max_image_size: int = 3200
    max_num_features: int = 8192
    first_octave: int = 0            # -1 = 2x upsample first (VLFeat default)
    num_octaves: int = 4
    octave_resolution: int = 3       # scales per octave (S)
    peak_threshold: float = 0.02 / 3.0   # on |DoG|, ref default 0.0066
    edge_threshold: float = 10.0
    max_num_orientations: int = 2    # duplicate keypoint per histogram peak
    upright: bool = False            # single zero orientation
    darkness_adaptivity: bool = False
    normalization: str = "L1_ROOT"   # or "L2"
    # DSP-SIFT (Dong & Soatto): average the descriptor over pooled domain
    # sizes (ref: src/feature/sift.h:97-100 defaults). One vmapped batch
    # over the scale multipliers — the gathers batch, nothing loops.
    domain_size_pooling: bool = False
    dsp_min_scale: float = 1.0 / 6.0
    dsp_max_scale: float = 3.0
    dsp_num_scales: int = 10
    # TPU additions: static shape budgets.
    candidates_per_octave: int = 4096
    # Candidate budget surviving into the orientation/descriptor stages
    # (per octave, ranked by refined |DoG| response). The global
    # max_num_features top-K selects from n_octaves * this.
    desc_candidates_per_octave: int = 1536
    # Gradient sampling for the orientation/descriptor windows:
    # "nearest" (1 gather per sample — classical SIFT bins each PIXEL's
    # gradient with no interpolation, so nearest-tap is the faithful
    # analogue and 4x cheaper on the gather-issue-bound TPU path) or
    # "bilinear" (4 taps, each binned with its bilinear weight).
    grad_sampling: str = "nearest"
    # Affine-covariant shape estimation (ref: src/feature/sift.h:76-78
    # `estimate_affine_shape`, implemented via VLFeat covdet,
    # sift.cc:582): Baumberg second-moment-matrix adaptation batched
    # over all keypoints; orientation/descriptor windows then sample
    # through the per-keypoint affine frame, and keypoints carry the
    # 6-param affine form (feature/types.h:43-83).
    estimate_affine_shape: bool = False
    affine_shape_iters: int = 6
    sigma0: float = 1.6              # base blur of octave 0 level 0
    init_sigma: float = 0.5          # assumed blur of the input image


class SiftFeatures(NamedTuple):
    """Struct-of-arrays feature set for ONE image (static K rows).

    keypoints: [K, 4] (x, y, scale, orientation) f32
    descriptors: [K, 128] f32 (normalized) — quantize with
        `descriptors_to_uint8` for COLMAP-database parity
    mask: [K] bool — valid rows
    response: [K] f32 — |DoG| response (sorting/diagnostics)
    """

    keypoints: jnp.ndarray
    descriptors: jnp.ndarray
    mask: jnp.ndarray
    response: jnp.ndarray
    # estimate_affine_shape only: [K, 4] (a11, a12, a21, a22) of the
    # full affine frame scale * S @ R(orientation), ORIGINAL-image
    # pixels — together with keypoints[:, :2] this is COLMAP's 6-param
    # affine keypoint (ref: feature/types.h:43-83). None otherwise.
    affine: Optional[jnp.ndarray] = None

    @property
    def num_features(self):
        return jnp.sum(self.mask)


# ---------------------------------------------------------------------------
# Gaussian pyramid
# ---------------------------------------------------------------------------


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / max(sigma, 1e-8)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(img, sigma: float):
    """Separable Gaussian blur of [H, W] by static sigma."""
    if sigma < 1e-4:
        return img
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius), img.dtype)
    x = img[None, None, :, :]  # NCHW
    # rows then cols; SAME edge handling via reflect pad (matches the
    # continuation-padding VLFeat uses closely enough for interior features).
    pad = [(0, 0), (0, 0), (radius, radius), (radius, radius)]
    x = jnp.pad(x, pad, mode="edge")
    kr = k[None, None, :, None]
    kc = k[None, None, None, :]
    x = lax.conv_general_dilated(x, kr, (1, 1), "VALID")
    x = lax.conv_general_dilated(x, kc, (1, 1), "VALID")
    return x[0, 0]


def _downsample2(img):
    return img[::2, ::2]


# --- banded-matmul blur (round 5) -------------------------------------------
# The conv-chain pyramid ran ~3 GFLOP/s on v5e (1-channel
# conv_general_dilated gives the MXU nothing to tile) and was 49% of
# extraction time (benchmarks/profile_sift.py). Reformulation: blur every
# level DIRECTLY from the octave base (Gaussian semigroup: sigma_direct =
# sqrt(sigma_total^2 - sigma_base^2)), so all L levels are independent and
# the row pass is ONE [H, W] x [W, L*W] matmul against a precomputed
# edge-clamped banded matrix, the col pass one batched [L, H, H] x
# [L, H, W] matmul. 6.5x measured at the 8x640x480 bench shape
# (benchmarks/pyramid_micro.py). Direct kernels truncate at 4 sigma
# (the incremental chain's repeated 3-sigma truncations compose to a
# slightly different effective kernel; interior agreement ~0.5%).

_BAND_CACHE: dict = {}


def _band_matrix_np(size: int, sigma: float) -> np.ndarray:
    """[size, size] edge-clamped Gaussian blur operator (columns):
    out = M @ in. Host numpy, cached."""
    if sigma < 1e-4:
        return np.eye(size, dtype=np.float32)
    r = max(1, int(math.ceil(4.0 * sigma)))
    k = _gaussian_kernel1d(sigma, r)
    M = np.zeros((size, size), np.float32)
    idx = np.arange(size)
    for t in range(-r, r + 1):
        j = np.clip(idx + t, 0, size - 1)
        np.add.at(M, (idx, j), k[t + r])
    return M


def _blur_banks(H: int, W: int, sigmas: tuple):
    """(rowM [W, L*W], colM [L, H, H]) numpy blur banks, cached."""
    key = (H, W, sigmas)
    hit = _BAND_CACHE.get(key)
    if hit is None:
        rowM = np.concatenate([_band_matrix_np(W, s).T for s in sigmas],
                              axis=1)
        colM = np.stack([_band_matrix_np(H, s) for s in sigmas])
        if len(_BAND_CACHE) > 64:
            _BAND_CACHE.clear()
        hit = _BAND_CACHE[key] = (rowM, colM)
    return hit


def _blur_multi(img, sigmas: tuple):
    """[H, W] -> [L, H, W]: every sigma applied directly to img via the
    banded-matmul formulation (MXU)."""
    H, W = img.shape
    L = len(sigmas)
    rowM, colM = _blur_banks(H, W, sigmas)
    rows = (img @ jnp.asarray(rowM)).reshape(H, L, W).transpose(1, 0, 2)
    return jnp.einsum("lij,ljx->lix", jnp.asarray(colM), rows,
                      preferred_element_type=jnp.float32)


def _blur_matmul(img, sigma: float):
    """Single-sigma banded-matmul blur (pre-blur of the pyramid base)."""
    if sigma < 1e-4:
        return img
    return _blur_multi(img, (float(sigma),))[0]


def _upsample2(img):
    """Bilinear 2x upsample (for first_octave = -1)."""
    h, w = img.shape
    return jax.image.resize(img, (2 * h, 2 * w), method="bilinear")


def build_octave(img, opt: SiftExtractionOptions, impl: str = "matmul"):
    """One octave: returns (gauss [S+3, H, W], dog [S+2, H, W], next_base).

    impl="matmul" (default): all levels blurred directly from the base
    in two banded matmuls (see _blur_multi). impl="conv": the original
    incremental conv chain (kept for A/B validation)."""
    s_levels = opt.octave_resolution
    k = 2.0 ** (1.0 / s_levels)
    if impl == "matmul":
        sig_dir = tuple(
            math.sqrt(max((opt.sigma0 * k ** s) ** 2 - opt.sigma0 ** 2,
                          0.0))
            for s in range(1, s_levels + 3))
        gauss = jnp.concatenate([img[None], _blur_multi(img, sig_dir)])
    else:
        levels = [img]
        sigma_prev = opt.sigma0
        for s in range(1, s_levels + 3):
            sigma_total = opt.sigma0 * (k ** s)
            sigma_delta = math.sqrt(max(sigma_total ** 2
                                        - sigma_prev ** 2, 1e-8))
            levels.append(_blur(levels[-1], sigma_delta))
            sigma_prev = sigma_total
        gauss = jnp.stack(levels)
    dog = gauss[1:] - gauss[:-1]
    # Next octave starts from the level with 2x base blur (index S).
    next_base = _downsample2(gauss[s_levels])
    return gauss, dog, next_base


# ---------------------------------------------------------------------------
# DoG extrema + refinement (dense, per octave)
# ---------------------------------------------------------------------------


def _neighbor_extrema(dog):
    """dog: [L, H, W] -> (is_max, is_min) for levels 1..L-2, shape
    [L-2, H, W]; borders are False. Pure shifted-array comparisons."""
    L, H, W = dog.shape
    c = dog[1:-1]  # centers [L-2, H, W]

    def shifted(a, dy, dx, fill):
        s = jnp.roll(jnp.roll(a, dy, axis=-2), dx, axis=-1)
        # Invalidate wrapped borders.
        if dy:
            idx = jnp.arange(H)
            bad = (idx < dy) if dy > 0 else (idx >= H + dy)
            s = jnp.where(bad[None, :, None], fill, s)
        if dx:
            idx = jnp.arange(W)
            bad = (idx < dx) if dx > 0 else (idx >= W + dx)
            s = jnp.where(bad[None, None, :], fill, s)
        return s

    max_n = jnp.full_like(c, -jnp.inf)
    min_n = jnp.full_like(c, jnp.inf)
    for dl in (-1, 0, 1):
        layer = dog[1 + dl:L - 1 + dl]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dl == 0 and dy == 0 and dx == 0:
                    continue
                max_n = jnp.maximum(max_n, shifted(layer, dy, dx, -jnp.inf))
                min_n = jnp.minimum(min_n, shifted(layer, dy, dx, jnp.inf))
    is_max = c > max_n
    is_min = c < min_n
    return is_max, is_min


def _quadratic_refine(dog, lvl, yy, xx):
    """One Newton step of the 3D quadratic fit at integer extremum
    (lvl, yy, xx) in dog [L, H, W]. Returns (offset [3] (dl, dy, dx),
    refined_value). Batched over leading dims by vmap."""
    L, H, W = dog.shape

    flat = dog.reshape(-1)

    def at(dl, dy, dx):
        # Flat 1-D take: multi-dim advanced indexing of a vmapped-over
        # operand lowers to whole-plane slice gathers on TPU (a
        # [K, 1, H, W] materialization that OOMs at 640x480 batches).
        l = jnp.clip(lvl + dl, 0, L - 1)
        y = jnp.clip(yy + dy, 0, H - 1)
        x = jnp.clip(xx + dx, 0, W - 1)
        return jnp.take(flat, (l * H + y) * W + x)

    v = at(0, 0, 0)
    g = jnp.stack([
        0.5 * (at(1, 0, 0) - at(-1, 0, 0)),
        0.5 * (at(0, 1, 0) - at(0, -1, 0)),
        0.5 * (at(0, 0, 1) - at(0, 0, -1)),
    ])
    hll = at(1, 0, 0) + at(-1, 0, 0) - 2 * v
    hyy = at(0, 1, 0) + at(0, -1, 0) - 2 * v
    hxx = at(0, 0, 1) + at(0, 0, -1) - 2 * v
    hly = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))
    hlx = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    hyx = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
    # Solve H off = -g in closed form (symmetric 3x3 adjugate): the
    # vmapped jnp.linalg.solve was ~137 ms of the 8-image batch (131k
    # tiny LU factorizations; benchmarks/profile_sift_detect.py) — the
    # adjugate is ~30 VPU flops per candidate.
    a, b_, c_ = hll + 1e-12, hly, hlx
    d_, e_ = hyy + 1e-12, hyx
    f_ = hxx + 1e-12
    A00 = d_ * f_ - e_ * e_
    A01 = c_ * e_ - b_ * f_
    A02 = b_ * e_ - c_ * d_
    A11 = a * f_ - c_ * c_
    A12 = b_ * c_ - a * e_
    A22 = a * d_ - b_ * b_
    det = a * A00 + b_ * A01 + c_ * A02
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    off = -inv_det * jnp.stack([
        A00 * g[0] + A01 * g[1] + A02 * g[2],
        A01 * g[0] + A11 * g[1] + A12 * g[2],
        A02 * g[0] + A12 * g[1] + A22 * g[2],
    ])
    off = jnp.clip(off, -0.5, 0.5)
    refined = v + 0.5 * jnp.dot(g, off)
    return off, refined


def _edge_score(dog, lvl, yy, xx):
    """Spatial Hessian edge ratio score tr^2/det at (lvl, yy, xx) of
    dog [L, H, W]. Flat 1-D takes: `dog[lvl]` under vmap gathers a
    whole (1, H, W) plane PER CANDIDATE ([C, 1, H, W] — 40 GB at
    640x480 x8 batch)."""
    L, H, W = dog.shape
    flat = dog.reshape(-1)
    base = lvl * (H * W)

    def at(dy, dx):
        return jnp.take(flat, base + jnp.clip(yy + dy, 0, H - 1) * W
                        + jnp.clip(xx + dx, 0, W - 1))

    v = at(0, 0)
    dyy = at(1, 0) + at(-1, 0) - 2 * v
    dxx = at(0, 1) + at(0, -1) - 2 * v
    dxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
    det = dxx * dyy - dxy * dxy
    tr = dxx + dyy
    return tr * tr / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det), det


# ---------------------------------------------------------------------------
# Orientation + descriptor (batched gathers over keypoints)
# ---------------------------------------------------------------------------


def _gradients(img):
    """Central-difference gradients -> (magnitude, angle) each [H, W]."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-24)
    ang = jnp.arctan2(gy, gx)
    return mag, ang


def _pack_mag_ang(mags, angs):
    """Pack gradient (magnitude, angle) level stacks into ONE u32 map:
    bf16(mag) in the low half, bf16(ang) in the high half. Halves the
    descriptor/orientation sampling gathers (the dominant extraction
    cost: 8 flat takes per sample -> 4 packed takes); bf16 is ample for
    10-degree orientation bins and gaussian-weighted magnitudes."""
    mb = jax.lax.bitcast_convert_type(
        mags.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    ab = jax.lax.bitcast_convert_type(
        angs.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return mb | (ab << 16)


def _bilinear_gather_ma(flat, ys, xs, base, H, W):
    """Bilinear (mag, ang-weights) sampling from a FLAT `_pack_mag_ang`
    buffer; `base` selects the keypoint's own (octave, level) plane and
    `H`/`W` are that octave's plane bounds (traced scalars — the flat
    buffer concatenates every octave, so bounds are per keypoint).
    Angles are NOT interpolated (interpolating across the +-pi
    wrap is wrong anyway); each tap contributes its own angle with its
    bilinear weight — callers receive the four (weighted magnitude,
    angle) taps to bin separately, matching how VLFeat accumulates
    per-tap contributions. Returns (wm [4, ...], ang [4, ...]).

    Uses the rowsel gather (ops/interpolation._take_u32_rowsel, 6.2
    ns/elem vs 11.8 flat) with optimization_barriers between the four
    tap streams (two gathers in one XLA fusion lose the gather-select
    fusion; benchmarks/gather_micro4.py)."""
    from sba_tpu.ops.interpolation import _take_u32_rowsel
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0).astype(jnp.float32)
    fx = (xs - x0).astype(jnp.float32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    wms = []
    angs = []
    for dy, dx, w in ((0, 0, (1 - fy) * (1 - fx)),
                      (0, 1, (1 - fy) * fx),
                      (1, 0, fy * (1 - fx)),
                      (1, 1, fy * fx)):
        yi = y0i + dy
        xi = x0i + dx
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = base + jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        idx = jax.lax.optimization_barrier(idx)
        u = _take_u32_rowsel(flat, idx)
        m = jax.lax.bitcast_convert_type(
            (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(
                jnp.float32)
        a = jax.lax.bitcast_convert_type(
            (u >> 16).astype(jnp.uint16), jnp.bfloat16).astype(
                jnp.float32)
        wms.append(jnp.where(ok, m, 0.0) * w)
        angs.append(a)
    return jnp.stack(wms), jnp.stack(angs)


_N_ORI_BINS = 36


# ---------------------------------------------------------------------------
# Affine shape adaptation (estimate_affine_shape)
# ---------------------------------------------------------------------------


def _spd2_inv_sqrt(a, b, c):
    """Inverse square root of SPD 2x2 [[a, b], [b, c]], closed form
    (sqrt via M^(1/2) = (M + sqrt(det) I) / sqrt(tr + 2 sqrt(det)),
    then the 2x2 adjugate inverse), normalized to det = 1."""
    det = jnp.maximum(a * c - b * b, 1e-20)
    sd = jnp.sqrt(det)
    s = jnp.sqrt(jnp.maximum(a + c + 2.0 * sd, 1e-20))
    # sqrt(M)
    ra = (a + sd) / s
    rb = b / s
    rc = (c + sd) / s
    rdet = jnp.maximum(ra * rc - rb * rb, 1e-20)
    ia = rc / rdet
    ib = -rb / rdet
    ic = ra / rdet
    # normalize to det(W) = 1 so the adaptation preserves area
    idet = jnp.sqrt(jnp.maximum(ia * ic - ib * ib, 1e-20))
    n = jnp.sqrt(idet)
    return ia / n, ib / n, ic / n


def _affine_adapt(flat, kx, ky, ksigma, base, kh, kw, iters: int,
                  sampling: str):
    """Baumberg iteration: adapt each keypoint's measurement region so
    the gradient second-moment matrix in the region becomes isotropic
    (the affine-covariant shape VLFeat covdet computes serially,
    lib/VLFeat/covdet.c). Returns the 2x2 shape S [K, 2, 2] with
    det S = 1 (x_image = center + sigma * S @ x_normalized) and a
    convergence estimate (anisotropy ratio of the LAST moment matrix).
    """
    P = 16
    lin = jnp.linspace(-1.0, 1.0, P)
    oy, ox = jnp.meshgrid(lin, lin, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)
    w_g = jnp.exp(-(ox * ox + oy * oy) / (2 * 0.66 ** 2))  # gaussian

    def one(kxi, kyi, sig, b, ph, pw):
        sa = jnp.ones(())     # S = [[sa, sb], [sb, sc]], symmetric
        sb = jnp.zeros(())
        sc = jnp.ones(())
        rad = 3.0 * sig
        aniso = jnp.ones(())
        for _ in range(iters):
            dx = rad * (sa * ox + sb * oy)
            dy = rad * (sb * ox + sc * oy)
            wm, ang = _gather_ma(flat, kyi + dy, kxi + dx, b, ph, pw,
                                 sampling)
            gx = (wm * jnp.cos(ang)).sum(0)
            gy = (wm * jnp.sin(ang)).sum(0)
            ixx = jnp.sum(w_g * gx * gx)
            ixy = jnp.sum(w_g * gx * gy)
            iyy = jnp.sum(w_g * gy * gy)
            # Second-moment matrix IN THE NORMALIZED FRAME: gradients
            # are image-frame, the normalized-frame gradient is S^T g
            # (chain rule through x_img = c + rad * S x_norm), so
            # mu_n = S^T mu_img S.
            mxx = sa * (sa * ixx + sb * ixy) + sb * (sa * ixy + sb * iyy)
            mxy = sa * (sb * ixx + sc * ixy) + sb * (sb * ixy + sc * iyy)
            myy = sb * (sb * ixx + sc * ixy) + sc * (sb * ixy + sc * iyy)
            tr = mxx + myy + 1e-20
            det = jnp.maximum(mxx * myy - mxy * mxy, 1e-24)
            # anisotropy = ratio of eigenvalues (1 = isotropic)
            disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
            aniso = (tr + disc) / jnp.maximum(tr - disc, 1e-20)
            wa, wb, wc = _spd2_inv_sqrt(mxx / tr, mxy / tr, myy / tr)
            # S <- S @ W (both symmetric; product symmetrized — the
            # rotation ambiguity of the shape is fixed by keeping S
            # symmetric, as covdet does)
            na = sa * wa + sb * wb
            nb2 = sa * wb + sb * wc
            nb1 = sb * wa + sc * wb
            nc = sb * wb + sc * wc
            nb = 0.5 * (nb1 + nb2)
            d = jnp.sqrt(jnp.maximum(na * nc - nb * nb, 1e-20))
            sa, sb, sc = na / jnp.sqrt(d), nb / jnp.sqrt(d), \
                nc / jnp.sqrt(d)
        S = jnp.stack([jnp.stack([sa, sb]), jnp.stack([sb, sc])])
        return S, aniso

    return jax.vmap(one)(kx, ky, ksigma, base, kh, kw)


def _nearest_gather_ma(flat, ys, xs, base, H, W):
    """Nearest-pixel (mag, ang) sampling from a flat `_pack_mag_ang`
    buffer — the 1-tap counterpart of `_bilinear_gather_ma` (same
    return shape with a singleton tap axis). Classical SIFT
    (lib/VLFeat/sift.c, SiftGPU) bins each integer PIXEL's gradient
    with no resampling, so nearest taps are the faithful analogue; on
    TPU they also cost 4x fewer gather issues, which is what bounds
    the orientation/descriptor stages."""
    from sba_tpu.ops.interpolation import _take_u32_rowsel

    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
    idx = base + jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
    u = _take_u32_rowsel(flat, idx)
    m = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    a = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    return jnp.where(ok, m, 0.0)[None], a[None]


def _gather_ma(flat, ys, xs, base, H, W, sampling):
    if sampling == "nearest":
        return _nearest_gather_ma(flat, ys, xs, base, H, W)
    return _bilinear_gather_ma(flat, ys, xs, base, H, W)


def _orientation_histograms(flat, kx, ky, ksigma, base, kh, kw,
                            sampling="nearest", shape=None):
    """36-bin gaussian-weighted orientation histograms for all keypoints.
    `flat` is a flat `_pack_mag_ang` buffer over every octave's level
    stack; `base` [K] = octave offset + level*H*W selects each
    keypoint's own plane, `kh`/`kw` [K] its plane bounds. kx/ky in that
    octave's pixels, ksigma = level-relative scale. Returns [K, 36]
    smoothed histograms.

    Ref behavior: VLFeat vl_sift_calc_keypoint_orientations
    (lib/VLFeat/sift.c) — window radius 3*1.5*sigma, gaussian weight
    sigma_w = 1.5*sigma, 36 bins, 6 box-smoothing passes. Each bilinear
    TAP contributes its own (weighted magnitude, angle) — per-tap
    binning, like VLFeat's pixel-wise accumulation (interpolating the
    angle map across the +-pi wrap would be wrong).
    """
    P = 16  # fixed sample grid per keypoint (static shape)
    # Sample offsets cover radius 3 * 1.5 * sigma.
    lin = jnp.linspace(-1.0, 1.0, P)
    oy, ox = jnp.meshgrid(lin, lin, indexing="ij")
    oy = oy.reshape(-1)
    ox = ox.reshape(-1)

    def one(kxi, kyi, sig, b, ph, pw, S2):
        rad = 3.0 * 1.5 * sig
        if S2 is None:
            dx = ox * rad
            dy = oy * rad
        else:  # affine measurement region (estimate_affine_shape)
            dx = rad * (S2[0, 0] * ox + S2[0, 1] * oy)
            dy = rad * (S2[1, 0] * ox + S2[1, 1] * oy)
        ys = kyi + dy
        xs = kxi + dx
        wm, a = _gather_ma(flat, ys, xs, b, ph, pw, sampling)  # [T, S]
        w = jnp.exp(-0.5 * ((oy * rad) ** 2 + (ox * rad) ** 2)
                    / (1.5 * sig + 1e-9) ** 2)
        # Soft binning into 36 bins (linear interp between adjacent bins).
        binf = (a % (2 * jnp.pi)) / (2 * jnp.pi) * _N_ORI_BINS
        b0 = jnp.floor(binf)
        fb = binf - b0
        b0i = b0.astype(jnp.int32) % _N_ORI_BINS
        b1i = (b0i + 1) % _N_ORI_BINS
        wm = (w[None] * wm)
        return wm * (1 - fb), b0i, wm * fb, b1i

    if shape is None:
        w0, b0i, w1, b1i = jax.vmap(
            lambda a_, b_, c_, d_, e_, f_: one(a_, b_, c_, d_, e_, f_,
                                               None))(
            kx, ky, ksigma, base, kh, kw)
    else:
        w0, b0i, w1, b1i = jax.vmap(one)(kx, ky, ksigma, base, kh, kw,
                                         shape)
    # Histogram via 36 masked reductions, NOT scatter-add: the vmapped
    # [K] x .at[bins].add scatter measured 1.56 s of the 1.93 s 8-image
    # 640x480 extraction (TPU scatters serialize); the compare-mask
    # sums are plain VPU reductions.
    bins = jnp.arange(_N_ORI_BINS, dtype=jnp.int32)
    hists = sum(
        jnp.where(bi[..., None] == bins[None, None, None, :],
                  wi[..., None], 0.0).sum(axis=(1, 2))
        for bi, wi in ((b0i, w0), (b1i, w1)))  # [K, 36]
    # 6 circular box-smoothing passes (VLFeat behavior).
    for _ in range(6):
        hists = (jnp.roll(hists, 1, axis=-1) + hists
                 + jnp.roll(hists, -1, axis=-1)) / 3.0
    return hists


def _histogram_peaks(hists, max_peaks: int):
    """Peak orientations from [K, 36] histograms with parabolic refinement.
    Returns (orients [K, max_peaks], valid [K, max_peaks])."""
    left = jnp.roll(hists, 1, axis=-1)
    right = jnp.roll(hists, -1, axis=-1)
    is_peak = (hists > left) & (hists > right)
    peak_max = jnp.max(hists, axis=-1, keepdims=True)
    # 80% rule as in VLFeat/SiftGPU.
    strong = is_peak & (hists >= 0.8 * peak_max)
    score = jnp.where(strong, hists, -jnp.inf)
    vals, idx = lax.top_k(score, max_peaks)
    valid = jnp.isfinite(vals) & (vals > 0)
    # Parabolic sub-bin refinement.
    l = jnp.take_along_axis(left, idx, axis=-1)
    r = jnp.take_along_axis(right, idx, axis=-1)
    c = vals
    denom = l - 2 * c + r
    dbin = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
    orient = (idx.astype(hists.dtype) + dbin + 0.5) \
        * (2 * jnp.pi / _N_ORI_BINS)
    return orient % (2 * jnp.pi), valid


_D_SPATIAL = 4   # 4x4 spatial histograms
_D_ORI = 8       # 8 orientation bins
_D_GRID = 16     # 16x16 sample grid


def _descriptors(flat, kx, ky, ksigma, korient, base, kh, kw, opt=None,
                 shape=None):
    """128-D SIFT descriptors for all keypoints (`flat` = flat
    `_pack_mag_ang` buffer over every octave, `base` [K] per-keypoint
    plane offsets, `kh`/`kw` [K] per-keypoint plane bounds).

    Each keypoint samples a rotated 16x16 grid spanning the standard
    window (width = 3*sigma per spatial bin * 4 bins), then trilinear
    binning into 4x4x8 is done with one-hot weight matmuls (MXU-friendly:
    [K, 256, 8+16] one-hots contract over the 256 samples).
    Ref math: lib/VLFeat/sift.c vl_sift_calc_keypoint_descriptor /
    SiftGPU descriptor kernels.
    """
    sampling = getattr(opt, "grad_sampling", "nearest") if opt else "nearest"
    P = _D_GRID
    # Normalized sample coords in descriptor frame: [-2, 2) spatial bins.
    lin = (jnp.arange(P) + 0.5) / P * 4.0 - 2.0  # bin units
    by, bx = jnp.meshgrid(lin, lin, indexing="ij")
    by = by.reshape(-1)
    bx = bx.reshape(-1)  # [256]

    def one(kxi, kyi, sig, ori, b, ph, pw, S2=None):
        spb = 3.0 * sig  # pixels per spatial bin
        ca = jnp.cos(ori)
        sa = jnp.sin(ori)
        # Rotate descriptor frame into image frame (then through the
        # affine shape when estimate_affine_shape produced one —
        # gradient ANGLES keep the rotation-only correction, the
        # standard covdet approximation for moderate anisotropy).
        rx = ca * bx - sa * by
        ry = sa * bx + ca * by
        if S2 is not None:
            rx, ry = (S2[0, 0] * rx + S2[0, 1] * ry,
                      S2[1, 0] * rx + S2[1, 1] * ry)
        xs = kxi + rx * spb
        ys = kyi + ry * spb
        wm_t, a_t = _gather_ma(flat, ys, xs, b, ph, pw,
                               sampling)  # [T, 256]
        a_t = a_t - ori
        w = jnp.exp(-(bx * bx + by * by) / (2 * (2.0 ** 2)))  # gaussian
        wm_t = wm_t * w[None]  # [4, 256]

        # Trilinear weights: spatial (y bin, x bin) and orientation bin.
        def spatial_onehot(v):
            # v in bin units [-2, 2); centers at -1.5,-0.5,.5,1.5.
            centers = jnp.arange(_D_SPATIAL) - 1.5
            d = 1.0 - jnp.abs(v[:, None] - centers[None, :])
            return jnp.maximum(d, 0.0)  # [256, 4]

        wy = spatial_onehot(by)
        wx = spatial_onehot(bx)
        wyx = jnp.einsum("sy,sx->syx", wy, wx).reshape(256, 16)
        binf = (a_t % (2 * jnp.pi)) / (2 * jnp.pi) * _D_ORI
        b0 = jnp.floor(binf)
        fb = binf - b0
        b0i = b0.astype(jnp.int32) % _D_ORI
        onehot0 = jax.nn.one_hot(b0i, _D_ORI, dtype=jnp.float32)
        onehot1 = jax.nn.one_hot((b0i + 1) % _D_ORI, _D_ORI,
                                 dtype=jnp.float32)
        wo = (onehot0 * (1 - fb)[..., None]
              + onehot1 * fb[..., None])                 # [4, 256, 8]
        # desc[yx, o] = sum_{t,s} wm wyx wo (per-tap orientation bins).
        desc = jnp.einsum("tso,sk,ts->ko",
                          wo, wyx, wm_t)                 # [16, 8]
        return desc.reshape(-1)

    if opt is not None and opt.domain_size_pooling:
        # DSP-SIFT: mean descriptor over pooled domain sizes
        # (ref: src/feature/sift.h:97-100; VLFeat dsp implementation).
        scales = jnp.linspace(opt.dsp_min_scale, opt.dsp_max_scale,
                              opt.dsp_num_scales, dtype=jnp.float32)

        def pooled(kxi, kyi, sig, ori, b, ph, pw):
            d = jax.vmap(
                lambda s: one(kxi, kyi, sig * s, ori, b, ph, pw))(scales)
            return jnp.mean(d, axis=0)

        return jax.vmap(pooled)(kx, ky, ksigma, korient, base, kh, kw)

    if shape is not None:
        return jax.vmap(one)(kx, ky, ksigma, korient, base, kh, kw,
                             shape)
    return jax.vmap(one)(kx, ky, ksigma, korient, base, kh, kw)


def _normalize_descriptors(desc, normalization: str):
    """L2 -> clip 0.2 -> renorm; then L1_ROOT if requested
    (ref: feature/utils.cc L1RootNormalizeFeatureDescriptors)."""
    n = jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12
    d = jnp.clip(desc / n, 0.0, 0.2)
    n2 = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
    d = d / n2
    if normalization.upper() == "L1_ROOT":
        s = jnp.sum(jnp.abs(d), axis=-1, keepdims=True) + 1e-12
        d = jnp.sqrt(d / s)
    return d


def descriptors_to_uint8(desc):
    """f32 descriptors -> COLMAP-database uint8 (x512, clamp 255;
    ref: feature/utils.cc FeatureDescriptorsToUnsignedByte)."""
    return jnp.clip(jnp.round(512.0 * desc), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------


def _detect_octave(base, opt: SiftExtractionOptions):
    """Detection stages of ONE octave: pyramid, DoG extrema, quadratic
    refinement, peak/edge gating, per-octave candidate cut — everything
    that is cheap and shape-tied to this octave. Returns
    (cand dict of [C] arrays in OCTAVE pixels, packed_flat gradient
    buffer [S*H*W] u32, (H, W), next_base). The expensive
    orientation/descriptor gathers happen ONCE over the global top-K
    candidates of all octaves (see `extract_sift`) — the global ranking
    key (refined |DoG|) is already known here, so there is no reason to
    sample 16x16 windows for candidates the final top-K will drop."""
    S = opt.octave_resolution
    gauss, dog, next_base = build_octave(base, opt)
    L, H, W = dog.shape
    C = min(opt.candidates_per_octave, (L - 2) * H * W)

    is_max, is_min = _neighbor_extrema(dog)
    c = dog[1:-1]
    extremum = (is_max | is_min) & (jnp.abs(c) > 0.8 * opt.peak_threshold)
    score = jnp.where(extremum, jnp.abs(c), 0.0)
    flat = score.reshape(-1)
    vals, idx = lax.top_k(flat, C)
    lvl = idx // (H * W) + 1
    rem = idx % (H * W)
    yy = rem // W
    xx = rem % W
    cand_valid = vals > 0

    off, refined = jax.vmap(lambda l, y, x: _quadratic_refine(dog, l, y, x))(
        lvl, yy, xx)
    peak_ok = jnp.abs(refined) > opt.peak_threshold
    edge, det = _edge_score(dog, lvl, yy, xx)
    et = opt.edge_threshold
    edge_ok = (det > 0) & (edge < (et + 1.0) ** 2 / et)
    border = 4
    inside = ((yy >= border) & (yy < H - border)
              & (xx >= border) & (xx < W - border))
    valid = cand_valid & peak_ok & edge_ok & inside

    # Per-octave candidate cut before concatenation: keep the top
    # `desc_candidates_per_octave` by refined response among survivors.
    D = min(getattr(opt, "desc_candidates_per_octave", 1536), C)
    dscore = jnp.where(valid, jnp.abs(refined), -jnp.inf)
    _, keep = lax.top_k(dscore, D)
    lvl = lvl[keep]
    off = off[keep]
    refined = refined[keep]
    valid = valid[keep]
    yy = yy[keep]
    xx = xx[keep]

    fl = lvl.astype(dog.dtype) + off[:, 0]
    fy = yy.astype(dog.dtype) + off[:, 1]
    fx = xx.astype(dog.dtype) + off[:, 2]
    sigma_level = opt.sigma0 * 2.0 ** (fl / S)  # octave-relative

    # Gradient maps of the inner levels, packed (bf16 mag | bf16 ang)
    # and flattened: every per-keypoint sample downstream is ONE flat
    # gather with a (octave offset + level*H*W) base.
    inner_levels = list(range(1, S + 1))
    grads = [_gradients(gauss[s]) for s in inner_levels]
    packed = _pack_mag_ang(jnp.stack([g[0] for g in grads]),
                           jnp.stack([g[1] for g in grads]))
    cand = dict(fx=fx, fy=fy, sigma=sigma_level,
                resp=jnp.abs(refined), valid=valid,
                base=(lvl - 1) * (H * W))
    return cand, packed.reshape(-1), (H, W), next_base


def extract_sift(image, options: Optional[SiftExtractionOptions] = None
                 ) -> SiftFeatures:
    """Extract SIFT features from a [H, W] grayscale f32 image in [0, 1].

    The whole pipeline is jit-compatible for a fixed image shape; batch
    same-sized images with `jax.vmap(lambda im: extract_sift(im, opt))`.
    Replaces the reference's producer/consumer thread pipeline
    (ref: feature/extraction.cc:112-177) with device batching.

    Stage split (the TPU cost model drives it): per-octave detection is
    dense VPU work; the gather-bound orientation/descriptor stages run
    ONCE over the global top-`max_num_features` candidates of ALL
    octaves against a single concatenated flat gradient buffer — the
    ranking key (refined |DoG| response) is known before either stage,
    so candidates the final top-K would drop are never sampled (3x
    fewer gathers at the 4-octave default than per-octave processing).
    """
    opt = options or SiftExtractionOptions()
    img = image.astype(jnp.float32)

    if opt.first_octave <= -1:
        base = _upsample2(img)
        octave_scale0 = 0.5
        # Bring the upsampled image (blur ~2*init_sigma) to sigma0.
        pre = math.sqrt(max(opt.sigma0 ** 2 - (2 * opt.init_sigma) ** 2, 0.01))
    else:
        base = img
        octave_scale0 = 1.0
        pre = math.sqrt(max(opt.sigma0 ** 2 - opt.init_sigma ** 2, 0.01))
    base = _blur_matmul(base, pre)

    h, w = base.shape
    n_oct = min(opt.num_octaves,
                max(1, int(math.floor(math.log2(min(h, w) / 16.0))) + 1))

    parts = []
    flats = []
    offset = 0
    for o in range(n_oct):
        cand, pflat, (H, W), base = _detect_octave(base, opt)
        C = cand["fx"].shape[0]
        oscale = octave_scale0 * (2.0 ** o)
        cand["base"] = cand["base"] + offset
        cand["ph"] = jnp.full((C,), H, jnp.int32)
        cand["pw"] = jnp.full((C,), W, jnp.int32)
        cand["oscale"] = jnp.full((C,), oscale, jnp.float32)
        offset += pflat.shape[0]
        parts.append(cand)
        flats.append(pflat)

    flat_all = jnp.concatenate(flats)
    if flat_all.shape[0] % 128 != 0:  # keep the rowsel gather eligible
        flat_all = jnp.pad(flat_all,
                           (0, 128 - flat_all.shape[0] % 128))
    cat = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}

    # Global candidate top-K by refined response BEFORE the expensive
    # stages (response is orientation-independent, so this preserves the
    # final row ranking exactly).
    K = opt.max_num_features
    total = cat["resp"].shape[0]
    k_eff = min(K, total)
    cscore = jnp.where(cat["valid"], cat["resp"], -jnp.inf)
    _, cidx = lax.top_k(cscore, k_eff)
    cat = {k: v[cidx] for k, v in cat.items()}

    shapes = None
    if opt.estimate_affine_shape:
        shapes, _aniso = _affine_adapt(
            flat_all, cat["fx"], cat["fy"], cat["sigma"], cat["base"],
            cat["ph"], cat["pw"], opt.affine_shape_iters,
            opt.grad_sampling)

    if opt.upright:
        orients = jnp.zeros((k_eff, 1), jnp.float32)
        ovalid = jnp.ones((k_eff, 1), bool)
    else:
        hists = _orientation_histograms(flat_all, cat["fx"], cat["fy"],
                                        cat["sigma"], cat["base"],
                                        cat["ph"], cat["pw"],
                                        opt.grad_sampling, shape=shapes)
        orients, ovalid = _histogram_peaks(hists, opt.max_num_orientations)

    # Expand (candidate x orientation) -> rows and run the FINAL row
    # top-K before the descriptor stage: a candidate carries up to
    # max_num_orientations rows but only `k_eff` rows survive, so
    # sampling descriptors first would waste half the gathers on rows
    # the top-K drops (descriptor computation is row-independent, so
    # selection order does not change the result).
    n_ori = orients.shape[1]
    rep = lambda a: jnp.repeat(a[:, None], n_ori, 1).reshape(-1)
    kv = (jnp.repeat(cat["valid"][:, None], n_ori, 1) & ovalid).reshape(-1)
    kr = rep(cat["resp"])
    score = jnp.where(kv, kr, -jnp.inf)
    vals, idx = lax.top_k(score, k_eff)

    row = {k: rep(cat[k])[idx] for k in
           ("fx", "fy", "sigma", "base", "ph", "pw", "oscale")}
    ko = orients.reshape(-1)[idx]
    row_shape = None
    if shapes is not None:
        row_shape = jnp.repeat(shapes[:, None], n_ori, 1) \
            .reshape(-1, 2, 2)[idx]
    descs = _descriptors(flat_all, row["fx"], row["fy"], row["sigma"],
                         ko, row["base"], row["ph"], row["pw"], opt,
                         shape=row_shape)

    # ORIGINAL image coordinates (+0.5 pixel-center, COLMAP convention).
    keypoints = jnp.stack([row["fx"] * row["oscale"] + 0.5,
                           row["fy"] * row["oscale"] + 0.5,
                           row["sigma"] * row["oscale"], ko], axis=-1)
    affine = None
    if row_shape is not None:
        # Full affine frame scale * S @ R(ori) in original-image pixels
        # (COLMAP 6-param keypoint, feature/types.h:43-83).
        sc = row["sigma"] * row["oscale"]
        ca = jnp.cos(ko)
        sa = jnp.sin(ko)
        R = jnp.stack([jnp.stack([ca, -sa], -1),
                       jnp.stack([sa, ca], -1)], -2)     # [K, 2, 2]
        A = sc[:, None, None] * jnp.einsum("kij,kjl->kil", row_shape, R)
        affine = A.reshape(-1, 4)
    desc = _normalize_descriptors(descs, opt.normalization)
    mask = jnp.isfinite(vals)
    if k_eff < K:  # pad to the static budget
        pad = K - k_eff
        keypoints = jnp.pad(keypoints, ((0, pad), (0, 0)))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
        vals = jnp.pad(vals, (0, pad), constant_values=-jnp.inf)
        if affine is not None:
            affine = jnp.pad(affine, ((0, pad), (0, 0)))
    resp = jnp.where(mask, vals, 0.0)
    return SiftFeatures(keypoints=keypoints, descriptors=desc, mask=mask,
                        response=resp, affine=affine)


# ---------------------------------------------------------------------------
# Batched bulk extraction (the CLI front-end device path)
# ---------------------------------------------------------------------------

_BATCH_CACHE: dict = {}


def extract_sift_batch(images: np.ndarray,
                       options: Optional[SiftExtractionOptions] = None,
                       device=None):
    """Bulk extraction of a [B, H, W] f32 image stack as ONE device
    program: jit(vmap(extract_sift)) + on-device uint8 quantization, a
    single device->host read per call.

    This is the TPU replacement for the reference's producer/consumer
    extraction thread pipeline (ref: feature/extraction.cc:112-177,
    SiftGPU path sift.cc:853): the CLI `feature_extractor` groups
    images by shape and streams fixed-size batches through this
    function on the accelerator (host loop cost = one H2D + one D2H per
    batch — the axon tunnel's per-sync tax amortizes over the batch).

    Returns host numpy (keypoints [B, K, 4] f32 — or [B, K, 6] COLMAP
    affine keypoints when opt.estimate_affine_shape — descriptors_u8
    [B, K, 128] u8, mask [B, K] bool).
    """
    opt = options or SiftExtractionOptions()
    images = np.asarray(images, np.float32)
    if device is None:
        device = jax.local_devices()[0]
    key = (images.shape, opt, device)
    fn = _BATCH_CACHE.get(key)
    if fn is None:
        def batch(imgs):
            def one(im):
                ft = extract_sift(im, opt)
                kp = ft.keypoints
                if ft.affine is not None:
                    # COLMAP 6-param affine keypoint rows
                    # (feature/types.h:43-83): x, y, a11, a12, a21, a22
                    kp = jnp.concatenate([kp[:, :2], ft.affine], axis=1)
                return (kp, descriptors_to_uint8(ft.descriptors),
                        ft.mask)
            return jax.vmap(one)(imgs)
        # Execution device follows the committed input placement
        # (jax.device_put below), so one jit serves any device.
        fn = jax.jit(batch)
        if len(_BATCH_CACHE) > 64:
            _BATCH_CACHE.clear()
        _BATCH_CACHE[key] = fn
    # f32 throughout even in x64 processes (the CLI mapper runs x64 for
    # host math; f64 is software-emulated on TPU and the f64 literals
    # that jnp defaults create under x64 would silently promote the
    # whole pipeline).
    with jax.enable_x64(False):
        kps, desc_u8, mask = fn(jax.device_put(images, device))
    return np.asarray(kps), np.asarray(desc_u8), np.asarray(mask)


def load_image_gray(path, max_size: Optional[int] = None) -> np.ndarray:
    """Host-side image loading -> [H, W] f32 in [0, 1] (replaces the
    reference's FreeImage Bitmap, ref: util/bitmap.h)."""
    from PIL import Image as PILImage

    im = PILImage.open(path).convert("L")
    if max_size is not None and max(im.size) > max_size:
        sc = max_size / max(im.size)
        im = im.resize((max(1, int(im.width * sc)),
                        max(1, int(im.height * sc))), PILImage.BILINEAR)
    return np.asarray(im, dtype=np.float32) / 255.0
