"""Vote-and-Verify spatial re-ranking for image retrieval.

Capability parity with ref: src/retrieval/vote_and_verify.{h,cc}
(`VoteAndVerify`, Schonberger et al., "A Vote-and-Verify Strategy for
Fast Spatial Verification in Image Retrieval", ACCV 2016; used by
`VisualIndex::Query` at ref visual_index.h:483 to add an effective
inlier count to the TF-IDF score of each retrieved candidate).

Each tentative feature match (keypoints carry x, y, scale, orientation)
implies one 4-DoF similarity transform; votes accumulate in a
(tx, ty, log-scale, angle) histogram, the strongest bins become
transform hypotheses, and each hypothesis is verified by counting
matches whose transfer and scale errors pass the thresholds.

TPU-first shape: the reference's sparse unordered_map vote accumulator
becomes ONE dense bincount over the flattened 4-D grid, top-k bins are
one `jax.lax.top_k`, and hypothesis verification is a [K, M] broadcast —
everything static-shape, one jit, no per-match loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VoteAndVerifyOptions:
    """Mirrors ref vote_and_verify.h:40 defaults."""

    num_transformations: int = 30
    num_trans_bins: int = 64
    num_scale_bins: int = 32
    num_angle_bins: int = 8
    max_image_size: int = 4096
    min_num_votes: int = 1
    max_transfer_error: float = 100.0 ** 2
    max_scale_error: float = 2.0


def _match_transforms(g1, g2):
    """Per-match similarity g1 -> g2: (scale, cos a, sin a, tx, ty).
    g: [M, 4] = (x, y, scale, orientation)."""
    s = g2[:, 2] / jnp.maximum(g1[:, 2], 1e-12)
    da = g2[:, 3] - g1[:, 3]
    ca, sa = jnp.cos(da), jnp.sin(da)
    tx = g2[:, 0] - s * (ca * g1[:, 0] - sa * g1[:, 1])
    ty = g2[:, 1] - s * (sa * g1[:, 0] + ca * g1[:, 1])
    return s, ca, sa, da, tx, ty


def vote_and_verify(g1, g2, mask=None,
                    options: VoteAndVerifyOptions = VoteAndVerifyOptions()
                    ) -> jnp.ndarray:
    """Effective inlier count for tentative matches g1[i] <-> g2[i].

    g1, g2: [M, 4] keypoint geometries (x, y, scale, orientation);
    mask: [M] valid-match mask. Returns a scalar int32 (0 when nothing
    verifies, as the reference returns 0 for < min votes).
    """
    opt = options
    M = g1.shape[0]
    if M == 0:
        return jnp.asarray(0, jnp.int32)
    g1 = jnp.asarray(g1, jnp.float32)
    g2 = jnp.asarray(g2, jnp.float32)
    valid = jnp.ones(M, bool) if mask is None else jnp.asarray(mask) > 0

    s, ca, sa, da, tx, ty = _match_transforms(g1, g2)

    # --- vote ---
    nt, ns, na = opt.num_trans_bins, opt.num_scale_bins, opt.num_angle_bins
    half = float(opt.max_image_size)
    bx = jnp.clip(((tx + half) / (2 * half) * nt).astype(jnp.int32), 0, nt - 1)
    by = jnp.clip(((ty + half) / (2 * half) * nt).astype(jnp.int32), 0, nt - 1)
    # log2 scale in [-4, 4) -> ns bins (the reference bins log scale over
    # the plausible pyramid range).
    ls = jnp.log2(jnp.maximum(s, 1e-12))
    bs = jnp.clip(((ls + 4.0) / 8.0 * ns).astype(jnp.int32), 0, ns - 1)
    ang = jnp.mod(da, 2 * jnp.pi)
    ba = jnp.clip((ang / (2 * jnp.pi) * na).astype(jnp.int32), 0, na - 1)
    flat = ((bx * nt + by) * ns + bs) * na + ba
    flat = jnp.where(valid, flat, nt * nt * ns * na)  # spill bin
    votes = jnp.zeros(nt * nt * ns * na + 1, jnp.int32).at[flat].add(1)
    votes = votes[:-1]

    top_v, top_i = jax.lax.top_k(votes, opt.num_transformations)

    # --- hypothesis transforms: vote-weighted means per top bin ---
    in_bin = flat[None, :] == top_i[:, None]              # [K, M]
    w = (in_bin & valid[None, :]).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    h_s = jnp.sum(w * s[None, :], axis=1) / cnt
    h_ca = jnp.sum(w * ca[None, :], axis=1) / cnt
    h_sa = jnp.sum(w * sa[None, :], axis=1) / cnt
    h_tx = jnp.sum(w * tx[None, :], axis=1) / cnt
    h_ty = jnp.sum(w * ty[None, :], axis=1) / cnt
    # Re-normalize the averaged rotation.
    nrm = jnp.maximum(jnp.sqrt(h_ca ** 2 + h_sa ** 2), 1e-12)
    h_ca, h_sa = h_ca / nrm, h_sa / nrm

    # --- verify: transfer + scale error of every match under each hyp ---
    px = h_s[:, None] * (h_ca[:, None] * g1[None, :, 0]
                         - h_sa[:, None] * g1[None, :, 1]) + h_tx[:, None]
    py = h_s[:, None] * (h_sa[:, None] * g1[None, :, 0]
                         + h_ca[:, None] * g1[None, :, 1]) + h_ty[:, None]
    terr = (px - g2[None, :, 0]) ** 2 + (py - g2[None, :, 1]) ** 2
    sratio = s[None, :] / jnp.maximum(h_s[:, None], 1e-12)
    serr = jnp.maximum(sratio, 1.0 / jnp.maximum(sratio, 1e-12))
    inl = (terr <= opt.max_transfer_error) & \
        (serr <= opt.max_scale_error) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    counts = jnp.where(top_v >= opt.min_num_votes, counts, 0)
    return jnp.max(counts).astype(jnp.int32)


def word_matches(words_q, geoms_q, words_db, geoms_db, max_matches=4096):
    """Tentative matches by shared visual word (host-side join, as the
    index lives on host; ref visual_index.h feeds VoteAndVerify with
    word-level matches). Returns (g1 [M,4], g2 [M,4]) numpy arrays,
    capped at max_matches."""
    words_q = np.asarray(words_q)
    words_db = np.asarray(words_db)
    order_db = np.argsort(words_db, kind="stable")
    sorted_db = words_db[order_db]
    lo = np.searchsorted(sorted_db, words_q, side="left")
    hi = np.searchsorted(sorted_db, words_q, side="right")
    g1, g2 = [], []
    total = 0
    for i in range(len(words_q)):
        for k in range(lo[i], hi[i]):
            g1.append(geoms_q[i])
            g2.append(geoms_db[order_db[k]])
            total += 1
            if total >= max_matches:
                break
        if total >= max_matches:
            break
    if not g1:
        return (np.zeros((0, 4), np.float32), np.zeros((0, 4), np.float32))
    return np.asarray(g1, np.float32), np.asarray(g2, np.float32)
