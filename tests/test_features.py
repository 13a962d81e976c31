"""Feature front-end tests: SIFT extraction + matching + pair schedules.

Mirrors the reference's synthetic-data unit style (ref: feature/sift_test.cc,
feature/matching tests) — blob images with known keypoint locations,
rotation consistency, ratio/cross-check behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sba_tpu.features import (
    SiftExtractionOptions,
    SiftMatchingOptions,
    extract_sift,
    match_descriptors,
    match_guided,
    exhaustive_pairs,
    sequential_pairs,
    spatial_pairs,
)
from sba_tpu.features.matching import matches_to_pairs


def blob_image(h, w, centers, sigmas, amps=None, seed=0):
    """Sum of Gaussian blobs + tiny noise."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w), np.float32)
    amps = amps or [1.0] * len(centers)
    for (cy, cx), s, a in zip(centers, sigmas, amps):
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s ** 2))
    rng = np.random.default_rng(seed)
    img += 0.01 * rng.standard_normal((h, w)).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def small_opt():
    return SiftExtractionOptions(
        max_num_features=256, candidates_per_octave=512, num_octaves=3,
        max_num_orientations=1)


def test_sift_finds_blob_centers(small_opt):
    centers = [(40, 40), (40, 100), (100, 60), (90, 120)]
    img = blob_image(160, 160, centers, [3.0, 4.0, 3.5, 5.0])
    feats = extract_sift(jnp.asarray(img), small_opt)
    kps = np.asarray(feats.keypoints)[np.asarray(feats.mask)]
    assert kps.shape[0] >= len(centers)
    for cy, cx in centers:
        d = np.hypot(kps[:, 0] - (cx + 0.5), kps[:, 1] - (cy + 0.5))
        assert d.min() < 2.0, f"no keypoint near blob ({cy},{cx})"


def test_sift_scale_tracks_blob_size(small_opt):
    img1 = blob_image(128, 128, [(64, 64)], [3.0])
    img2 = blob_image(128, 128, [(64, 64)], [6.0])

    def scale_of(img):
        f = extract_sift(jnp.asarray(img), small_opt)
        kps = np.asarray(f.keypoints)
        mask = np.asarray(f.mask)
        resp = np.asarray(f.response)
        d = np.hypot(kps[:, 0] - 64.5, kps[:, 1] - 64.5)
        ok = mask & (d < 4)
        assert ok.any()
        return kps[ok][np.argmax(resp[ok]), 2]

    s1, s2 = scale_of(img1), scale_of(img2)
    assert 1.5 < s2 / s1 < 2.7  # doubled blob -> ~doubled scale


def test_sift_descriptor_translation_invariance(small_opt):
    """Same blob pattern shifted: descriptors of corresponding keypoints
    must match to high similarity."""
    centers = [(40, 44), (44, 96), (96, 52)]
    img1 = blob_image(160, 160, centers, [3.0, 4.0, 5.0], seed=1)
    shifted = [(c[0] + 8, c[1] + 5) for c in centers]
    img2 = blob_image(160, 160, shifted, [3.0, 4.0, 5.0], seed=2)

    f1 = extract_sift(jnp.asarray(img1), small_opt)
    f2 = extract_sift(jnp.asarray(img2), small_opt)
    res = match_descriptors(f1.descriptors, f2.descriptors, f1.mask, f2.mask,
                            SiftMatchingOptions(max_distance=1.0))
    pairs = matches_to_pairs(res)
    assert pairs.shape[0] >= len(centers) - 1
    k1 = np.asarray(f1.keypoints)
    k2 = np.asarray(f2.keypoints)
    # Matched keypoints should be consistent with the (5, 8) shift.
    dx = k2[pairs[:, 1], 0] - k1[pairs[:, 0], 0]
    dy = k2[pairs[:, 1], 1] - k1[pairs[:, 0], 1]
    good = (np.abs(dx - 5) < 2.5) & (np.abs(dy - 8) < 2.5)
    assert good.mean() > 0.5


def test_match_descriptors_ratio_and_cross_check():
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (20, 128))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # image2 = permuted copy of image1 descriptors
    perm = np.random.default_rng(0).permutation(20)
    d2 = d[perm]
    res = match_descriptors(d, d2, options=SiftMatchingOptions(
        max_ratio=0.9, max_distance=1.5))
    m = np.asarray(res.matches12)
    assert (m >= 0).sum() == 20
    np.testing.assert_array_equal(perm[m], np.arange(20))


def test_match_descriptors_rejects_ambiguous():
    # Two identical rows in d2 -> ratio test kills the match.
    d1 = np.zeros((1, 128), np.float32)
    d1[0, 0] = 1.0
    d2 = np.tile(d1, (2, 1))
    res = match_descriptors(jnp.asarray(d1), jnp.asarray(d2))
    assert int(res.matches12[0]) == -1


def test_match_guided_epipolar_gate():
    rng = np.random.default_rng(3)
    n = 16
    d = rng.standard_normal((n, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    xy1 = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    xy2 = xy1.copy()  # F = skew of horizontal translation => y2 == y1 lines
    # Fundamental for pure x-translation: l2 = F x1 = [0,-1,y1] => y2 = y1.
    F = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    res = match_guided(jnp.asarray(d), jnp.asarray(d), jnp.asarray(xy1),
                       jnp.asarray(xy2), jnp.asarray(F),
                       options=SiftMatchingOptions(max_error=2.0,
                                                   max_distance=1.5))
    m = np.asarray(res.matches12)
    assert (m == np.arange(n)).all()
    # Break the epipolar constraint for one point -> rejected.
    xy2_bad = xy2.copy()
    xy2_bad[0, 1] += 50.0
    res2 = match_guided(jnp.asarray(d), jnp.asarray(d), jnp.asarray(xy1),
                        jnp.asarray(xy2_bad), jnp.asarray(F),
                        options=SiftMatchingOptions(max_error=2.0,
                                                    max_distance=1.5))
    assert int(res2.matches12[0]) == -1


def test_pair_schedules():
    p = exhaustive_pairs(6, block_size=3)
    assert p.shape == (15, 2)
    assert (p[:, 0] < p[:, 1]).all()

    s = sequential_pairs(10, overlap=2, quadratic_overlap=False)
    assert (s[:, 1] - s[:, 0] <= 2).all()
    sq = sequential_pairs(10, overlap=2, quadratic_overlap=True)
    assert sq.shape[0] > s.shape[0]

    pos = np.zeros((5, 3))
    pos[:, 0] = [0, 1, 2, 50, 51]
    sp = spatial_pairs(pos, max_num_neighbors=2, max_distance=5.0)
    assert (sp == np.array([[0, 1], [0, 2], [1, 2], [3, 4]])).all()


def test_dsp_sift_descriptors():
    """DSP-SIFT (domain-size pooling, ref sift.h:97-100): pooled
    descriptors stay unit-normalized, differ from single-scale ones, and
    remain translation-consistent (the matchability property pooling is
    for)."""
    centers = [(40, 40), (40, 100), (100, 60)]
    img = blob_image(160, 160, centers, [3.0, 4.0, 3.5])
    opt_plain = SiftExtractionOptions(
        max_num_features=128, candidates_per_octave=512, num_octaves=3,
        max_num_orientations=1)
    opt_dsp = SiftExtractionOptions(
        max_num_features=128, candidates_per_octave=512, num_octaves=3,
        max_num_orientations=1, domain_size_pooling=True,
        dsp_num_scales=5)
    f0 = extract_sift(jnp.asarray(img), opt_plain)
    f1 = extract_sift(jnp.asarray(img), opt_dsp)
    m0 = np.asarray(f0.mask)
    m1 = np.asarray(f1.mask)
    assert m1.sum() == m0.sum()          # pooling changes descriptors only
    d0 = np.asarray(f0.descriptors)[m0]
    d1 = np.asarray(f1.descriptors)[m1]
    assert not np.allclose(d0, d1)
    # Shifted image: pooled descriptors of the shifted blobs match.
    img_s = np.roll(img, (7, 11), axis=(0, 1))
    f2 = extract_sift(jnp.asarray(img_s), opt_dsp)
    d2 = np.asarray(f2.descriptors)[np.asarray(f2.mask)]
    # Every original descriptor has a near-identical partner.
    sim = d1.astype(np.float64) @ d2.astype(np.float64).T
    sim /= (np.linalg.norm(d1, axis=1)[:, None]
            * np.linalg.norm(d2, axis=1)[None, :] + 1e-12)
    assert np.median(sim.max(axis=1)) > 0.95


def test_affine_shape_recovers_anisotropic_stretch():
    """estimate_affine_shape (ref: src/feature/sift.h:76-78, VLFeat
    covdet): an isotropic texture stretched 2x along x must yield
    affine shapes elongated along x with axis ratio ~2 (the
    second-moment matrix of the stretched image is the inverse-square
    of the stretch; Baumberg adaptation whitens it), while the same
    texture unstretched yields near-isotropic shapes."""
    import jax.numpy as jnp

    from sba_tpu.features.sift import SiftExtractionOptions, extract_sift

    rng = np.random.default_rng(0)
    base = rng.random((128, 128))
    # smooth the noise so gradients are well-sampled
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, -1, 0) + np.roll(base, -1, 1)) / 5.0
    from scipy.ndimage import zoom
    stretched = zoom(base, (1.0, 2.0), order=3)[:, :256]  # 2x along x

    opt = SiftExtractionOptions(max_num_features=64,
                                estimate_affine_shape=True,
                                num_octaves=2)

    def shape_ratios(img):
        ft = extract_sift(jnp.asarray(img, jnp.float32), opt)
        m = np.asarray(ft.mask)
        A = np.asarray(ft.affine)[m].reshape(-1, 2, 2)
        ratios = []
        axup = []
        for a in A:
            u, s, vt = np.linalg.svd(a)
            ratios.append(s[0] / max(s[1], 1e-9))
            # major axis direction in image frame
            axup.append(abs(u[0, 0]))  # |x-component of major axis|
        return np.asarray(ratios), np.asarray(axup)

    r_iso, _ = shape_ratios(base.astype(np.float32))
    r_st, ax_st = shape_ratios(stretched.astype(np.float32))
    assert np.median(r_iso) < 1.4, np.median(r_iso)
    assert np.median(r_st) > 1.42, np.median(r_st)
    assert np.median(r_st) > np.median(r_iso) + 0.2, \
        (np.median(r_iso), np.median(r_st))
    # stretched shapes elongate along x
    assert np.median(ax_st[r_st > 1.4]) > 0.85
