"""Round 5: Gaussian pyramid as banded-matrix matmuls vs conv chain.

The r5 stage profile (profile_sift.py) shows the pyramid at 213 ms of a
437 ms 8-image 640x480 batch — 1-channel `conv_general_dilated` runs
~3 GFLOP/s on v5e (nothing for the MXU to tile). Reformulation: blur
each level DIRECTLY from the octave base (Gaussian semigroup:
sigma_direct = sqrt(sigma_total^2 - sigma_base^2)), so all L levels are
independent and the row pass becomes ONE [H, W] x [W, L*W] matmul
against a precomputed banded matrix (edge-clamped boundary), the col
pass a batched [L, H, H] x [L, H, W] matmul.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.features import sift as S

B = 8
H, W = 480, 640
OPT = S.SiftExtractionOptions()


def band_matrix(size, sigma):
    """[size, size] edge-clamped Gaussian blur operator (numpy f32):
    out = M @ in for columns, in @ M.T for rows."""
    if sigma < 1e-4:
        return np.eye(size, dtype=np.float32)
    r = max(1, int(math.ceil(3.0 * sigma)))
    k = S._gaussian_kernel1d(sigma, r)
    M = np.zeros((size, size), np.float32)
    idx = np.arange(size)
    for t in range(-r, r + 1):
        j = np.clip(idx + t, 0, size - 1)
        np.add.at(M, (idx, j), k[t + r])
    return M


def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    _ = float(jnp.sum(jnp.ones(3)))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W), np.float32))

    s_levels = OPT.octave_resolution
    k = 2.0 ** (1.0 / s_levels)
    sig_tot = [OPT.sigma0 * k ** s for s in range(s_levels + 3)]
    sig_dir = [math.sqrt(max(st ** 2 - OPT.sigma0 ** 2, 0.0))
               for st in sig_tot]
    L = len(sig_dir)

    # --- current conv chain ---
    def chain(im):
        gauss, dog, nb = S.build_octave(im, OPT)
        return gauss

    f1 = jax.jit(jax.vmap(chain))
    t1 = timeit(lambda: jax.block_until_ready(f1(imgs)))
    print(f"conv chain octave0: {t1*1e3:.1f} ms")

    # --- banded matmul, all levels direct from base ---
    rowM = jnp.asarray(np.concatenate(
        [band_matrix(W, s).T for s in sig_dir], axis=1))  # [W, L*W]
    colM = jnp.asarray(np.stack([band_matrix(H, s) for s in sig_dir]))

    def banded(im):
        rows = (im @ rowM).reshape(H, L, W).transpose(1, 0, 2)  # [L,H,W]
        return jnp.einsum("lij,ljx->lix", colM, rows,
                          preferred_element_type=jnp.float32)

    f2 = jax.jit(jax.vmap(banded))
    t2 = timeit(lambda: jax.block_until_ready(f2(imgs)))
    print(f"banded matmul octave0: {t2*1e3:.1f} ms")

    a = np.asarray(f1(imgs))
    b = np.asarray(f2(imgs))
    print("max |diff|:", np.abs(a - b).max(),
          " dog diff:", np.abs(np.diff(a, axis=1) - np.diff(b, axis=1)).max())


if __name__ == "__main__":
    main()
