"""Round 5: sub-profile of the SIFT detect stage (156 ms of the 254 ms
8x640x480 batch after the banded-matmul pyramid). Cumulative prefixes
inside _detect_octave across all octaves."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sba_tpu.features import sift as S

B = 8
OPT = S.SiftExtractionOptions(max_num_features=2048)


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
    imgs = jnp.asarray(rng.random((B, 480, 640), np.float32))
    opt = OPT

    def prefix(stage):
        def one(image):
            base = S._blur_matmul(image.astype(jnp.float32),
                                  math.sqrt(opt.sigma0 ** 2
                                            - opt.init_sigma ** 2))
            acc = 0.0
            for o in range(4):
                gauss, dog, nb = S.build_octave(base, opt)
                L, H, W = dog.shape
                C = min(opt.candidates_per_octave, (L - 2) * H * W)
                is_max, is_min = S._neighbor_extrema(dog)
                c = dog[1:-1]
                extremum = (is_max | is_min) & (jnp.abs(c)
                                                > 0.8 * opt.peak_threshold)
                score = jnp.where(extremum, jnp.abs(c), 0.0)
                if stage == "extrema":
                    acc = acc + score.sum()
                    base = nb
                    continue
                flat = score.reshape(-1)
                vals, idx = lax.top_k(flat, C)
                lvl = idx // (H * W) + 1
                rem = idx % (H * W)
                yy = rem // W
                xx = rem % W
                if stage == "topk1":
                    acc = acc + vals.sum() + idx.sum()
                    base = nb
                    continue
                off, refined = jax.vmap(
                    lambda l, y, x: S._quadratic_refine(dog, l, y, x))(
                        lvl, yy, xx)
                if stage == "refine":
                    acc = acc + off.sum() + refined.sum()
                    base = nb
                    continue
                edge, det = S._edge_score(dog, lvl, yy, xx)
                if stage == "edge":
                    acc = acc + edge.sum() + det.sum()
                    base = nb
                    continue
                D = min(opt.desc_candidates_per_octave, C)
                cand_valid = vals > 0
                et = opt.edge_threshold
                valid = (cand_valid & (jnp.abs(refined) > opt.peak_threshold)
                         & (det > 0) & (edge < (et + 1.0) ** 2 / et))
                dscore = jnp.where(valid, jnp.abs(refined), -jnp.inf)
                _, keep = lax.top_k(dscore, D)
                if stage == "topk2":
                    acc = acc + keep.sum()
                    base = nb
                    continue
                inner = list(range(1, opt.octave_resolution + 1))
                grads = [S._gradients(gauss[s]) for s in inner]
                packed = S._pack_mag_ang(
                    jnp.stack([g[0] for g in grads]),
                    jnp.stack([g[1] for g in grads]))
                acc = acc + packed.astype(jnp.uint32).sum()
                base = nb
            return acc

        f = jax.jit(jax.vmap(one))

        def run():
            float(jnp.sum(f(imgs)))
        return run

    prev = 0.0
    for st in ("extrema", "topk1", "refine", "edge", "topk2", "grads"):
        t = timeit(prefix(st))
        print(f"{st:8s} cum {t*1e3:7.1f} ms   delta {1e3*(t-prev):7.1f} ms")
        prev = t


if __name__ == "__main__":
    main()
