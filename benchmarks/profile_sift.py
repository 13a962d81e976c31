"""Round 5: SIFT stage profile at the bench shape (B=8, 640x480).

Times cumulative prefixes of the extraction pipeline (each prefix is its
own jit program; the delta between consecutive prefixes approximates the
stage cost inside the fused whole). Run on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sba_tpu.features import sift as S

B = 8


def timeit(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    _ = float(jnp.sum(jnp.ones(3)))  # poison sync
    from sba_tpu.utils.render import render_scene
    scene = render_scene(num_images=B, image_size=(640, 480), seed=0)
    imgs = jnp.asarray(scene["images"].astype(np.float32) / 255.0)
    opt = S.SiftExtractionOptions(max_num_features=2048)

    import math

    def prefix(stage):
        def one(image):
            img = image.astype(jnp.float32)
            base = img
            pre = math.sqrt(max(opt.sigma0 ** 2 - opt.init_sigma ** 2, 0.01))
            base = S._blur(base, pre)
            h, w = base.shape
            n_oct = min(opt.num_octaves,
                        max(1, int(math.floor(math.log2(min(h, w) / 16.0))) + 1))
            if stage == "pyramid":
                acc = 0.0
                for o in range(n_oct):
                    gauss, dog, base = S.build_octave(base, opt)
                    acc = acc + dog.sum() + gauss.sum()
                return acc
            if stage == "extrema":
                acc = 0.0
                for o in range(n_oct):
                    gauss, dog, base = S.build_octave(base, opt)
                    is_max, is_min = S._neighbor_extrema(dog)
                    acc = acc + is_max.sum() + is_min.sum()
                return acc
            parts = []
            flats = []
            offset = 0
            for o in range(n_oct):
                cand, pflat, (H, W), base = S._detect_octave(base, opt)
                C = cand["fx"].shape[0]
                cand["base"] = cand["base"] + offset
                cand["ph"] = jnp.full((C,), H, jnp.int32)
                cand["pw"] = jnp.full((C,), W, jnp.int32)
                cand["oscale"] = jnp.full((C,), 2.0 ** o, jnp.float32)
                offset += pflat.shape[0]
                parts.append(cand)
                flats.append(pflat)
            flat_all = jnp.concatenate(flats)
            if flat_all.shape[0] % 128 != 0:
                flat_all = jnp.pad(flat_all, (0, 128 - flat_all.shape[0] % 128))
            cat = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
            if stage == "detect":
                return sum(v.sum() for v in cat.values()) + flat_all.sum()
            K = opt.max_num_features
            k_eff = min(K, cat["resp"].shape[0])
            cscore = jnp.where(cat["valid"], cat["resp"], -jnp.inf)
            _, cidx = jax.lax.top_k(cscore, k_eff)
            cat = {k: v[cidx] for k, v in cat.items()}
            if stage == "select":
                return sum(v.sum() for v in cat.values())
            hists = S._orientation_histograms(flat_all, cat["fx"], cat["fy"],
                                              cat["sigma"], cat["base"],
                                              cat["ph"], cat["pw"],
                                              opt.grad_sampling)
            if stage == "orient_hist":
                return hists.sum()
            orients, ovalid = S._histogram_peaks(hists, opt.max_num_orientations)
            n_ori = orients.shape[1]
            rep = lambda a: jnp.repeat(a[:, None], n_ori, 1).reshape(-1)
            kv = (jnp.repeat(cat["valid"][:, None], n_ori, 1) & ovalid).reshape(-1)
            kr = rep(cat["resp"])
            score = jnp.where(kv, kr, -jnp.inf)
            vals, idx = jax.lax.top_k(score, k_eff)
            row = {k: rep(cat[k])[idx] for k in
                   ("fx", "fy", "sigma", "base", "ph", "pw", "oscale")}
            ko = orients.reshape(-1)[idx]
            if stage == "orient":
                return ko.sum() + sum(v.sum() for v in row.values())
            descs = S._descriptors(flat_all, row["fx"], row["fy"],
                                   row["sigma"], ko, row["base"],
                                   row["ph"], row["pw"], opt)
            return descs.sum() + ko.sum()

        f = jax.jit(jax.vmap(one))

        def run():
            float(jnp.sum(f(imgs)))
        return run

    prev = 0.0
    for st in ("pyramid", "extrema", "detect", "select", "orient_hist",
               "orient", "desc"):
        t = timeit(prefix(st))
        print(f"{st:12s} cum {t*1e3:7.1f} ms   delta {1e3*(t-prev):7.1f} ms")
        prev = t

    # whole pipeline for reference
    f = jax.jit(jax.vmap(lambda im: (
        lambda ft: ft.response.sum() + ft.descriptors.sum()
        + ft.keypoints.sum())(S.extract_sift(im, opt))))
    t = timeit(lambda: float(jnp.sum(f(imgs))))
    print(f"full extract_sift: {t*1e3:.1f} ms -> {B/t:.1f} img/s")


if __name__ == "__main__":
    main()
