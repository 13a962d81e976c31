"""Probe: how much of the SBA LM iteration is the second map gather?
Monkeypatch bilinear_depth_u8_grad to decode depth from the LABEL
gather's u32 (wrong values, same compute structure, ONE rowsel gather
per sample) and compare delta-method LM rates. Diagnostic only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import sba_tpu.optim.sba as sba
from sba_tpu.ops import interpolation as interp
from sba_tpu.utils.synthetic import make_sba_scene


def lm_rate(problem, opt_kw):
    def solve(n):
        o = sba.SBAOptions(pixel_step=10, mode="soft", max_iterations=n,
                           function_tolerance=0.0, gradient_tolerance=0.0,
                           parameter_tolerance=0.0, **opt_kw)

        def run():
            out, s = sba.semantic_bundle_adjust(problem, o)
            jax.block_until_ready(s.final_cost)
        return run

    r5, r20 = solve(5), solve(20)
    r5(); r20()
    b5 = b20 = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); r5(); b5 = min(b5, time.perf_counter() - t0)
        t0 = time.perf_counter(); r20(); b20 = min(b20, time.perf_counter() - t0)
    return (b20 - b5) / 15 * 1e3


def main():
    _ = float(jnp.sum(jnp.ones(3)))
    q, t, cam, depth, sem, q0, t0v = make_sba_scene(
        num_images=50, image_size=(640, 480), focal=500.0,
        pose_noise=0.003, seed=0)
    opt = sba.SBAOptions(pixel_step=10)
    problem = sba.build_sba_problem(q0, t0v, cam, depth, sem, opt,
                                    dtype=jnp.float32)

    ms = lm_rate(problem, {})
    print(f"baseline analytic: {ms:.1f} ms/iter = {1e3/ms:.2f} it/s")

    orig = sba.bilinear_depth_u8_grad

    def fake_depth_grad(flat_u32, H, W, base, x, y, lo, hi, fill=0.0):
        # ONE gather: decode "depth" from the label table's u32.
        return orig(flat_u32, H, W, base, x, y, lo, hi, fill)

    # variant 1: skip the depth gather entirely (gate from label u32)
    def one_gather_depth(flat_u32, H, W, base, x, y, lo, hi, fill=0.0):
        v = jnp.full_like(x, 5.0)
        z = jnp.zeros_like(x)
        return v, z, z

    sba.bilinear_depth_u8_grad = one_gather_depth
    jax.clear_caches()  # monkeypatch must force a retrace
    try:
        ms1 = lm_rate(problem, {})
        print(f"no-depth-gather:   {ms1:.1f} ms/iter = {1e3/ms1:.2f} it/s")
    finally:
        sba.bilinear_depth_u8_grad = orig

    # variant 2: also skip label gather (zero gathers)
    def no_label(flat_u32, H, W, base, x, y, label, fill=0.0):
        v = jnp.full_like(x, 0.9)
        z = jnp.zeros_like(x)
        return v, z, z

    orig_l = sba.bilinear_label_agreement_grad
    sba.bilinear_depth_u8_grad = one_gather_depth
    sba.bilinear_label_agreement_grad = no_label
    jax.clear_caches()
    try:
        ms2 = lm_rate(problem, {})
        print(f"zero-gathers:      {ms2:.1f} ms/iter = {1e3/ms2:.2f} it/s")
    finally:
        sba.bilinear_depth_u8_grad = orig
        sba.bilinear_label_agreement_grad = orig_l


if __name__ == "__main__":
    main()
