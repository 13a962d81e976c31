"""Two-process multi-host SPMD validation (SURVEY.md §4 implication (c)).

Spawns 2 OS processes x 4 virtual CPU devices each, forms the 8-device
global mesh via `jax.distributed.initialize` (gloo CPU collectives), runs
the fused-SPMD BA + edge-sharded pose graph on it, and checks both
processes agree with the single-process 8-device solve. This exercises
the cross-process collective path that a 2-host TPU slice uses over
ICI/DCN — the reference has no distributed story at all (SURVEY §2.3).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(line: str) -> dict:
    m = re.search(
        r"RESULT (\d+) initial=(\S+) final=(\S+) t0=(\S+) t1=(\S+) "
        r"pg_final=(\S+)", line)
    assert m, f"no RESULT line in: {line!r}"
    return dict(pid=int(m.group(1)), initial=float(m.group(2)),
                final=float(m.group(3)), t0=float(m.group(4)),
                t1=float(m.group(5)), pg_final=float(m.group(6)))


@pytest.mark.slow
def test_two_process_fused_spmd_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "mp_worker_fused_ba.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = [_parse(out) for out in outs]
    r0, r1 = sorted(results, key=lambda r: r["pid"])

    # Both processes hold identical replicated results.
    assert r0["final"] == pytest.approx(r1["final"], rel=1e-12)
    assert r0["t0"] == pytest.approx(r1["t0"], rel=1e-10)
    assert r0["pg_final"] == pytest.approx(r1["pg_final"], rel=1e-12)

    # And they solved the problem (noise-free synthetic -> near-zero).
    assert r0["final"] < 1e-4 * r0["initial"]
    assert r0["pg_final"] < 1e-10

    # Single-process 8-virtual-device reference (this pytest process).
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from sba_tpu.optim.ba import BAOptions
    from sba_tpu.parallel import distributed_bundle_adjust_fused
    from sba_tpu.utils.synthetic import make_ba_problem

    problem, _ = make_ba_problem(
        num_images=6, num_points=150, observations_per_point=4,
        pose_noise=0.01, point_noise=0.05, pixel_noise=0.0, seed=23,
        dtype=jnp.float32)
    opt = BAOptions(model_id=0, max_iterations=20, dtype="float32",
                    schur_bf16=False)
    mesh = Mesh(np.array(jax.devices()[:8]), ("points",))
    out_s, sum_s = distributed_bundle_adjust_fused(
        problem, opt, mesh, interpret=True)
    # Same program partitioned differently: both drive the noise-free
    # problem to the f32 noise floor (absolute costs there differ by
    # reduction order — compare against the initial cost scale).
    assert r0["final"] < 1e-11 * r0["initial"]
    assert float(sum_s.final_cost) < 1e-11 * float(sum_s.initial_cost)
    t_s = np.asarray(out_s.tvecs)
    assert r0["t0"] == pytest.approx(float(t_s[1, 0]), abs=1e-4)
    assert r0["t1"] == pytest.approx(float(t_s[1, 1]), abs=1e-4)
