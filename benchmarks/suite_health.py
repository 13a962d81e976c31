"""Suite health gate (VERDICT r4 #10): run the test suite (or the fast
smoke subset) and RECORD the result as an artifact, so "green" is a
recorded fact rather than a recollection — the r4 round shipped with a
flake visible only in .pytest_cache.

Usage:
    python benchmarks/suite_health.py --smoke   # ~8 min subset
    python benchmarks/suite_health.py           # full suite (~30 min)

Appends one JSON line per run to SUITE_HEALTH.jsonl at the repo root.
"""

import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fast smoke subset: the modules covering every round-4/5 workload
# (SBA/GSBA + SPMD parity, front end, two-view, viewer, loop closure).
SMOKE = [
    "tests/test_sba.py",
    "tests/test_gsba.py",
    "tests/test_distributed_sba.py",
    "tests/test_distributed_gsba.py",
    "tests/test_distributed_ba.py",
    "tests/test_two_view_geometry.py",
    "tests/test_generalized_relative_pose.py",
    "tests/test_features.py",
    "tests/test_viewer.py",
    "tests/test_loop_detection.py",
]


def main(argv):
    smoke = "--smoke" in argv
    targets = SMOKE if smoke else ["tests/"]
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *targets],
        cwd=_REPO, capture_output=True, text=True)
    dt = round(time.perf_counter() - t0, 1)
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    m = re.findall(r"(\d+) (passed|failed|error|skipped)", tail)
    counts = {k: int(v) for v, k in m}
    rec = dict(ts=round(time.time(), 1), mode="smoke" if smoke else "full",
               rc=proc.returncode, duration_s=dt, summary=tail,
               **counts)
    with open(os.path.join(_REPO, "SUITE_HEALTH.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
