"""Native C++ loader tests: decode parity vs PIL, prefetch pipeline
(the native-runtime counterpart of ref: util/threading_test.cc +
feature extraction pipeline behavior)."""

import os

import numpy as np
import pytest
from PIL import Image as PILImage

from sba_tpu.io.native_loader import (
    PrefetchingImageLoader,
    decode_image_native,
    is_available,
)

pytestmark = pytest.mark.skipif(
    not is_available(), reason="native library not built")


def _write_pgm(path, arr):
    h, w = arr.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(arr.astype(np.uint8).tobytes())


def test_decode_pgm(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    p = str(tmp_path / "img.pgm")
    _write_pgm(p, arr)
    img = decode_image_native(p)
    assert img is not None
    assert img.shape == (37, 53)
    np.testing.assert_allclose(img, arr / 255.0, atol=1e-6)


def test_decode_ppm_matches_pil_luma(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    p = str(tmp_path / "img.ppm")
    PILImage.fromarray(rgb).save(p)
    img = decode_image_native(p)
    assert img is not None
    pil_gray = np.asarray(PILImage.open(p).convert("L"), np.float32) / 255.0
    assert np.abs(img - pil_gray).max() < 2.0 / 255.0  # rounding differences


def test_decode_bmp(tmp_path):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    p = str(tmp_path / "img.bmp")
    PILImage.fromarray(rgb).save(p)
    img = decode_image_native(p)
    assert img is not None
    assert img.shape == (16, 24)
    pil_gray = np.asarray(PILImage.open(p).convert("L"), np.float32) / 255.0
    assert np.abs(img - pil_gray).max() < 2.0 / 255.0


def test_decode_float_tiff_roundtrip(tmp_path):
    from sba_tpu.io.maps import write_float_map_tiff

    rng = np.random.default_rng(3)
    depth = rng.uniform(0, 50, (25, 40)).astype(np.float32)
    p = str(tmp_path / "depth.tiff")
    write_float_map_tiff(depth, p)
    img = decode_image_native(p)
    assert img is not None, "native TIFF decode failed"
    np.testing.assert_array_equal(img, depth)


def test_decode_resize(tmp_path):
    arr = np.full((100, 200), 128, np.uint8)
    p = str(tmp_path / "big.pgm")
    _write_pgm(p, arr)
    img = decode_image_native(p, max_size=50)
    assert img is not None
    assert max(img.shape) == 50
    np.testing.assert_allclose(img, 128 / 255.0, atol=1e-6)


def test_decode_missing_and_corrupt(tmp_path):
    assert decode_image_native(str(tmp_path / "nope.pgm")) is None
    p = str(tmp_path / "bad.tiff")
    with open(p, "wb") as f:
        f.write(b"II*\x00garbagegarbage")
    assert decode_image_native(p) is None


def test_prefetching_loader(tmp_path):
    rng = np.random.default_rng(4)
    paths = []
    truth = {}
    for k in range(12):
        arr = rng.integers(0, 256, (10 + k, 20)).astype(np.uint8)
        p = str(tmp_path / f"im{k}.pgm")
        _write_pgm(p, arr)
        paths.append(p)
        truth[k] = arr
    # One bad path in the middle.
    paths.insert(5, str(tmp_path / "missing.pgm"))

    got = {}
    failures = []
    with PrefetchingImageLoader(paths, num_threads=3) as loader:
        for idx, img in loader:
            if img is None:
                failures.append(idx)
            else:
                got[idx] = img
    assert failures == [5]
    assert len(got) == 12
    for k, arr in truth.items():
        idx = k if k < 5 else k + 1
        np.testing.assert_allclose(got[idx], arr / 255.0, atol=1e-6)


@pytest.mark.slow
def test_native_runtime_under_thread_sanitizer(tmp_path):
    """Race-detection coverage for the C++ JobQueue/worker-pool runtime
    (ref: CMakeLists.txt:63 ASAN_ENABLED; the reference has no TSAN
    config at all). Builds the TSAN variant, preloads libtsan, drives
    the prefetching loader from a subprocess, and fails on any
    ThreadSanitizer report."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(repo, "native")
    r = subprocess.run(["make", "-C", native, "tsan"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    libtsan = subprocess.run(
        ["gcc", "-print-file-name=libtsan.so"],
        capture_output=True, text=True).stdout.strip()
    if not os.path.isabs(libtsan):
        pytest.skip("libtsan runtime not available")

    for k in range(6):
        _write_pgm(tmp_path / f"im{k}.pgm",
                   np.arange(64 * 48, dtype=np.uint8).reshape(48, 64))
    driver = f"""
import glob, sys
sys.path.insert(0, {repo!r})
import sba_tpu.io.native_loader as nl
nl._LIB_PATH = {os.path.join(native, "libsba_native_tsan.so")!r}
paths = sorted(glob.glob({str(tmp_path)!r} + "/*.pgm"))
with nl.PrefetchingImageLoader(paths, num_threads=4, queue_size=2) as ld:
    out = [(i, img) for i, img in ld]
assert len(out) == len(paths), len(out)
assert all(img is not None for _, img in out)
print("TSAN_DRIVE_OK")
"""
    env = dict(os.environ, LD_PRELOAD=libtsan,
               TSAN_OPTIONS="exitcode=66")
    r = subprocess.run([sys.executable, "-c", driver],
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert "TSAN_DRIVE_OK" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
    assert "WARNING: ThreadSanitizer" not in r.stderr, r.stderr[-4000:]
    assert r.returncode == 0
