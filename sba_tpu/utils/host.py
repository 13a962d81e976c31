"""Host-side computation helpers: keep prep math off the accelerator.

Measured pathology of the axon TPU runtime (2026-08, v5e via tunnel):
the FIRST device->host transfer in a process permanently switches every
subsequent dispatch *sync* into a ~25 ms polling mode — `np.asarray(x)`,
`float(x)`, `.item()` on any TPU-backed array all trigger it, and the
tax then applies to every later `block_until_ready`/implicit sync in
the process (dispatches still pipeline; the fixed cost is per sync, not
per op). A problem generator that round-trips one quaternion through
the chip therefore makes every later solve look ~25 ms slower than the
hardware runs it.

Rules encoded here:

- Host-side logic (problem assembly, layout planning, synthetic data)
  computes in numpy, or — when it wants jnp code — under `on_host()`,
  which scopes the default device to the CPU backend. CPU-backend
  device->host reads do NOT trigger the slow mode.
- Device arrays are created in one direction only (host -> chip), via
  `jnp.asarray`/`jax.device_put` at the end of prep.
- Reading results back after a solve is fine — by then the caller is
  done timing/iterating; the poison only hurts when it lands *before*
  the hot loop.
"""

from __future__ import annotations

import contextlib

import jax


def host_cpu_device():
    """A PROCESS-LOCAL CPU backend device, or None if unavailable.

    Must be local_devices, not devices: under multi-controller JAX
    (jax.distributed) global device 0 belongs to process 0, and pinning
    another process's host math to it creates arrays whose values that
    process cannot fetch."""
    try:
        local = jax.local_devices(backend="cpu")
    except RuntimeError:
        return None
    return local[0] if local else None


def accel_device():
    """First non-CPU local device (the TPU chip under axon), or None.

    The bulk front-end phases (feature extraction, descriptor matching,
    batched pair verification) commit their inputs here so the heavy
    matmul/gather programs run on the chip while the latency-bound host
    loops (incremental mapper) stay on the CPU backend."""
    try:
        for d in jax.local_devices():
            if d.platform != "cpu":
                return d
    except RuntimeError:
        return None
    return None


@contextlib.contextmanager
def on_host():
    """Scope jnp computation to the CPU backend (no-op if unavailable).

    Inside this context, jnp/jit calls run on host CPU and reading their
    results back is free — use for host-side math that wants jax code
    (quaternion helpers, camera models) during problem construction.
    """
    dev = host_cpu_device()
    if dev is None:
        yield
        return
    with jax.default_device(dev):
        yield


def machine_cache_dir(base_dir: str) -> str:
    """Per-machine-type subdirectory for the jax persistent compile cache.

    XLA:CPU AOT executables encode the COMPILE machine's feature set;
    loading them on a host with different features is undefined behavior
    (observed: SIGSEGV in compilation_cache.get_executable_and_time when
    a cache primed on an AMX-capable host was reused elsewhere). The
    sandbox pool mixes machine generations, so key the cache directory
    on the CPU flags."""
    import hashlib
    import os

    tag = "generic"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    path = os.path.join(base_dir, tag)
    os.makedirs(path, exist_ok=True)
    return path
