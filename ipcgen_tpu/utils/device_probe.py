"""Fail-fast device health probe for benchmark entry points.

The axon TPU plugin has no connect timeout: when the remote tunnel is down,
``jax.devices()`` blocks FOREVER inside the first jax call, so a benchmark
process hangs silently instead of failing (observed: a 58-minute
bench_pipeline run with zero output).  Benchmarks must therefore check
device health from a SUBPROCESS (whose hang is boundable with a timeout)
before touching jax in-process.
"""

from __future__ import annotations

import subprocess
import sys
import time

_PROBE = (
    "import jax\n"
    "d = jax.devices()\n"
    "import jax.numpy as jnp\n"
    "x = jnp.ones((128, 128))\n"
    "v = float((x @ x).sum())\n"
    "print('DEVICE_OK', d[0].platform, flush=True)\n"
)


def probe_device(timeout_s: float = 120.0, env=None):
    """Return the default platform name ("tpu"/"cpu"/...) or None if the
    runtime fails to initialize within ``timeout_s`` (dead tunnel).

    ``env`` overrides the subprocess environment — callers running under a
    platform-forcing harness (e.g. the test suite exports
    ``JAX_PLATFORMS=cpu``) must strip those variables or the probe reports
    the forced platform instead of the hardware's."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("DEVICE_OK"):
            return line.split()[1]
    return None


def wait_for_device(max_wait_s: float = 900.0, poll_s: float = 60.0,
                    probe_timeout_s: float = 120.0):
    """Poll until the device runtime answers or ``max_wait_s`` elapses.

    Returns the platform name, or None on timeout.  Outages of the remote
    tunnel are often transient; a benchmark invoked during one should wait
    a bounded while rather than either hanging forever (no guard) or
    reporting nothing (immediate failure).
    """
    deadline = time.monotonic() + max_wait_s
    while True:
        platform = probe_device(probe_timeout_s)
        if platform is not None:
            return platform
        if time.monotonic() >= deadline:
            return None
        time.sleep(poll_s)
