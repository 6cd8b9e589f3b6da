"""Fail-fast guard for wedged TPU backends.

On the axon TPU stack the tunnel admits ONE client session; when a stale
session lingers (e.g. a previous run was killed mid-flight), backend
init inside `jax.devices()` HANGS on a futex forever rather than raising
(observed on a CLI training run: 20 min asleep with 8 s of CPU). bench.py
guards itself with a subprocess probe (bench.py `_probe_backend_subprocess`);
this module gives the same protection to every CLI entry point.

`ensure_backend()` probes `jax.devices()` in a short-lived subprocess
with a hard timeout, retrying with backoff. A hung probe is killed by the
timeout — the parent process never blocks. On persistent failure it exits
with an actionable message instead of hanging the user's terminal.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import time

log = logging.getLogger(__name__)

_PROBE = "import jax; print('NDEV', len(jax.devices()))"


def _probe(timeout_s: float) -> tuple[bool, str]:
    try:
        p = subprocess.run(
            [sys.executable, "-c", _PROBE], capture_output=True, text=True,
            timeout=timeout_s, start_new_session=True)
    except subprocess.TimeoutExpired:
        return False, f"backend init hung >{timeout_s:.0f}s (stale TPU session?)"
    if p.returncode == 0 and "NDEV" in p.stdout:
        return True, p.stdout.strip()
    tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
    return False, (tail[0] if tail else f"rc={p.returncode}")


def ensure_backend(backoffs=(0, 10, 20, 30), probe_timeout: float = 90.0,
                   ) -> None:
    """Verify the default jax backend is reachable before this process
    touches it. No-op when the run is pinned to CPU (JAX_PLATFORMS=cpu —
    the test/virtual-mesh path) or when L2HMC_SKIP_BACKEND_PROBE=1.
    Exits with a clear message after ~1 min of failed probes."""
    if os.environ.get("L2HMC_SKIP_BACKEND_PROBE") == "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    last = ""
    for attempt, backoff in enumerate(backoffs):
        if backoff:
            log.warning(f"backend probe attempt {attempt} failed ({last}); "
                        f"retrying in {backoff}s")
            time.sleep(backoff)
        ok, detail = _probe(probe_timeout)
        if ok:
            return
        last = detail
    raise SystemExit(
        f"TPU backend is unreachable ({last}). A stale tunnel session from "
        "a killed run can wedge the relay — wait for it to clear, or run on "
        "CPU with JAX_PLATFORMS=cpu (tests/virtual-mesh configs), or skip "
        "this probe with L2HMC_SKIP_BACKEND_PROBE=1.")
