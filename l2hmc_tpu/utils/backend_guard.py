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

Caveat: the probe subprocess itself opens a client session on the
one-session tunnel, so the guard must NOT run while a legitimate job
holds the tunnel — a new CLI invocation alongside an active training run
will burn the full retry ladder and exit. That is the intended behavior
(the tunnel genuinely is busy); just don't interpret it as a wedge.
"""
from __future__ import annotations

import logging
import os
import signal
import subprocess
import sys
import time

log = logging.getLogger(__name__)

# The probe runs a TINY jit end-to-end, not just jax.devices(): a wedged
# tunnel can present a second, subtler failure mode where device listing
# still answers but the remote-compile service hangs (observed: a
# 256x256 jit compile blocked >3 min at 0% host CPU while jax.devices()
# returned instantly). Compile+execute+transfer is the full path a real
# run needs; ~2 s extra on a healthy backend.
_PROBE = ("import jax, jax.numpy as jnp; "
          "v = jax.jit(lambda x: (x * x).sum())(jnp.arange(64.0)); "
          "print('NDEV', len(jax.devices()), float(v))")


def _probe(timeout_s: float) -> tuple[bool, str]:
    p = subprocess.Popen(
        [sys.executable, "-c", _PROBE], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, start_new_session=True)
    try:
        out, _err = p.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        # Kill the probe's WHOLE process group (start_new_session made the
        # probe its own pgid): killing only the direct child could orphan a
        # backend-client grandchild, which would itself become the stale
        # tunnel session this guard exists to detect.
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        p.wait()
        return False, f"backend init hung >{timeout_s:.0f}s (stale TPU session?)"
    if p.returncode == 0 and "NDEV" in out:
        return True, out.strip()
    tail = (_err or out).strip().splitlines()[-1:]
    return False, (tail[0] if tail else f"rc={p.returncode}")


def ensure_backend(backoffs=(0, 10, 20, 30), probe_timeout: float = 90.0,
                   ) -> None:
    """Verify the default jax backend is reachable before this process
    touches it. No-op when the run is pinned to CPU (JAX_PLATFORMS=cpu —
    the test/virtual-mesh path) or when L2HMC_SKIP_BACKEND_PROBE=1.

    Worst case before giving up: every probe hangs to `probe_timeout`,
    so len(backoffs)*probe_timeout + sum(backoffs) — ~7 min at the
    defaults (4*90s + 60s). Typical failure (backend raises fast) exits
    in ~1 min; the 90 s probe budget exists because a HEALTHY first
    contact through the tunnel can take tens of seconds."""
    if os.environ.get("L2HMC_SKIP_BACKEND_PROBE") == "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    last = ""
    for attempt, backoff in enumerate(backoffs, start=1):
        if backoff:
            time.sleep(backoff)
        ok, detail = _probe(probe_timeout)
        if ok:
            return
        last = detail
        if attempt < len(backoffs):
            log.warning(
                f"backend probe attempt {attempt}/{len(backoffs)} failed "
                f"({detail}); retrying in {backoffs[attempt]}s")
    raise SystemExit(
        f"TPU backend is unreachable ({last}). A stale tunnel session from "
        "a killed run can wedge the relay — wait for it to clear, or run on "
        "CPU with JAX_PLATFORMS=cpu (tests/virtual-mesh configs), or skip "
        "this probe with L2HMC_SKIP_BACKEND_PROBE=1.")
