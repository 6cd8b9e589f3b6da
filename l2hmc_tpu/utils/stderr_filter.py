"""Filter XLA's false-positive CPU AOT "could SIGILL" warnings from fd 2.

Loading ANY persistent-cache CPU executable prints, from C++ (so Python
logging filters cannot touch it):

    E... cpu_aot_loader.cc:210] Loading XLA:CPU AOT result. Target machine
    feature +prefer-no-gather is not  supported on the host machine.
    Machine type used for XLA:CPU compilation doesn't match the machine
    type for execution. ... This could lead to execution errors such as
    SIGILL.

even on the very machine that wrote the entry minutes earlier: the loader
compares the LLVM *compile-time* feature string against the host's
/proc/cpuinfo feature list, and LLVM tuning hints
(`+prefer-no-gather` / `+prefer-no-scatter`, inserted by XLA's CPU target
picker on every AVX-512 part) never appear in cpuinfo, so the subset check
cannot pass on any machine. Verified against MULTICHIP_r04.json: the
"host machine features" list in the warning is exactly the compile list
minus those two tuning hints — same machine, zero real mismatch.

Entries from genuinely different machines can not reach the loader here at
all (the cache directory is host-fingerprint-keyed — see
utils/compile_cache.py). Defense in depth anyway: a warning naming any
feature OTHER than a known tuning hint is NOT suppressed and passes
through to real stderr untouched.
"""
from __future__ import annotations

import atexit
import os
import re
import threading

# LLVM tuning/preference pseudo-features that never appear in host cpuinfo.
_TUNING_HINTS = (
    "prefer-no-gather",
    "prefer-no-scatter",
    "prefer-128-bit",
    "prefer-256-bit",
)

_BENIGN = re.compile(
    (r"cpu_aot_loader.*Target machine feature \+(%s) is not\s+supported"
     % "|".join(re.escape(h) for h in _TUNING_HINTS)).encode())

_installed = False


def install() -> None:
    """Redirect fd 2 through a line filter that drops only the benign
    tuning-hint AOT warnings. Idempotent; restores fd 2 at exit."""
    global _installed
    if _installed:
        return
    _installed = True

    real_stderr = os.dup(2)
    rd, wr = os.pipe()
    os.dup2(wr, 2)
    os.close(wr)

    def pump() -> None:
        buf = b""
        try:
            while True:
                chunk = os.read(rd, 65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if not _BENIGN.search(line):
                        os.write(real_stderr, line + b"\n")
            if buf and not _BENIGN.search(buf):
                os.write(real_stderr, buf)
        except OSError:
            pass
        finally:
            try:
                os.close(rd)
            except OSError:
                pass

    t = threading.Thread(target=pump, name="aot-warning-filter", daemon=True)
    t.start()

    def restore() -> None:
        try:
            # fd 2 was the pipe's last writer; dup2 over it leaves the
            # pipe writer-less, so the pump sees EOF and exits cleanly.
            os.dup2(real_stderr, 2)
        except OSError:
            pass
        t.join(timeout=1.0)

    atexit.register(restore)
