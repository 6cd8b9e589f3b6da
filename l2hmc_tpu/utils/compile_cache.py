"""Machine-keyed persistent compile cache helpers.

jax's persistent compilation cache stores AOT-compiled executables whose
machine code is specialized to the *writing* host's CPU features. Loading
such an entry on a different host is undefined behavior: XLA warns
"machine type doesn't match" and the deserializer can SIGILL or SIGSEGV
(observed: a full-suite run crashed at 89% inside
jax/_src/compilation_cache.py get_executable_and_time reading an entry
written on another machine).

The cache key jax computes does NOT include host CPU features, so we key
the cache *directory* by a host fingerprint instead: entries written on
host A are invisible on host B, turning a potential crash into a clean
recompile. The fingerprint covers the CPU feature flags (the thing the
generated code actually depends on), the arch, and the jax version
(serialization format).
"""
from __future__ import annotations

import hashlib
import logging
import os
import platform

logger = logging.getLogger(__name__)


def host_fingerprint() -> str:
    """Stable 12-hex-char id for (arch, jax version, CPU features)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86: "flags"; arm64: "Features"
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.processor()
    import jax
    raw = f"{platform.machine()}|{jax.__version__}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def machine_cache_dir(base: str, create: bool = True) -> str:
    """Per-host subdirectory of `base` for the jax compilation cache."""
    d = os.path.join(base, host_fingerprint())
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def fork_isolate_cache_writes(timeout_secs: int = 180) -> None:
    """Run persistent-cache WRITES in a forked child so a serializer
    crash can never kill the main process.

    jax 0.9's CPU executable serializer (`LoadedExecutable.serialize()`
    inside `put_executable_and_time`) can SIGSEGV on large/late compiles:
    the full test suite died deterministically (rc=139, twice) at ~98%
    inside a pjit compile that crossed the write threshold only in a
    long-lived warm process (tests/test_trainer.py::
    test_merge_directions_false_routes_single_direction_kernel — green
    standalone). The write path is pure output — serialize + compress +
    file put — so it is safe to run in an `os.fork()` child: a child
    segfault loses that one cache entry and nothing else. The child
    carries a SIGALRM watchdog in case fork-from-a-threaded-process
    inherits a held lock. CPU backend only: that is where the crash
    class lives, and forking with a live TPU tunnel client is unsafe.
    """
    import signal

    import jax._src.compilation_cache as cc

    if getattr(cc.put_executable_and_time, "__l2hmc_fork_isolated__", False):
        return
    orig = cc.put_executable_and_time

    def safe_put(cache_key, module_name, executable, backend, compile_time):
        if getattr(backend, "platform", None) != "cpu" or not hasattr(
                os, "fork"):
            return orig(cache_key, module_name, executable, backend,
                        compile_time)
        import warnings
        with warnings.catch_warnings():
            # fork-with-threads is exactly the point here: the child only
            # serializes+writes then _exits, and a SIGALRM watchdog covers
            # the inherited-lock deadlock case the warning is about.
            warnings.filterwarnings(
                "ignore", message=r".*os\.fork.*", category=RuntimeWarning)
            pid = os.fork()
        if pid == 0:
            code = 0
            try:
                signal.alarm(timeout_secs)
                orig(cache_key, module_name, executable, backend,
                     compile_time)
            except BaseException:
                code = 1
            finally:
                os._exit(code)
        _, wstatus = os.waitpid(pid, 0)
        if wstatus != 0:
            logger.warning(
                "persistent-cache write for %r died in the isolated child "
                "(wait status %d); entry skipped, main process unaffected",
                module_name, wstatus)

    safe_put.__l2hmc_fork_isolated__ = True
    cc.put_executable_and_time = safe_put


def configure(base: str, min_compile_secs: int = 5,
              fork_writes: bool = True) -> str:
    """Point jax's persistent cache at the per-host subdir of `base`.

    Writes are fork-isolated by default (see fork_isolate_cache_writes):
    with the serializer crash contained to a throwaway child, the write
    threshold can drop from the old defensive 30 s to 5 s, so warm test
    runs skip far more of the XLA compiles.
    """
    import jax
    d = machine_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    if fork_writes:
        fork_isolate_cache_writes()
    return d
