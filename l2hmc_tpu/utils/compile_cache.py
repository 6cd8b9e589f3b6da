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
                "ignore", message=r".*fork.*")
            pid = os.fork()
        if pid == 0:
            code = 0
            try:
                signal.alarm(timeout_secs)
                # Atomic entry files, child-local patch: LRUCache.put uses
                # a bare Path.write_bytes, so a child crash mid-write would
                # leave a PARTIAL entry on disk — and deserializing a
                # truncated entry can SIGSEGV the next *reader* (observed:
                # the suite survived the isolated write crash, then died
                # in get_executable_and_time on the poisoned entry). Write
                # to a sibling tmp file and os.replace() so entries appear
                # on disk all-or-nothing. tmp names never end in "-cache",
                # so a stray tmp from a crash is invisible to the reader.
                import pathlib
                plain = pathlib.Path.write_bytes

                def atomic_write_bytes(self, data, _orig=plain):
                    tmp = self.with_name(self.name + f".tmp{os.getpid()}")
                    _orig(tmp, data)
                    os.replace(tmp, self)

                pathlib.Path.write_bytes = atomic_write_bytes
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


def probe_entry(entry_path: str, probe, timeout_secs: int = 180) -> str:
    """Run `probe()` (a deserialization attempt on `entry_path`) in a
    forked child; classify the cache entry by how the child dies.

    Returns one of:
      "ok"      — probe deserialized the entry successfully (child exit 0);
                  a `.ok` marker is written next to the entry so the probe
                  runs at most once per entry lifetime.
      "miss"    — probe reported no usable entry (child exit 2).
      "deleted" — the child CRASHED (signal/SIGSEGV/alarm) or raised: the
                  entry (+ its -atime twin) is deleted so it can never
                  poison another process, and the caller recompiles.

    This is the read-side twin of fork_isolate_cache_writes: XLA's
    deserializer can SIGSEGV on a corrupt or machine-foreign entry, and a
    segfault in the main process kills the whole run. In a throwaway
    child it costs one recompile.
    """
    import signal
    import warnings
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message=r".*fork.*")
        pid = os.fork()
    if pid == 0:
        code = 1
        try:
            # a crash here is expected-by-design (that's what the fork is
            # for); suppress faulthandler's dump so corrupt entries don't
            # spray tracebacks into the parent's output — the parent logs
            # the verdict with the wait status.
            import faulthandler
            faulthandler.disable()
            signal.alarm(timeout_secs)
            code = 0 if probe() else 2
        except BaseException:
            code = 1
        finally:
            os._exit(code)
    _, wstatus = os.waitpid(pid, 0)
    if wstatus == 0:
        try:
            with open(entry_path + ".ok", "w"):
                pass
        except OSError:
            pass
        return "ok"
    if os.WIFEXITED(wstatus) and os.WEXITSTATUS(wstatus) == 2:
        return "miss"
    logger.warning(
        "persistent-cache entry %r crashed its probe child (wait status "
        "%d); deleting the entry and recompiling", entry_path, wstatus)
    for path in (entry_path, entry_path[:-len("-cache")] + "-atime",
                 entry_path + ".ok"):
        try:
            os.remove(path)
        except OSError:
            pass
    return "deleted"


def fork_isolate_cache_reads(timeout_secs: int = 180) -> None:
    """Verify persistent-cache READS in a forked child before the main
    process deserializes them.

    Why: `backend.deserialize_executable` is native code with no
    validation layer — a truncated entry (crashed writer), a bit-rotted
    file, or an entry whose machine code targets another host can
    SIGSEGV/SIGILL. The machine-keyed directory removes the foreign-host
    class and atomic child writes remove the truncation class, but the
    reader is the last line of defense: any entry this process has not
    yet verified is first deserialized in a fork()ed child. If the child
    dies, the entry is deleted and the caller sees a plain miss (one
    recompile); if it succeeds, a `.ok` marker makes every future read of
    that entry go straight through — steady-state overhead is one
    os.path.exists per cache hit. CPU backend only, same rationale as the
    write path.
    """
    import jax._src.compilation_cache as cc

    if getattr(cc.get_executable_and_time, "__l2hmc_fork_isolated__", False):
        return
    orig = cc.get_executable_and_time

    def safe_get(cache_key, compile_options, backend, executable_devices):
        if getattr(backend, "platform", None) != "cpu" or not hasattr(
                os, "fork"):
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        cache = cc._get_cache(backend)
        path = getattr(cache, "path", None)
        if path is None:  # non-local cache object: nothing to probe
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        entry = os.path.join(str(path), f"{cache_key}-cache")
        if not os.path.exists(entry):
            return None, None
        if not os.path.exists(entry + ".ok"):
            def probe():
                ex, _t = orig(cache_key, compile_options, backend,
                              executable_devices)
                return ex is not None

            verdict = probe_entry(entry, probe, timeout_secs)
            if verdict != "ok":
                return None, None
        return orig(cache_key, compile_options, backend, executable_devices)

    safe_get.__l2hmc_fork_isolated__ = True
    cc.get_executable_and_time = safe_get


def configure(base: str, min_compile_secs: int = 5,
              fork_writes: bool = True, fork_reads: bool = True,
              filter_aot_warnings: bool = True) -> str:
    """Point jax's persistent cache at the per-host subdir of `base`.

    Writes are fork-isolated by default (see fork_isolate_cache_writes):
    with the serializer crash contained to a throwaway child, the write
    threshold can drop from the old defensive 30 s to 5 s, so warm test
    runs skip far more of the XLA compiles. Reads of not-yet-verified
    entries are probe-deserialized in a child first (see
    fork_isolate_cache_reads) so a corrupt entry costs a recompile, never
    the process.
    """
    import jax
    d = machine_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    if fork_writes:
        fork_isolate_cache_writes()
    if fork_reads:
        fork_isolate_cache_reads()
    if filter_aot_warnings:
        # every cache hit otherwise prints XLA's false-positive "could
        # SIGILL" wall (LLVM tuning hints vs cpuinfo — utils/stderr_filter)
        from l2hmc_tpu.utils.stderr_filter import install
        install()
    return d
