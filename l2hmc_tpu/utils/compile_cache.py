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
import os
import platform


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


def configure(base: str, min_compile_secs: int = 30) -> str:
    """Point jax's persistent cache at the per-host subdir of `base`.

    The write threshold stays high: jax 0.9's executable serializer has
    segfaulted writing mid-size (~15 s) CPU executables; only the big
    SPMD graphs are worth persisting anyway.
    """
    import jax
    d = machine_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return d
