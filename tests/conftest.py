"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-chip sharding code without a
pod (see SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8.
x64 is enabled so the SU(3) complex128 paths are testable; all library code
uses explicit dtypes, so f32 paths stay f32.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# test-only compile-time diet: the big SPMD SU(3) train graphs spend
# minutes in LLVM on one core; backend opt level 1 + skipping expensive
# LLVM passes cuts XLA-compile ~20% with no effect on test semantics
# (measured 182 s -> 146 s on the sharded f32 train step)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=1"
    + " --xla_llvm_disable_expensive_passes=true"
)

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# does force the (8-virtual-device) host CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# the SU(3) SPMD graphs are large; cache compilations across test runs
# (first run pays, reruns are instant). The cache dir is keyed by a host
# fingerprint so AOT entries written on another machine are MISSES, not
# SIGILL/SIGSEGV inside the deserializer (a full-suite run once crashed
# at 89% reading a foreign entry). Cache WRITES are fork-isolated:
# jax 0.9's serializer segfaulted the one-process suite deterministically
# at ~98% (rc=139, inside a pjit compile that crossed the write threshold
# only in a warm process) — in a forked child a crash loses one cache
# entry instead of the run, and the child writes entries ATOMICALLY
# (tmp + os.replace) so its own crash can't leave a truncated file.
# Cache READS of not-yet-verified entries are probe-deserialized in a
# forked child first (deserialize of a corrupt entry SIGSEGVed the main
# process at the same test once the write crash was contained); a crashed
# probe deletes the entry and recompiles. With both sides crash-proof,
# the write threshold drops 30 s -> 5 s so warm suite runs skip far more
# XLA compiles.
from l2hmc_tpu.utils.compile_cache import configure as _configure_cache  # noqa: E402

_configure_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))
