"""Shared SU(3) test configuration.

EVERY compiled SU(3) test uses this exact config (geometry, nets, loss,
precision) so the whole suite pays for each distinct XLA graph ONCE:
the sharded train/eval/hmc graphs and the single-device train graph
compile in the first test that needs them and cache-hit everywhere else
(in-process via identical HLO in the persistent compilation cache).
XLA compile time is set by jaxpr structure, not array sizes, so the
geometry is the smallest one that still exercises a non-trivial halo
(t=4 over 2 lattice shards) and chain sharding (4 chains over 2).

float32 everywhere: the f64 versions of these graphs compile ~1.7x
slower (308 s vs 182 s for the sharded train step on one core) and the
parity statements only loosen from ~1e-10 to ~1e-5. x64 must be OFF
while tracing f32 graphs (python-float promotion would silently upcast
the loss chain), hence the module fixture below.
"""
import jax
import pytest

from l2hmc_tpu.configs import get_config

SU3_OVERRIDES = [
    "dynamics.nchains=4",
    "dynamics.latvolume=[4, 2, 2, 2]",
    "dynamics.nleapfrog=2",
    "dynamics.eps=0.05",
    "network.units=[6]",
    "network.use_batch_norm=false",
    "network.dropout_prob=0.0",
    "loss.use_mixed_loss=true",
    "loss.aux_weight=0.5",
    "precision=float32",
]


def su3_cfg(extra=()):
    return get_config([*SU3_OVERRIDES, *extra], group="SU3")


@pytest.fixture(autouse=True, scope="module")
def x32_mode():
    """Run the module with x64 disabled (restored afterwards): the
    f32 SU(3) graphs must not see python-float f64 promotion."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)
