"""Device synchronization that actually synchronizes.

On the axon TPU backend `jax.block_until_ready` returns immediately
(readiness tracking does not span the tunnel), so any wall-clock timing
based on it measures dispatch, not execution. The only reliable barrier
is a device->host readback. `sync` reduces one leaf to a scalar ON DEVICE
and fetches it — a 4-byte transfer, so the measured time is compute +
one tunnel round trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _scalarize(leaf):
    if jnp.issubdtype(leaf.dtype, jnp.complexfloating):
        return jnp.sum(leaf.real)
    if jnp.issubdtype(leaf.dtype, jnp.floating):
        return jnp.sum(leaf)
    return jnp.sum(leaf.astype(jnp.float32))


def sync(tree) -> float:
    """Block until `tree`'s computation is complete; returns the scalar
    checksum (also useful to defeat dead-code elimination)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return 0.0
    return float(np.asarray(_scalarize(leaves[0])))
