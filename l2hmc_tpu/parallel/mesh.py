"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed bootstrap
(reference src/l2hmc/utils/dist.py:197-346 — MPI rank discovery, NCCL/Gloo
process groups, Horovod/DeepSpeed engines). On TPU there is no rendezvous
to manage inside the framework: `jax.distributed.initialize()` (multi-host)
plus a 1-D `Mesh` over all devices, chains sharded along it, is the whole
story. Gradients all-reduce automatically because the loss is a mean over
the sharded chain axis — XLA inserts the psum over ICI.

A second 'lattice' axis is reserved for future lattice-domain
decomposition (shard_map + halo exchange) on volumes that exceed one
chip's HBM — the analogue of "context parallelism" here (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed() -> int:
    """Initialize multi-host JAX when running on more than one process
    (reference dist.py:setup_torch_distributed equivalent). Safe no-op in
    single-process runs. Returns the process index."""
    try:
        import os
        if int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1:
            jax.distributed.initialize()
    except Exception:
        pass
    return jax.process_index()


def make_mesh(ndevices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis: str = "data") -> Mesh:
    """1-D mesh over the chain ('data') axis."""
    if devices is None:
        devices = jax.devices()
    if ndevices is not None:
        devices = devices[:ndevices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def chain_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (chain) axis; replicate the rest."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chains(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place x with its chain axis sharded over the mesh."""
    return jax.device_put(x, chain_sharding(mesh, x.ndim))


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)
