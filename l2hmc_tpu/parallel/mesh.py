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


_dist_initialized = False


def setup_distributed() -> int:
    """Multi-host bootstrap, wired unconditionally into Experiment
    construction the way the reference wires setup_torch_distributed
    into its Experiment (reference experiment/pytorch/experiment.py:154,
    utils/dist.py:237-346). Returns the process index. Idempotent.

    One JAX process per host: `jax.distributed.initialize()` reads
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (set by
    pod launchers / GKE), or auto-discovers the coordinator from TPU
    metadata when only a process count is given. Single-process runs
    (no multi-process env) are a no-op. A half-configured pod raises
    rather than silently training single-host — the reference's MPI
    bootstrap fails the same way when ranks can't rendezvous.
    """
    global _dist_initialized
    if _dist_initialized:
        return jax.process_index()
    import os
    nproc = os.environ.get("JAX_NUM_PROCESSES") \
        or os.environ.get("NUM_PROCESSES")
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") \
        or os.environ.get("COORDINATOR_ADDRESS")
    if coord or (nproc and int(nproc) > 1):
        jax.distributed.initialize()
    _dist_initialized = True
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
