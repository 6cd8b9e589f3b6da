"""Parallelism: device mesh + chain-axis sharding.

Replaces the reference's DDP/Horovod/DeepSpeed data parallelism
(reference src/l2hmc/utils/dist.py) with jax.sharding: chains shard over
the 'data' mesh axis, parameters replicate, and XLA inserts the gradient
all-reduce (psum over ICI) inside the jitted train step.
"""
from l2hmc_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, chain_sharding, replicated_sharding, shard_chains,
    setup_distributed,
)
