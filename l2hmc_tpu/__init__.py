"""l2hmc_tpu: TPU-native L2HMC for lattice gauge theory.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of `l2hmc-qcd`
(reference: /root/reference): trainable generalized-leapfrog HMC samplers
for 2D U(1) and 4D SU(3) lattice gauge theory, batch-parallel over Markov
chains, with chain-axis sharding over TPU meshes replacing the reference's
DDP/Horovod/DeepSpeed data parallelism.

Design principles (vs the reference's torch/TF eager object graph):
  * everything is a pytree + pure function; PRNG keys are threaded explicitly
  * the per-leapfrog-step Python loop becomes `lax.scan` over stacked
    per-step parameters (networks, step sizes, masks)
  * one `jit`-compiled function per job type (train step / eval step / hmc
    step) replaces the whole eager Trainer hot path
  * parallelism = `jax.sharding.Mesh` + NamedSharding on the chain axis;
    XLA inserts the gradient all-reduce (psum over ICI)
  * hot lattice ops have Pallas TPU kernels in `l2hmc_tpu.ops.pallas`
"""

__version__ = "0.1.0"
