"""Lattice + Lie-group numerics for l2hmc_tpu.

These are the ops that the reference implements as torch/TF tensor math
(reference `src/l2hmc/group/**`, `src/l2hmc/lattice/**`); here they are pure
jax.numpy functions (fusable by XLA) with Pallas TPU kernels for the hot
paths in `l2hmc_tpu.ops.pallas`.
"""
