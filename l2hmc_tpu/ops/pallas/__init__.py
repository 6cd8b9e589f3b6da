"""Pallas TPU kernels for the hot lattice ops.

This is the rebuild's "native" tier: the reference has no C++/CUDA at all
(SURVEY.md — all heavy math is torch/TF tensor ops on cuBLAS), so the
TPU-native equivalent is hand-fused Mosaic kernels for the ops XLA's
auto-fusion handles suboptimally. Kernels ship with interpret-mode tests
against the jnp reference implementations and are enabled on TPU via
`use_pallas=True` switches at the call sites.
"""
