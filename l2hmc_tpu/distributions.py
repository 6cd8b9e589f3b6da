"""Haar-uniform SU(N) distribution.

Counterpart of the reference's `HaarSUN`
(reference src/l2hmc/distributions/pytorch/haarSUN.py:22-64): sample
Haar-uniform SU(N) matrices and evaluate the (constant) log-density.

Sampling uses the QR-of-Ginibre construction (Mezzadri, "How to generate
random matrices from the classical compact groups"): QR-decompose a
complex Gaussian, fix the R-diagonal phases so Q is Haar on U(N), then
rotate out the determinant phase to land in SU(N). jnp.linalg.qr of
complex matrices is CPU-only on this TPU stack, so a polar-projection
fallback (projectSU of a Ginibre matrix — the reference's own `random`,
group/su3/pytorch/group.py:113-119) is used on TPU; it is not exactly
Haar but shares the invariance properties the sampler relies on.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from l2hmc_tpu.ops import su3


def _log_haar_volume(n: int) -> float:
    """log of the SU(N) group volume: vol = 2 pi^{(n^2+n-2)/2} /
    (prod_{k=1}^{n-1} k!)."""
    logv = math.log(2.0) + ((n * n + n - 2) / 2.0) * math.log(math.pi)
    for k in range(1, n):
        logv -= math.lgamma(k + 1)
    return logv


class HaarSUN:
    """rsample/log_prob API mirroring the reference (haarSUN.py:30-64)."""

    def __init__(self, n: int = 3, dtype=jnp.complex64):
        self.n = n
        self.dtype = dtype
        self._log_vol = _log_haar_volume(n)

    def rsample(self, key: jax.Array, shape=()) -> jax.Array:
        """Haar-uniform SU(N) samples of batch `shape` (+ (n, n))."""
        rdt = jnp.finfo(self.dtype).dtype
        kr, ki = jax.random.split(key)
        full = tuple(shape) + (self.n, self.n)
        z = jax.lax.complex(
            jax.random.normal(kr, full, dtype=rdt),
            jax.random.normal(ki, full, dtype=rdt),
        ) / jnp.sqrt(jnp.asarray(2.0, rdt))
        if jax.default_backend() == "cpu" and self.n <= 8:
            q, r = jnp.linalg.qr(z)
            d = jnp.diagonal(r, axis1=-2, axis2=-1)
            ph = d / jnp.abs(d)
            q = q * ph.conj()[..., None, :]
            det = jnp.linalg.det(q)
            corr = det ** (-1.0 / self.n)
            return q * corr[..., None, None]
        # TPU fallback: polar projection (no complex QR on TPU)
        assert self.n == 3, "TPU fallback implemented for SU(3)"
        return su3.projectSU(z)

    def log_prob(self, x: jax.Array) -> jax.Array:
        """Haar density is uniform: log p = -log vol(SU(N)) per sample."""
        batch = x.shape[:-2]
        return jnp.full(batch, -self._log_vol,
                        dtype=jnp.finfo(x.dtype).dtype)
