"""2D U(1) lattice gauge theory: Wilson action, force, observables.

JAX counterpart of the reference's `LatticeU1`
(reference src/l2hmc/lattice/u1/pytorch/lattice.py:50-308). Link field
layout: x[(nb,) 2, nt, nx] of phase angles; axis 0 of the non-batch dims is
the direction mu (0 = t, 1 = x).

The force here is *closed form* (the plaquette staple derivative) rather
than autograd-through-the-action like the reference (lattice.py:102-117);
`grad_action_autodiff` keeps the jax.grad path for cross-checking. Both are
pure elementwise trig + rolls, which XLA fuses into a handful of kernels.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from l2hmc_tpu.ops import u1 as g

PI = jnp.pi
TWO_PI = 2.0 * jnp.pi


class Charges(NamedTuple):
    intQ: jax.Array
    sinQ: jax.Array


def plaq_exact(beta) -> jax.Array:
    """Exact infinite-volume average plaquette <cos W> = I1(beta)/I2(beta).

    The reference uses torch.special.i1/i0 (lattice.py:37-42); jax.scipy
    ships i0e/i1e (exponentially scaled), whose ratio equals i1/i0.
    """
    beta = jnp.asarray(beta, dtype=jnp.float32)
    return jax.scipy.special.i1e(beta) / jax.scipy.special.i0e(beta)


def project_angle(x: jax.Array) -> jax.Array:
    """Map angles into (-pi, pi] (lattice.py:45-47)."""
    return x - TWO_PI * jnp.floor((x + PI) / TWO_PI)


def _to_lattice(x: jax.Array, nt: int, nx: int) -> jax.Array:
    return x.reshape(x.shape[0], 2, nt, nx)


def wilson_loops(x: jax.Array, nt: int, nx: int) -> jax.Array:
    """1x1 Wilson loops W[t,x] = xu[t,x] + xv[t+1,x] - xu[t,x+1] - xv[t,x].

    (lattice.py:154-159; rolls with negative shift index the +mu neighbor.)
    Returns shape (nb, nt, nx).
    """
    x = _to_lattice(x, nt, nx)
    xu = x[:, 0]
    xv = x[:, 1]
    return (
        xu
        + jnp.roll(xv, -1, axis=1)
        - jnp.roll(xu, -1, axis=2)
        - xv
    )


def wilson_loops4x4(x: jax.Array, nt: int, nx: int) -> jax.Array:
    """Closed 4x4 Wilson loops.

    W4[n] = sum_k xu(n + k e1) + sum_k xv(n + 4 e1 + k e2)
          - sum_k xu(n + k e1 + 4 e2) - sum_k xv(n + k e2),  k = 0..3,
    with direction 0 (xu) stepping along the t axis and direction 1 (xv)
    along the x axis, matching the 1x1 plaquette convention above.

    NOTE: the reference's version (lattice.py:161-186) sums an *open* path
    (5 + 3 links forward vs 3 + 5 backward, with the axis convention
    flipped relative to its own 1x1 loops), so it is not gauge invariant;
    we implement the closed loop instead (verified by a gauge-invariance
    test).
    """
    x = _to_lattice(x, nt, nx)
    xu = x[:, 0]
    xv = x[:, 1]
    out = jnp.zeros_like(xu)
    for k in range(4):
        out = out + jnp.roll(xu, -k, axis=1)
        out = out + jnp.roll(xv, (-4, -k), axis=(1, 2))
        out = out - jnp.roll(xu, (-k, -4), axis=(1, 2))
        out = out - jnp.roll(xv, -k, axis=2)
    return out


def action(x: jax.Array, beta, nt: int, nx: int) -> jax.Array:
    """Wilson action S = beta * sum_p (1 - cos W_p) per chain (lattice.py:80-86)."""
    w = wilson_loops(x, nt, nx)
    return action_from_wloops(w, beta)


def action_from_wloops(wloops: jax.Array, beta) -> jax.Array:
    return beta * jnp.sum(1.0 - jnp.cos(wloops), axis=(1, 2))


def plaq_adjoint(y: jax.Array, shape) -> jax.Array:
    """The adjoint A^T of the linear plaquette map W = A x:
        (A^T y)_u[t,x] = y[t,x] - y[t,x-1]
        (A^T y)_v[t,x] = y[t-1,x] - y[t,x]
    so that dS/dx = beta * A^T sin(W)."""
    du = y - jnp.roll(y, 1, axis=2)
    dv = jnp.roll(y, 1, axis=1) - y
    return jnp.stack([du, dv], axis=1).reshape(shape)


def grad_action(x: jax.Array, beta, nt: int, nx: int) -> jax.Array:
    """Closed-form dS/dx = beta * A^T sin(A x).

    With W[t,x] = xu[t,x] + xv[t+1,x] - xu[t,x+1] - xv[t,x] and
    S = beta sum (1 - cos W):
        dS/dxu[t,x] = beta (sin W[t,x] - sin W[t,x-1])
        dS/dxv[t,x] = beta (sin W[t-1,x] - sin W[t,x])
    Identical values to autograd through the action (the reference's
    grad_action, lattice.py:102-117) — asserted in tests — at roughly half
    the flops and with no VJP graph.
    """
    w = wilson_loops(x, nt, nx)
    return beta * plaq_adjoint(jnp.sin(w), x.shape)


def grad_action_autodiff(x: jax.Array, beta, nt: int, nx: int) -> jax.Array:
    """jax.grad through the action — oracle for grad_action."""
    s = lambda y: jnp.sum(action(y, beta, nt, nx))
    return jax.grad(s)(x)


def plaqs(wloops: jax.Array) -> jax.Array:
    """<cos W> per chain (lattice.py:188-203)."""
    return jnp.mean(jnp.cos(wloops), axis=(1, 2))


def plaqs4x4(wloops4x4: jax.Array) -> jax.Array:
    return jnp.mean(jnp.cos(wloops4x4), axis=(1, 2))


def sin_charges(wloops: jax.Array) -> jax.Array:
    """sinQ = sum sin(W) / 2pi per chain (lattice.py:221-224)."""
    return jnp.sum(jnp.sin(wloops), axis=(1, 2)) / TWO_PI


def int_charges(wloops: jax.Array) -> jax.Array:
    """intQ = sum proj(W) / 2pi per chain (lattice.py:226-228)."""
    return jnp.sum(project_angle(wloops), axis=(1, 2)) / TWO_PI


def charges(wloops: jax.Array) -> Charges:
    return Charges(intQ=int_charges(wloops), sinQ=sin_charges(wloops))


def calc_metrics(x: jax.Array, nt: int, nx: int) -> dict[str, jax.Array]:
    """plaqs/p4x4/intQ/sinQ metric dict (lattice.py:131-149 — the
    reference also reports the 4x4-loop average as `p4x4`)."""
    w = wilson_loops(x, nt, nx)
    q = charges(w)
    return {
        "plaqs": plaqs(w),
        "p4x4": plaqs4x4(wilson_loops4x4(x, nt, nx)),
        "intQ": q.intQ,
        "sinQ": q.sinQ,
    }


def plaqs_diff(x: jax.Array, beta, nt: int, nx: int) -> jax.Array:
    """plaq_exact(beta) - plaqs(x) per chain (lattice.py:119-129)."""
    w = wilson_loops(x, nt, nx)
    return plaq_exact(beta).astype(x.dtype) - plaqs(w)


class LatticeU1:
    """Thin OO wrapper bundling the shape info, mirroring the reference API.

    All math lives in the module-level pure functions above so they can be
    used directly inside jitted/scanned code.
    """

    def __init__(self, nchains: int, shape, use_pallas: bool = False):
        assert len(shape) == 2
        self.g = g
        self.nt, self.nx = shape
        self.volume = self.nt * self.nx
        self.nplaqs = self.nt * self.nx
        self.nchains = nchains
        self.xshape = (2, self.nt, self.nx)
        self._shape = (nchains, *self.xshape)
        self.xdim = 2 * self.nt * self.nx
        self.use_pallas = use_pallas

    def random(self, key, dtype=jnp.float32):
        return g.random(key, self._shape, dtype)

    def random_momentum(self, key, dtype=jnp.float32):
        return g.random_momentum(key, self._shape, dtype)

    def kinetic_energy(self, v):
        return g.kinetic_energy(v)

    def action(self, x, beta):
        return action(x, beta, self.nt, self.nx)

    def grad_action(self, x, beta):
        if self.use_pallas:
            from l2hmc_tpu.ops.pallas import u1_kernels
            force, _ = u1_kernels.force_action_ad(
                x, jnp.asarray(beta, x.dtype), self.nt, self.nx)
            return force
        return grad_action(x, beta, self.nt, self.nx)

    def wilson_loops(self, x):
        return wilson_loops(x, self.nt, self.nx)

    def wilson_loops4x4(self, x):
        return wilson_loops4x4(x, self.nt, self.nx)

    def plaqs(self, x=None, wloops=None):
        w = self.wilson_loops(x) if wloops is None else wloops
        return plaqs(w)

    def plaqs4x4(self, x=None, wloops4x4=None):
        w = self.wilson_loops4x4(x) if wloops4x4 is None else wloops4x4
        return plaqs4x4(w)

    def charges(self, x=None, wloops=None):
        w = self.wilson_loops(x) if wloops is None else wloops
        return charges(w)

    def int_charges(self, x=None, wloops=None):
        w = self.wilson_loops(x) if wloops is None else wloops
        return int_charges(w)

    def sin_charges(self, x=None, wloops=None):
        w = self.wilson_loops(x) if wloops is None else wloops
        return sin_charges(w)

    def calc_metrics(self, x):
        return calc_metrics(x, self.nt, self.nx)

    def plaqs_diff(self, beta, x):
        return plaqs_diff(x, beta, self.nt, self.nx)

    def plaq_exact(self, beta):
        return plaq_exact(beta)
