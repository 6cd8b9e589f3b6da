"""4D SU(3) lattice gauge theory: Wilson/DBW2 action, force, observables.

JAX counterpart of the reference's `LatticeSU3`
(reference src/l2hmc/lattice/su3/pytorch/lattice.py:41-349). Field layout:
x[nb, 4, nt, nx, ny, nz, 3, 3] complex, v same shape (TAH matrices).

Plaquettes are batched 3x3 matmuls + rolls over the 6 (mu, nu) planes —
exactly the shape XLA tiles well; the optional `c1` rectangle terms give
the DBW2/Iwasaki family (arXiv hep-lat/0512017, as in lattice.py:83-112).

The force is the analytic staple derivative (closed form, the lattice-QCD
standard) with an autodiff fallback used as the correctness oracle; both
produce the torch-convention gradient contracted to the algebra via
projectTAH(dS/dx · x†) (lattice.py:299-308).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.ops import su3 as g


class Charges(NamedTuple):
    intQ: jax.Array
    sinQ: jax.Array


def _to_lattice(x: jax.Array, latvolume) -> jax.Array:
    return x.reshape(x.shape[0], 4, *latvolume, 3, 3)


def _plane_loops(x: jax.Array, u: int, v: int, roll=jnp.roll):
    """yuv = U_u(n) U_v(n+u), yvu = U_v(n) U_u(n+v) for one (u, v) plane.

    Axis u+1 of the per-direction field (nb, nt, nx, ny, nz, 3, 3) is the
    lattice direction u (lattice.py:170-176). `roll` is jnp.roll for a
    single-device lattice or a halo-exchange roll (parallel/halo.py) when
    a lattice axis is sharded over the mesh.
    """
    xu = x[:, u]
    xv = x[:, v]
    yuv = xu @ roll(xv, -1, axis=u + 1)
    yvu = xv @ roll(xu, -1, axis=v + 1)
    return xu, xv, yuv, yvu


def _plane_rect_traces(x, u, v, xu, xv, yuv, yvu, roll=jnp.roll):
    """Traces of the two 2x1 rectangles in the (u, v) plane
    (lattice.py:180-195)."""
    yu = roll(xu, -1, axis=v + 1)
    yv = roll(xv, -1, axis=u + 1)
    uu = g.mul(xv, yuv, adjoint_a=True)
    ur = g.mul(xu, yvu, adjoint_a=True)
    ul = g.mul(yuv, yu, adjoint_b=True)
    ud = g.mul(yvu, yv, adjoint_b=True)
    ul_ = roll(ul, -1, axis=u + 1)
    ud_ = roll(ud, -1, axis=v + 1)
    tr_urul = g.trace(g.mul(ur, ul_, adjoint_b=True))
    tr_uuud = g.trace(g.mul(uu, ud_, adjoint_b=True))
    return tr_urul, tr_uuud


def wilson_loops(x: jax.Array, latvolume, needs_rect: bool = False,
                 roll=jnp.roll):
    """Stacked plaquette traces (6, nb, nt, nx, ny, nz) over the 6 planes,
    plus rectangle traces (12, ...) when requested (lattice.py:157-199)."""
    x = _to_lattice(x, latvolume)
    plaqs = []
    rects = []
    for u in range(1, 4):
        for v in range(0, u):
            xu, xv, yuv, yvu = _plane_loops(x, u, v, roll=roll)
            plaqs.append(g.trace(g.mul(yuv, yvu, adjoint_b=True)))
            if needs_rect:
                rects.extend(_plane_rect_traces(x, u, v, xu, xv, yuv, yvu,
                                                roll=roll))
    ps = jnp.stack(plaqs)
    rs = jnp.stack(rects) if needs_rect else None
    return ps, rs


def coeffs(beta, c1: float):
    """Plaquette/rectangle couplings (lattice.py:83-91)."""
    beta = jnp.asarray(beta)
    return {"plaq": beta * (1.0 - 8.0 * c1), "rect": beta * c1}


def action(x: jax.Array, beta, latvolume, c1: float = 0.0,
           roll=jnp.roll) -> jax.Array:
    """S = -(1/3) [beta(1-8c1) sum Re tr P + beta c1 sum Re tr R] per chain
    (lattice.py:252-269)."""
    cs = coeffs(beta, c1)
    ps, rs = wilson_loops(x, latvolume, needs_rect=(c1 != 0), roll=roll)
    psum = ps.real.sum(axis=tuple(range(2, ps.ndim))).sum(0)
    act = cs["plaq"] * psum
    if c1 != 0:
        rsum = rs.real.sum(axis=tuple(range(2, rs.ndim))).sum(0)
        act = act + cs["rect"] * rsum
    return act * (-1.0 / 3.0)


# ---------------------------------------------------------------------------
# Forces
# ---------------------------------------------------------------------------
def _wirtinger_grad(f, x: jax.Array) -> jax.Array:
    """d(real f)/dx in the torch convention: dRe + i dIm.

    torch.autograd returns exactly this layout for real losses of complex
    leaves, which is what the reference contracts with x† (lattice.py:306-308).
    """
    xr, xi = x.real, x.imag
    gr, gi = jax.grad(
        lambda r, i: jnp.sum(f(jax.lax.complex(r, i))), argnums=(0, 1)
    )(xr, xi)
    return jax.lax.complex(gr, gi)


def grad_action_autodiff(x: jax.Array, beta, latvolume,
                         c1: float = 0.0) -> jax.Array:
    """Algebra-valued force via autodiff: projectTAH(dS/dx · x†)."""
    shape = x.shape
    xl = _to_lattice(x, latvolume)
    dsdx = _wirtinger_grad(lambda y: action(y, beta, latvolume, c1), xl)
    f = g.projectTAH(dsdx @ g.adjoint(xl))
    return f.reshape(shape)


def staples(x: jax.Array, latvolume, roll=jnp.roll) -> jax.Array:
    """Sum of the 6 plaquette staples A_u(n) for every link U_u(n).

    For S ⊃ tr[U_u(n) A_u(n)], the staple in the (u, v) plane is
      A = U_v(n+u) U_u†(n+v) U_v†(n)  +  U_v†(n+u-v) U_u†(n-v) U_v(n-v).
    Returns shape (nb, 4, *latvolume, 3, 3).
    """
    x = _to_lattice(x, latvolume)
    out = []
    for u in range(4):
        acc = None
        xu = x[:, u]
        for v in range(4):
            if v == u:
                continue
            xv = x[:, v]
            xv_pu = roll(xv, -1, axis=u + 1)              # U_v(n+u)
            xu_pv = roll(xu, -1, axis=v + 1)              # U_u(n+v)
            up = xv_pu @ g.adjoint(xu_pv) @ g.adjoint(xv)
            xv_mv = roll(xv, 1, axis=v + 1)               # U_v(n-v)
            xu_mv = roll(xu, 1, axis=v + 1)               # U_u(n-v)
            xv_pu_mv = roll(xv_mv, -1, axis=u + 1)        # U_v(n+u-v)
            down = g.adjoint(xv_pu_mv) @ g.adjoint(xu_mv) @ xv_mv
            acc = up + down if acc is None else acc + (up + down)
        out.append(acc)
    return jnp.stack(out, axis=1)


def grad_action(x: jax.Array, beta, latvolume, c1: float = 0.0,
                roll=jnp.roll) -> jax.Array:
    """Closed-form force for the plaquette action.

    For S = -(b/3) sum_p Re tr P (b = beta(1-8c1)): the torch-convention
    gradient of Re tr[U M] w.r.t. U is M†, so dS/dU_u(n) = -(b/3) A_u(n)†
    with A the 6-plaquette staple sum. Contracting as in the reference
    (projectTAH(dS/dU · U†), lattice.py:299-308) and using
    projectTAH(X†) = -projectTAH(X):
        F = (b/3) projectTAH(U A)
    Verified against the autodiff oracle in tests. Falls back to autodiff
    for the rectangle (c1 != 0) terms.
    """
    if c1 != 0.0:
        return grad_action_autodiff(x, beta, latvolume, c1)
    shape = x.shape
    xl = _to_lattice(x, latvolume)
    b = jnp.asarray(beta) * (1.0 - 8.0 * c1)
    ua = xl @ staples(xl, latvolume, roll=roll)
    f = (b / 3.0) * g.projectTAH(ua)
    return f.reshape(shape)


# ---------------------------------------------------------------------------
# Observables (lattice.py:201-240)
# ---------------------------------------------------------------------------
def plaqs(wl: jax.Array, volume: int) -> jax.Array:
    """Average plaquette Re tr P / 3 per chain."""
    psum = wl.real.sum(axis=tuple(range(2, wl.ndim))).sum(0)
    return psum / (6 * 3 * volume)


def sin_charges(wl: jax.Array, volume: int) -> jax.Array:
    qsum = wl.imag.sum(axis=tuple(range(2, wl.ndim))).sum(0)
    return qsum / (6 * 3 * volume)


def int_charges(wl: jax.Array) -> jax.Array:
    qsum = wl.imag.sum(axis=tuple(range(2, wl.ndim))).sum(0)
    return qsum / (32 * np.pi**2)


def charges(wl: jax.Array, volume: int) -> Charges:
    return Charges(intQ=int_charges(wl), sinQ=sin_charges(wl, volume))


class LatticeSU3:
    """OO wrapper mirroring the reference `LatticeSU3` API."""

    def __init__(self, nchains: int, shape, c1: float = 0.0):
        assert len(shape) == 4
        self.g = g
        self.dim = 4
        self.nt, self.nx, self.ny, self.nz = shape
        self.latvolume = tuple(shape)
        self.volume = self.nt * self.nx * self.ny * self.nz
        self.c1 = c1
        self.nchains = nchains
        self.xshape = (4, *shape, 3, 3)
        self._shape = (nchains, *self.xshape)
        self.xdim = int(np.prod(self.xshape)) * 2  # real dof

    def random(self, key, dtype=jnp.complex128):
        return g.random(key, self._shape, dtype)

    def random_momentum(self, key, dtype=jnp.complex128):
        return g.random_momentum(key, self._shape, dtype)

    def kinetic_energy(self, v):
        return g.kinetic_energy(v)

    def action(self, x, beta):
        return action(x, beta, self.latvolume, self.c1)

    def grad_action(self, x, beta):
        return grad_action(x, beta, self.latvolume, self.c1)

    def grad_action_autodiff(self, x, beta):
        return grad_action_autodiff(x, beta, self.latvolume, self.c1)

    def wilson_loops(self, x):
        ps, _ = wilson_loops(x, self.latvolume, needs_rect=False)
        return ps

    def plaqs(self, x=None, wloops=None):
        wl = self.wilson_loops(x) if wloops is None else wloops
        return plaqs(wl, self.volume)

    def charges(self, x=None, wloops=None):
        wl = self.wilson_loops(x) if wloops is None else wloops
        return charges(wl, self.volume)

    def int_charges(self, x=None, wloops=None):
        wl = self.wilson_loops(x) if wloops is None else wloops
        return int_charges(wl)

    def sin_charges(self, x=None, wloops=None):
        wl = self.wilson_loops(x) if wloops is None else wloops
        return sin_charges(wl, self.volume)

    def calc_metrics(self, x):
        wl = self.wilson_loops(x)
        q = charges(wl, self.volume)
        return {
            "plaqs": plaqs(wl, self.volume),
            "intQ": q.intQ,
            "sinQ": q.sinQ,
        }
