"""Structure-of-arrays SU(3): the TPU-native hot path.

The complex (..., 3, 3) AoS layout used by the reference (and by
ops/su3.py, which remains the API/parity layer) is catastrophic on TPU:
Mosaic tiles the trailing two dims to (8, 128), so 3x3 matrices waste
~99% of every vector register and the whole SU(3) stack runs at a few
percent of HBM bandwidth. Measured on v5e: a (N,3,3) complex64 matmul
chain runs 5.08 ms/iter at N = 1.05e5 links; the same math in SoA layout
runs 0.287 ms/iter (17.7x).

Layout here: a field is a pair (re, im) of real arrays shaped
    (3, 3, *batch)
with the color indices LEADING (so every [i, j] component is a full
batch-shaped vector — lanes ride the trailing batch axes) and complex
split into explicit re/im (TPU has no native complex; XLA's decomposition
of AoS complex is what we are escaping). For lattice fields batch =
(d, t, x, y, z, nb): neighbor access is a plain jnp.roll on axes 1..4 of
the batch, and the chain axis sits last where the 128-lane dimension
wants a large extent.

All 3x3 algebra keeps the color axes stacked and unrolls ONLY the k
contraction (see `mm`): XLA fuses the broadcast multiplies into
bandwidth-saturating vector FMAs, measured 1.65x faster than full scalar
unrolling and ~5x smaller traced graphs (compile time).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

SQRT1BY3 = math.sqrt(1.0 / 3.0)


class M3(NamedTuple):
    """SoA 3x3 complex field: re/im each (3, 3, *batch)."""
    re: jax.Array
    im: jax.Array

    @property
    def batch(self):
        return self.re.shape[2:]


# ---------------------------------------------------------------------------
# Converters (API boundary with the complex AoS world)
# ---------------------------------------------------------------------------
def from_complex(x: jax.Array) -> M3:
    """(..., 3, 3) complex -> M3 with batch = x.shape[:-2]."""
    nd = x.ndim
    perm = (nd - 2, nd - 1) + tuple(range(nd - 2))
    xt = jnp.transpose(x, perm)
    return M3(xt.real, xt.imag)


def to_complex(m: M3) -> jax.Array:
    """M3 -> (..., 3, 3) complex."""
    nd = m.re.ndim
    perm = tuple(range(2, nd)) + (0, 1)
    return jax.lax.complex(
        jnp.transpose(m.re, perm), jnp.transpose(m.im, perm))


# ---------------------------------------------------------------------------
# Basic algebra (unrolled)
# ---------------------------------------------------------------------------
def _stack33(rows_re, rows_im, dtype=None) -> M3:
    re = jnp.stack([jnp.stack(r) for r in rows_re])
    im = jnp.stack([jnp.stack(r) for r in rows_im])
    return M3(re, im)


def mm_unrolled(a: M3, b: M3, adj_a: bool = False, adj_b: bool = False) -> M3:
    """c = op(a) @ op(b) fully unrolled over i,j,k. ~460 jaxpr eqns per
    call — kept for A/B comparison; `mm` (einsum) produces identical
    values with ~6 eqns (see module docstring on compile time)."""
    zr = [[None] * 3 for _ in range(3)]
    zi = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            sr = 0.0
            si = 0.0
            for k in range(3):
                if adj_a:
                    ar, ai = a.re[k, i], -a.im[k, i]
                else:
                    ar, ai = a.re[i, k], a.im[i, k]
                if adj_b:
                    br, bi = b.re[j, k], -b.im[j, k]
                else:
                    br, bi = b.re[k, j], b.im[k, j]
                sr = sr + ar * br - ai * bi
                si = si + ar * bi + ai * br
            zr[i][j] = sr
            zi[i][j] = si
    return _stack33(zr, zi)


def _kdot(a: jax.Array, b: jax.Array, ta: bool, tb: bool) -> jax.Array:
    """C[i,j,...] = sum_k op(a)[i,k,...] op(b)[k,j,...] with ONLY the
    k-contraction unrolled: three (3,1,batch)x(1,3,batch) broadcast
    multiplies and two adds. No reduce op, no dot_general — XLA fuses
    this into the same vector FMAs as full unrolling."""
    out = None
    for k in range(3):
        ak = a[k, :, None] if ta else a[:, k, None]
        bk = b[None, :, k] if tb else b[None, k, :]
        t = ak * bk
        out = t if out is None else out + t
    return out


def mm(a: M3, b: M3, adj_a: bool = False, adj_b: bool = False) -> M3:
    """c = op(a) @ op(b), op = adjoint when requested.

    Formulation chosen by measurement on v5e (HMC trajectory at 4^4 x 8,
    MD steps/s | jaxpr eqns per mm):
        full scalar unroll   740 | 464   (round-1 baseline; >1h compile)
        einsum/dot_general   283 |  13   (Mosaic lowers the k=3 dot badly)
        bcast k-axis reduce  455 |  21   (materializes the k axis)
        k-unrolled broadcast 1222 |  97   <-- this one
    The k-unrolled broadcast form keeps the color axes stacked (fewer,
    wider ops than full unrolling -> better vectorization) while cutting
    the traced graph ~5x — the SU(3) training graph dropped from >1h of
    CPU XLA compile to ~90s. Adjoints are index swaps + a sign, never a
    materialized transpose."""
    sa = -1.0 if adj_a else 1.0
    sb = -1.0 if adj_b else 1.0
    rr = _kdot(a.re, b.re, adj_a, adj_b)
    ii = _kdot(a.im, b.im, adj_a, adj_b)
    ri = _kdot(a.re, b.im, adj_a, adj_b)
    ir = _kdot(a.im, b.re, adj_a, adj_b)
    return M3(rr - (sa * sb) * ii, sb * ri + sa * ir)


def trace_mm(a: M3, b: M3, adj_a: bool = False,
             adj_b: bool = False) -> tuple[jax.Array, jax.Array]:
    """(Re, Im) of tr[op(a) op(b)] without forming the product:
    tr[op(a) op(b)] = sum_ik op(a)[i,k] op(b)[k,i] — one aligned
    elementwise multiply + reduction over the color axes per part."""
    ar = jnp.swapaxes(a.re, 0, 1) if adj_a else a.re
    ai = jnp.swapaxes(a.im, 0, 1) if adj_a else a.im
    br = b.re if adj_b else jnp.swapaxes(b.re, 0, 1)
    bi = b.im if adj_b else jnp.swapaxes(b.im, 0, 1)
    sa = -1.0 if adj_a else 1.0
    sb = -1.0 if adj_b else 1.0
    re = (ar * br).sum((0, 1)) - (sa * sb) * (ai * bi).sum((0, 1))
    im = sb * (ar * bi).sum((0, 1)) + sa * (ai * br).sum((0, 1))
    return re, im


def adjoint(a: M3) -> M3:
    return M3(jnp.swapaxes(a.re, 0, 1), -jnp.swapaxes(a.im, 0, 1))


def add(a: M3, b: M3) -> M3:
    return M3(a.re + b.re, a.im + b.im)


def scale(a: M3, s) -> M3:
    """Real scalar (or batch-broadcastable) scale."""
    return M3(s * a.re, s * a.im)


def trace(a: M3) -> tuple[jax.Array, jax.Array]:
    re = a.re[0, 0] + a.re[1, 1] + a.re[2, 2]
    im = a.im[0, 0] + a.im[1, 1] + a.im[2, 2]
    return re, im


def norm2(a: M3) -> jax.Array:
    """Frobenius norm^2 over the color indices -> (batch,)."""
    n = 0.0
    for i in range(3):
        for j in range(3):
            n = n + a.re[i, j] ** 2 + a.im[i, j] ** 2
    return n


def eye_like(a: M3) -> M3:
    b = a.batch
    one = jnp.ones(b, a.re.dtype)
    zero = jnp.zeros(b, a.re.dtype)
    re = jnp.stack([
        jnp.stack([one if i == j else zero for j in range(3)])
        for i in range(3)])
    im = jnp.zeros_like(re)
    return M3(re, im)


def projectTAH(x: M3) -> M3:
    """R = (x - x†)/2 - tr(x - x†)/(2*3) I (ops/su3.projectTAH in SoA)."""
    r_re = 0.5 * (x.re - jnp.swapaxes(x.re, 0, 1))
    r_im = 0.5 * (x.im + jnp.swapaxes(x.im, 0, 1))
    tim = (r_im[0, 0] + r_im[1, 1] + r_im[2, 2]) / 3.0
    # subtract i*tim on the diagonal
    idx = jnp.arange(3)
    r_im = r_im.at[idx, idx].add(-tim)
    return M3(r_re, r_im)


def expm(m: M3, order: int = 12, s: int = 2) -> M3:
    """Scaling-and-squaring Taylor exp, all in VMEM-friendly SoA."""
    inv = 1.0 / (2 ** s)
    m = scale(m, inv)
    x = add(eye_like(m), scale(m, 1.0 / order))
    for i in range(order - 1, 0, -1):
        x = add(eye_like(m), scale(mm(m, x), 1.0 / i))
    for _ in range(s):
        x = mm(x, x)
    return x


def update_gauge(x: M3, p: M3, s: int = 2) -> M3:
    """x <- exp(p) x."""
    return mm(expm(p, s=s), x)


def kinetic_energy(v: M3, chain_axis: int = -1) -> jax.Array:
    """KE = 0.5 sum_links (|p|^2 - 8) reduced over all batch axes except
    the chain axis (which is the LAST batch axis in lattice layout)."""
    n = norm2(v) - 8.0
    axes = tuple(i for i in range(n.ndim) if i != n.ndim - 1)
    return 0.5 * jnp.sum(n, axis=axes)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def det3x3(x: M3) -> tuple[jax.Array, jax.Array]:
    """Complex determinant via cofactor expansion -> (re, im)."""
    def minor(i0, i1, j0, j1):
        p0r, p0i = _cmul(x.re[i0, j0], x.im[i0, j0],
                         x.re[i1, j1], x.im[i1, j1])
        p1r, p1i = _cmul(x.re[i0, j1], x.im[i0, j1],
                         x.re[i1, j0], x.im[i1, j0])
        return p0r - p1r, p0i - p1i
    m0r, m0i = minor(1, 2, 1, 2)
    m1r, m1i = minor(1, 2, 0, 2)
    m2r, m2i = minor(1, 2, 0, 1)
    t0r, t0i = _cmul(x.re[0, 0], x.im[0, 0], m0r, m0i)
    t1r, t1i = _cmul(x.re[0, 1], x.im[0, 1], m1r, m1i)
    t2r, t2i = _cmul(x.re[0, 2], x.im[0, 2], m2r, m2i)
    return t0r - t1r + t2r, t0i - t1i + t2i


def rsqrtPHM3(t: M3) -> M3:
    """(hermitian positive t)^{-1/2} via the closed-form char-poly route
    (ops/su3.rsqrtPHM3 in SoA)."""
    from l2hmc_tpu.ops.su3 import _rsqrtPHM3f
    tr = t.re[0, 0] + t.re[1, 1] + t.re[2, 2]
    t2 = mm(t, t)
    p2 = t2.re[0, 0] + t2.re[1, 1] + t2.re[2, 2]
    det_re, _ = det3x3(t)
    c0, c1, c2 = _rsqrtPHM3f(tr, p2, det_re)
    re = c1 * t.re + c2 * t2.re
    im = c1 * t.im + c2 * t2.im
    idx = jnp.arange(3)
    re = re.at[idx, idx].add(c0)
    return M3(re, im)


def projectSU(x: M3) -> M3:
    """Polar projection + det-phase fix (ops/su3.projectSU in SoA)."""
    t = mm(x, x, adj_a=True)
    m = mm(x, rsqrtPHM3(t))
    dre, dim = det3x3(m)
    p = jnp.arctan2(dim, dre) / (-3.0)
    cr, ci = jnp.cos(p), jnp.sin(p)
    re = m.re * cr - m.im * ci
    im = m.re * ci + m.im * cr
    return M3(re, im)


def su3_to_vec(x: M3) -> jax.Array:
    """TAH (or projected) matrix -> 8 real Gell-Mann coords, stacked on a
    NEW leading axis: (8, *batch) (ops/su3.su3_to_vec in SoA)."""
    c = -2.0
    return jnp.stack([
        c * x.im[0, 1],
        c * x.re[0, 1],
        x.im[1, 1] - x.im[0, 0],
        c * x.im[0, 2],
        c * x.re[0, 2],
        c * x.im[1, 2],
        c * x.re[1, 2],
        SQRT1BY3 * (2.0 * x.im[2, 2] - x.im[1, 1] - x.im[0, 0]),
    ])


def group_to_vec(x: M3) -> jax.Array:
    """projectSU then coords — matches ops/su3.group_to_vec."""
    return su3_to_vec(projectSU(x))


def random_momentum(key: jax.Array, batch, dtype=jnp.float32) -> M3:
    """Gaussian TAH momenta directly in SoA layout (same normalization as
    ops/su3.random_momentum)."""
    import math as _math
    s2 = _math.sqrt(0.5)
    ks = jax.random.split(key, 8)
    n = lambda k, sc: sc * jax.random.normal(k, tuple(batch), dtype=dtype)
    r3 = n(ks[0], s2)
    r8 = n(ks[1], s2 * SQRT1BY3)
    r01 = n(ks[2], s2)
    r02 = n(ks[3], s2)
    r12 = n(ks[4], s2)
    i01 = n(ks[5], s2)
    i02 = n(ks[6], s2)
    i12 = n(ks[7], s2)
    zero = jnp.zeros_like(r3)
    re = jnp.stack([
        jnp.stack([zero, r01, r02]),
        jnp.stack([-r01, zero, r12]),
        jnp.stack([-r02, -r12, zero]),
    ])
    im = jnp.stack([
        jnp.stack([r8 + r3, i01, i02]),
        jnp.stack([i01, r8 - r3, i12]),
        jnp.stack([i02, i12, -2.0 * r8]),
    ])
    return M3(re, im)


# ---------------------------------------------------------------------------
# Lattice fields: batch = (d, t, x, y, z, nb)
# ---------------------------------------------------------------------------
# color axes are 0,1; direction axis is 2; lattice axes are 3..6; chains 7.
_LAT0 = 3  # first lattice axis in the full (3,3,d,t,x,y,z,nb) array


def _roll_default(a, shift, axis):
    return jnp.roll(a, shift, axis=axis)


def roll_m(m: M3, shift: int, lat_axis: int, roll=_roll_default) -> M3:
    """Roll along lattice direction lat_axis in 0..3."""
    ax = _LAT0 + lat_axis
    return M3(roll(m.re, shift, axis=ax), roll(m.im, shift, axis=ax))


def _dir(m: M3, u: int) -> M3:
    """Select direction u: (3,3,t,x,y,z,nb)."""
    return M3(m.re[:, :, u], m.im[:, :, u])


def _roll_dirfield(m: M3, shift: int, lat_axis: int, roll) -> M3:
    """Roll a per-direction field (3,3,t,x,y,z,nb) along lattice axis."""
    ax = 2 + lat_axis
    return M3(roll(m.re, shift, axis=ax), roll(m.im, shift, axis=ax))


def plaq_traces(x: M3, roll=_roll_default, per_plane: bool = False):
    """Re/Im plaquette traces over the 6 (u, v) planes.

    Returns (re, im), each (t, x, y, z, nb) summed over planes, or
    (6, t, x, y, z, nb) stacked per plane when `per_plane` (the SU(3)
    plaq loss is defined on per-plane sums, loss/pytorch/loss.py:57-70).
    """
    res = []
    ims = []
    for u in range(1, 4):
        for v in range(0, u):
            xu = _dir(x, u)
            xv = _dir(x, v)
            yuv = mm(xu, _roll_dirfield(xv, -1, u, roll))
            yvu = mm(xv, _roll_dirfield(xu, -1, v, roll))
            tr_re, tr_im = trace_mm(yuv, yvu, adj_b=True)
            res.append(tr_re)
            ims.append(tr_im)
    if per_plane:
        return jnp.stack(res), jnp.stack(ims)
    re_tot = res[0]
    im_tot = ims[0]
    for r, i in zip(res[1:], ims[1:]):
        re_tot = re_tot + r
        im_tot = im_tot + i
    return re_tot, im_tot


def action(x: M3, beta, roll=_roll_default) -> jax.Array:
    """Wilson action per chain: S = -(beta/3) sum Re tr P."""
    re_tot, _ = plaq_traces(x, roll)
    s_site = jnp.sum(re_tot, axis=tuple(range(re_tot.ndim - 1)))
    return (-beta / 3.0) * s_site


def staples(x: M3, roll=_roll_default) -> M3:
    """Per-link staple sum A_u(n) (same math as ops/lattice_su3.staples),
    batch = (d, t, x, y, z, nb)."""
    outs_re = []
    outs_im = []
    for u in range(4):
        xu = _dir(x, u)
        acc = None
        for v in range(4):
            if v == u:
                continue
            xv = _dir(x, v)
            xv_pu = _roll_dirfield(xv, -1, u, roll)
            xu_pv = _roll_dirfield(xu, -1, v, roll)
            up = mm(mm(xv_pu, xu_pv, adj_b=True), xv, adj_b=True)
            xv_mv = _roll_dirfield(xv, 1, v, roll)
            xu_mv = _roll_dirfield(xu, 1, v, roll)
            xv_pu_mv = _roll_dirfield(xv_mv, -1, u, roll)
            down = mm(mm(xv_pu_mv, xu_mv, adj_a=True, adj_b=True), xv_mv)
            contrib = add(up, down)
            acc = contrib if acc is None else add(acc, contrib)
        outs_re.append(acc.re)
        outs_im.append(acc.im)
    return M3(jnp.stack(outs_re, axis=2), jnp.stack(outs_im, axis=2))


def grad_action(x: M3, beta, roll=_roll_default) -> M3:
    """F = (beta/3) projectTAH(U A) — identical math to
    ops/lattice_su3.grad_action, SoA layout."""
    ua = mm(x, staples(x, roll))
    return scale(projectTAH(ua), beta / 3.0)


def leapfrog(x: M3, v: M3, beta, eps, force: M3, roll=_roll_default):
    """One MD step with force caching; returns (x', v', force')."""
    v1 = add(v, scale(force, -0.5 * eps))
    xp = update_gauge(x, scale(v1, eps))
    f2 = grad_action(xp, beta, roll)
    v2 = add(v1, scale(f2, -0.5 * eps))
    return xp, v2, f2


def hmc_trajectory(x: M3, v: M3, beta, eps, nlf: int, roll=_roll_default):
    """nlf leapfrog steps; returns (x', v', dH)."""
    f0 = grad_action(x, beta, roll)

    def body(carry, _):
        x, v, f = carry
        return leapfrog(x, v, beta, eps, f, roll), None

    (xp, vp, _), _ = jax.lax.scan(body, (x, v, f0), None, length=nlf)
    h0 = kinetic_energy(v) + action(x, beta, roll)
    h1 = kinetic_energy(vp) + action(xp, beta, roll)
    return xp, vp, h0 - h1
