"""Component-flat SU(3) engine: the fastest measured layout on v5e.

Evolution of ops/su3_soa (color-leading stacked re/im): Mosaic tiles the
two minor dims of every array to (8 sublanes, 128 lanes), so ANY array
whose minor dims are small runs mostly-empty vector ops. Measured on a
20-mm chain (f32, v5e):

    layout                           GFLOP/s
    (3,3,t,x,y,z,nb) nb=8   (soa)      26     # lanes 8/128, old engine
    (3,3,t,x,y,z,128)                 469     # lanes full, sublane z
    (3,3,S) flat batch                391     # sublanes 3/8
    9 separate flat (S,) components   945     # ~VPU peak  <-- this file

A field here is 9+9 plain 1-D arrays (re/im per color component
c = 3*i + j) of length 4*V*nb (links) in (d, t, x, y, z, nb) row-major
order. All algebra is component arithmetic on full-lane vectors; lattice
neighbor access reshapes the flat vector to (pre, L_axis, post) — a free
contiguous-split view — rolls, and flattens back. Per-direction
sub-fields are contiguous slices.

Parity with ops/su3_soa is bit-level on every op (tests/test_su3_comp.py)
— same math, different storage.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SQRT1BY3 = math.sqrt(1.0 / 3.0)


class F3(NamedTuple):
    """9+9 flat component arrays; component c = 3*i + j."""
    re: tuple
    im: tuple

    @property
    def n(self):
        return self.re[0].shape


def _map2(f, a: F3, b: F3) -> F3:
    return F3(tuple(f(x, y) for x, y in zip(a.re, b.re)),
              tuple(f(x, y) for x, y in zip(a.im, b.im)))


def _map1(f, a: F3) -> F3:
    return F3(tuple(f(x) for x in a.re), tuple(f(x) for x in a.im))


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------
def from_m3(m) -> F3:
    """ops/su3_soa.M3 (3, 3, *batch) -> flat components."""
    return F3(
        tuple(m.re[i, j].reshape(-1) for i in range(3) for j in range(3)),
        tuple(m.im[i, j].reshape(-1) for i in range(3) for j in range(3)),
    )


def to_m3(f: F3, batch):
    from l2hmc_tpu.ops.su3_soa import M3
    re = jnp.stack([jnp.stack([f.re[3 * i + j].reshape(batch)
                               for j in range(3)]) for i in range(3)])
    im = jnp.stack([jnp.stack([f.im[3 * i + j].reshape(batch)
                               for j in range(3)]) for i in range(3)])
    return M3(re, im)


def from_complex_lattice(x: jax.Array) -> F3:
    """(nb, 4, t, x, y, z, 3, 3) complex -> F3 of (4*V*nb,) components in
    (d, t, x, y, z, nb) order."""
    res, ims = [], []
    for i in range(3):
        for j in range(3):
            c = jnp.moveaxis(x[..., i, j], 0, -1)   # (4, t, x, y, z, nb)
            res.append(c.real.reshape(-1))
            ims.append(c.imag.reshape(-1))
    return F3(tuple(res), tuple(ims))


def to_complex_lattice(f: F3, lat, nb: int, dtype) -> jax.Array:
    """Inverse of from_complex_lattice."""
    shape = (4, *lat, nb)
    comps = []
    for c in range(9):
        comps.append(jax.lax.complex(f.re[c].reshape(shape),
                                     f.im[c].reshape(shape)))
    m = jnp.stack(comps, axis=-1).reshape(*shape, 3, 3)
    return jnp.moveaxis(m, -3, 0).astype(dtype)


# ---------------------------------------------------------------------------
# Basic algebra (shape-agnostic pointwise)
# ---------------------------------------------------------------------------
def _op_comps(a: F3, adj: bool):
    """(re, im) component lists of op(a); the adjoint's negations are
    hoisted so each appears ONCE in the graph (not once per use)."""
    if not adj:
        return a.re, a.im
    re = tuple(a.re[3 * j + i] for i in range(3) for j in range(3))
    im = tuple(-a.im[3 * j + i] for i in range(3) for j in range(3))
    return re, im


def mm(a: F3, b: F3, adj_a: bool = False, adj_b: bool = False) -> F3:
    """op(a) @ op(b) fully unrolled on components — every multiply is a
    full-lane vector FMA; no slices, stacks, or dots in the graph."""
    are, aim = _op_comps(a, adj_a)
    bre, bim = _op_comps(b, adj_b)
    zr, zi = [], []
    for i in range(3):
        for j in range(3):
            sr = si = 0.0
            for k in range(3):
                ar, ai = are[3 * i + k], aim[3 * i + k]
                br, bi = bre[3 * k + j], bim[3 * k + j]
                sr = sr + ar * br - ai * bi
                si = si + ar * bi + ai * br
            zr.append(sr)
            zi.append(si)
    return F3(tuple(zr), tuple(zi))


def trace_mm(a: F3, b: F3, adj_a: bool = False, adj_b: bool = False):
    """(Re, Im) of tr[op(a) op(b)]."""
    are, aim = _op_comps(a, adj_a)
    bre, bim = _op_comps(b, adj_b)
    sr = si = 0.0
    for i in range(3):
        for k in range(3):
            ar, ai = are[3 * i + k], aim[3 * i + k]
            br, bi = bre[3 * k + i], bim[3 * k + i]
            sr = sr + ar * br - ai * bi
            si = si + ar * bi + ai * br
    return sr, si


def adjoint(a: F3) -> F3:
    return F3(tuple(a.re[3 * j + i] for i in range(3) for j in range(3)),
              tuple(-a.im[3 * j + i] for i in range(3) for j in range(3)))


def add(a: F3, b: F3) -> F3:
    return _map2(lambda x, y: x + y, a, b)


def scale(a: F3, s) -> F3:
    return _map1(lambda x: s * x, a)


def trace(a: F3):
    return (a.re[0] + a.re[4] + a.re[8], a.im[0] + a.im[4] + a.im[8])


def norm2(a: F3):
    n = 0.0
    for c in range(9):
        n = n + a.re[c] ** 2 + a.im[c] ** 2
    return n


def eye_like(a: F3) -> F3:
    one = jnp.ones_like(a.re[0])
    zero = jnp.zeros_like(a.re[0])
    re = tuple(one if c in (0, 4, 8) else zero for c in range(9))
    im = tuple(zero for _ in range(9))
    return F3(re, im)


def projectTAH(x: F3) -> F3:
    zr, zi = [None] * 9, [None] * 9
    for i in range(3):
        for j in range(3):
            c, ct = 3 * i + j, 3 * j + i
            zr[c] = 0.5 * (x.re[c] - x.re[ct])
            zi[c] = 0.5 * (x.im[c] + x.im[ct])
    tim = (zi[0] + zi[4] + zi[8]) / 3.0
    for c in (0, 4, 8):
        zi[c] = zi[c] - tim
    return F3(tuple(zr), tuple(zi))


def expm(m: F3, order: int = 12, s: int = 2) -> F3:
    inv = 1.0 / (2 ** s)
    m = scale(m, inv)
    eye = eye_like(m)
    x = add(eye, scale(m, 1.0 / order))
    for i in range(order - 1, 0, -1):
        x = add(eye, scale(mm(m, x), 1.0 / i))
    for _ in range(s):
        x = mm(x, x)
    return x


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def det3x3(x: F3):
    def c(i, j):
        return x.re[3 * i + j], x.im[3 * i + j]

    def minor(i0, i1, j0, j1):
        p0 = _cmul(*c(i0, j0), *c(i1, j1))
        p1 = _cmul(*c(i0, j1), *c(i1, j0))
        return p0[0] - p1[0], p0[1] - p1[1]

    m0 = minor(1, 2, 1, 2)
    m1 = minor(1, 2, 0, 2)
    m2 = minor(1, 2, 0, 1)
    t0 = _cmul(*c(0, 0), *m0)
    t1 = _cmul(*c(0, 1), *m1)
    t2 = _cmul(*c(0, 2), *m2)
    return t0[0] - t1[0] + t2[0], t0[1] - t1[1] + t2[1]


def rsqrtPHM3(t: F3) -> F3:
    from l2hmc_tpu.ops.su3 import _rsqrtPHM3f
    tr = t.re[0] + t.re[4] + t.re[8]
    t2 = mm(t, t)
    p2 = t2.re[0] + t2.re[4] + t2.re[8]
    det_re, _ = det3x3(t)
    c0, c1, c2 = _rsqrtPHM3f(tr, p2, det_re)
    re = [c1 * t.re[c] + c2 * t2.re[c] for c in range(9)]
    im = [c1 * t.im[c] + c2 * t2.im[c] for c in range(9)]
    for c in (0, 4, 8):
        re[c] = re[c] + c0
    return F3(tuple(re), tuple(im))


def projectSU(x: F3) -> F3:
    t = mm(x, x, adj_a=True)
    m = mm(x, rsqrtPHM3(t))
    dre, dim = det3x3(m)
    p = jnp.arctan2(dim, dre) / (-3.0)
    cr, ci = jnp.cos(p), jnp.sin(p)
    return F3(tuple(m.re[c] * cr - m.im[c] * ci for c in range(9)),
              tuple(m.re[c] * ci + m.im[c] * cr for c in range(9)))


def su3_to_vec(x: F3):
    """8 Gell-Mann coordinate arrays (tuple) — same convention as
    ops/su3.su3_to_vec."""
    c = -2.0
    return (
        c * x.im[1],
        c * x.re[1],
        x.im[4] - x.im[0],
        c * x.im[2],
        c * x.re[2],
        c * x.im[5],
        c * x.re[5],
        SQRT1BY3 * (2.0 * x.im[8] - x.im[4] - x.im[0]),
    )


def random_momentum(key: jax.Array, n, dtype=jnp.float32) -> F3:
    """Gaussian TAH momenta, flat components (same normalization as
    ops/su3_soa.random_momentum); n = total link count."""
    s2 = math.sqrt(0.5)
    ks = jax.random.split(key, 8)
    shape = n if isinstance(n, tuple) else (n,)
    g = lambda k, sc: sc * jax.random.normal(k, shape, dtype=dtype)
    r3 = g(ks[0], s2)
    r8 = g(ks[1], s2 * SQRT1BY3)
    r01 = g(ks[2], s2)
    r02 = g(ks[3], s2)
    r12 = g(ks[4], s2)
    i01 = g(ks[5], s2)
    i02 = g(ks[6], s2)
    i12 = g(ks[7], s2)
    zero = jnp.zeros_like(r3)
    re = (zero, r01, r02, -r01, zero, r12, -r02, -r12, zero)
    im = (r8 + r3, i01, i02, i01, r8 - r3, i12, i02, i12, -2.0 * r8)
    return F3(re, im)


# ---------------------------------------------------------------------------
# Lattice fields: components flat (4*V*nb,), order (d, t, x, y, z, nb)
# ---------------------------------------------------------------------------
def make_roll(lat: Sequence[int], nb: int):
    """Roll a flat per-direction component (V*nb,) along lattice axis
    0..3 via a free contiguous reshape."""
    lat = tuple(lat)

    def roll(a, shift, axis):
        pre = int(np.prod(lat[:axis])) if axis > 0 else 1
        L = lat[axis]
        post = int(np.prod(lat[axis + 1:])) * nb
        v = a.reshape(pre, L, post)
        return jnp.roll(v, shift, axis=1).reshape(-1)

    return roll


def roll_f(f: F3, shift: int, axis: int, roll) -> F3:
    return _map1(lambda a: roll(a, shift, axis), f)


def dir_slice(x: F3, u: int, n_dir: int) -> F3:
    """Direction u of a (4*n_dir,) field -> contiguous (n_dir,) slice."""
    lo, hi = u * n_dir, (u + 1) * n_dir
    return _map1(lambda a: a[lo:hi], x)


def stack_dirs(fs) -> F3:
    return F3(
        tuple(jnp.concatenate([f.re[c] for f in fs]) for c in range(9)),
        tuple(jnp.concatenate([f.im[c] for f in fs]) for c in range(9)),
    )


def plaq_traces(x: F3, lat, nb: int, roll=None, per_plane: bool = False):
    """Plaquette traces; returns flat (V*nb,) arrays (or lists of 6)."""
    if roll is None:
        roll = make_roll(lat, nb)
    n_dir = int(np.prod(lat)) * nb
    res, ims = [], []
    for u in range(1, 4):
        for v in range(0, u):
            xu = dir_slice(x, u, n_dir)
            xv = dir_slice(x, v, n_dir)
            yuv = mm(xu, roll_f(xv, -1, u, roll))
            yvu = mm(xv, roll_f(xu, -1, v, roll))
            tr_re, tr_im = trace_mm(yuv, yvu, adj_b=True)
            res.append(tr_re)
            ims.append(tr_im)
    if per_plane:
        return res, ims
    re_tot, im_tot = res[0], ims[0]
    for r, i in zip(res[1:], ims[1:]):
        re_tot = re_tot + r
        im_tot = im_tot + i
    return re_tot, im_tot


def rect_traces(x: F3, lat, nb: int, roll=None):
    """Re parts of the two 2x1 rectangle traces per (u, v) plane — 12
    flat (V*nb,) arrays (reference lattice/su3/pytorch/lattice.py:180-195
    builds the same loops)."""
    if roll is None:
        roll = make_roll(lat, nb)
    n_dir = int(np.prod(lat)) * nb
    out = []
    for u in range(1, 4):
        for v in range(0, u):
            xu = dir_slice(x, u, n_dir)
            xv = dir_slice(x, v, n_dir)
            yuv = mm(xu, roll_f(xv, -1, u, roll))
            yvu = mm(xv, roll_f(xu, -1, v, roll))
            yu = roll_f(xu, -1, v, roll)
            yv = roll_f(xv, -1, u, roll)
            uu = mm(xv, yuv, adj_a=True)
            ur = mm(xu, yvu, adj_a=True)
            ul = mm(yuv, yu, adj_b=True)
            ud = mm(yvu, yv, adj_b=True)
            ul_ = roll_f(ul, -1, u, roll)
            ud_ = roll_f(ud, -1, v, roll)
            out.append(trace_mm(ur, ul_, adj_b=True)[0])
            out.append(trace_mm(uu, ud_, adj_b=True)[0])
    return out


def _chain_sum(a: jax.Array, nb: int) -> jax.Array:
    """Flat (sites*nb,) -> per-chain sum (nb,)."""
    return a.reshape(-1, nb).sum(axis=0)


def action(x: F3, beta, lat, nb: int, roll=None,
           c1: float = 0.0) -> jax.Array:
    """Wilson (c1=0) or improved (DBW2/Iwasaki, c1 != 0) gauge action:
    S = -(1/3)[beta(1-8c1) sum Re tr P + beta c1 sum Re tr R]
    (lattice/su3/pytorch/lattice.py:252-269, arXiv hep-lat/0512017)."""
    re_tot, _ = plaq_traces(x, lat, nb, roll)
    s = (1.0 - 8.0 * c1) * _chain_sum(re_tot, nb)
    if c1 != 0.0:
        r = 0.0
        for tr in rect_traces(x, lat, nb, roll):
            r = r + _chain_sum(tr, nb)
        s = s + c1 * r
    return (-beta / 3.0) * s


def kinetic_energy(v: F3, nb: int) -> jax.Array:
    return 0.5 * _chain_sum(norm2(v) - 8.0, nb)


def staples(x: F3, lat, nb: int, roll=None) -> F3:
    if roll is None:
        roll = make_roll(lat, nb)
    n_dir = int(np.prod(lat)) * nb
    outs = []
    for u in range(4):
        xu = dir_slice(x, u, n_dir)
        acc = None
        for v in range(4):
            if v == u:
                continue
            xv = dir_slice(x, v, n_dir)
            xv_pu = roll_f(xv, -1, u, roll)
            xu_pv = roll_f(xu, -1, v, roll)
            up = mm(mm(xv_pu, xu_pv, adj_b=True), xv, adj_b=True)
            xv_mv = roll_f(xv, 1, v, roll)
            xu_mv = roll_f(xu, 1, v, roll)
            xv_pu_mv = roll_f(xv_mv, -1, u, roll)
            down = mm(mm(xv_pu_mv, xu_mv, adj_a=True, adj_b=True), xv_mv)
            contrib = add(up, down)
            acc = contrib if acc is None else add(acc, contrib)
        outs.append(acc)
    return stack_dirs(outs)


def force_and_traces(x: F3, beta, lat, nb: int, roll=None):
    """(force, plaq_re_sum per chain) for the Wilson action, sharing the
    plaquette products between the staple force and the action trace.

    VALID FOR UNITARY LINKS ONLY (the physical domain — the down-staple
    identity cancels U_v†U_v); `staples` remains the generic formula.
    Identities (checked against `staples` on unitary fields in tests):
      U_u(n) A_up_u(n)   = P_uv(n)
      U_u(n) A_down_u(n) = [roll_{+v}(U_v† P_uv U_v)]†
    Training gradients are unaffected by the off-manifold difference:
    every map in the trajectory is group-preserving, so parameter
    perturbations only probe tangential directions, where the two
    formulations' derivatives coincide.
    so the per-link U*A field needs 7 color-matmuls per plane (yuv, yvu,
    P, U_v†PU_v, U_u†P†U_u) instead of 8 staple products + 4 applies,
    and tr P comes free — the Hamiltonian's action term costs nothing
    extra wherever the force is already evaluated.
    """
    if roll is None:
        roll = make_roll(lat, nb)
    n_dir = int(np.prod(lat)) * nb
    ua = [None] * 4
    tr_tot = None

    def acc(u, f):
        ua[u] = f if ua[u] is None else add(ua[u], f)

    for u in range(1, 4):
        for v in range(0, u):
            xu = dir_slice(x, u, n_dir)
            xv = dir_slice(x, v, n_dir)
            yuv = mm(xu, roll_f(xv, -1, u, roll))
            yvu = mm(xv, roll_f(xu, -1, v, roll))
            p = mm(yuv, yvu, adj_b=True)
            tr = p.re[0] + p.re[4] + p.re[8]
            tr_tot = tr if tr_tot is None else tr_tot + tr
            q = mm(mm(xv, p, adj_a=True), xv)            # U_v† P U_v
            r = mm(mm(xu, p, adj_a=True, adj_b=True), xu)  # U_u† P† U_u
            acc(u, add(p, adjoint(roll_f(q, 1, v, roll))))
            acc(v, add(adjoint(p), adjoint(roll_f(r, 1, u, roll))))
    force = scale(projectTAH(stack_dirs(ua)), beta / 3.0)
    return force, _chain_sum(tr_tot, nb)


def grad_action(x: F3, beta, lat, nb: int, roll=None,
                c1: float = 0.0) -> F3:
    """Force for UNITARY x (links on the group — see force_and_traces).
    c1=0: closed-form shared-plaquette staple derivative. c1 != 0: autodiff
    through the component action (torch-convention cotangent assembled
    back into F3 and contracted as projectTAH(dS/dU . U†), matching the
    reference's autograd route, lattice.py:299-308) — no AoS fallback."""
    if c1 != 0.0:
        def s_of(xf):
            return jnp.sum(action(xf, beta, lat, nb, roll, c1=c1))
        g = jax.grad(s_of)(x)
        return projectTAH(mm(g, x, adj_b=True))
    return force_and_traces(x, beta, lat, nb, roll)[0]


def update_gauge(x: F3, p: F3, s: int = 2) -> F3:
    return mm(expm(p, s=s), x)


def leapfrog(x: F3, v: F3, beta, eps, force: F3, lat, nb: int, roll=None,
             c1: float = 0.0):
    v1 = add(v, scale(force, -0.5 * eps))
    xp = update_gauge(x, scale(v1, eps))
    f2 = grad_action(xp, beta, lat, nb, roll, c1=c1)
    v2 = add(v1, scale(f2, -0.5 * eps))
    return xp, v2, f2


def hmc_trajectory(x: F3, v: F3, beta, eps, nlf: int, lat, nb: int,
                   roll=None, c1: float = 0.0):
    """nlf leapfrog steps; returns (x', v', dH). For the plain Wilson
    action the plaquette traces ride along with every force evaluation
    (force_and_traces), so the H terms cost no extra matmuls."""
    if roll is None:
        roll = make_roll(lat, nb)
    if c1 != 0.0:
        f0 = grad_action(x, beta, lat, nb, roll, c1=c1)

        def body(carry, _):
            x, v, f = carry
            return leapfrog(x, v, beta, eps, f, lat, nb, roll, c1=c1), None

        (xp, vp, _), _ = jax.lax.scan(body, (x, v, f0), None, length=nlf)
        h0 = kinetic_energy(v, nb) + action(x, beta, lat, nb, roll, c1=c1)
        h1 = kinetic_energy(vp, nb) + action(xp, beta, lat, nb, roll, c1=c1)
        return xp, vp, h0 - h1

    f0, tr0 = force_and_traces(x, beta, lat, nb, roll)

    def body(carry, _):
        x, v, f, _tr = carry
        v1 = add(v, scale(f, -0.5 * eps))
        xp = update_gauge(x, scale(v1, eps))
        f2, tr2 = force_and_traces(xp, beta, lat, nb, roll)
        v2 = add(v1, scale(f2, -0.5 * eps))
        return (xp, v2, f2, tr2), None

    (xp, vp, _, tr1), _ = jax.lax.scan(body, (x, v, f0, tr0), None,
                                       length=nlf)
    h0 = kinetic_energy(v, nb) + (-beta / 3.0) * tr0
    h1 = kinetic_energy(vp, nb) + (-beta / 3.0) * tr1
    return xp, vp, h0 - h1
