"""SU(3) group + su(3) algebra numerics.

JAX counterpart of the reference's SU3 group stack
(reference src/l2hmc/group/su3/pytorch/group.py:36-227 and
group/su3/pytorch/utils.py). All functions are pure, batched over arbitrary
leading dims (matrices occupy the last two axes), and dtype-polymorphic:
feed complex128 for parity-grade numerics (enable jax_enable_x64) or
complex64 for speed.

Math notes
----------
* momenta live in the algebra su(3): 3x3 traceless anti-hermitian (TAH)
  matrices, 8 real dof per link, Gaussian with the normalization of the
  reference's `randTAH3` (utils.py:171-195)
* `exp` is a scaling-and-squaring 12th-order Taylor series — same series
  as the reference (utils.py:148-154) plus squaring for robustness at
  larger norms
* `projectSU` = polar projection x (x†x)^{-1/2} with a closed-form 3x3
  inverse square root via characteristic-polynomial eigenvalues
  (utils.py:227-346), then a det-phase fix into SU(3)
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

NAME = "SU3"
DIM = 4

SQRT1BY2 = math.sqrt(1.0 / 2.0)
SQRT1BY3 = math.sqrt(1.0 / 3.0)
SQRT3 = math.sqrt(3.0)
ONE_THIRD = 1.0 / 3.0


def _real_dtype(dtype) -> jnp.dtype:
    # metadata-only: jnp.finfo(complex64).dtype == float32. Never build a
    # throwaway complex array here — an EAGER complex op poisons the whole
    # TPU session on the axon backend (every later dispatch returns
    # UNIMPLEMENTED), so host-side code must keep complex math inside jit.
    return jnp.finfo(dtype).dtype


def eye_of(x: jax.Array) -> jax.Array:
    n = x.shape[-1]
    return jnp.eye(n, dtype=x.dtype)


def mul(a, b, adjoint_a=False, adjoint_b=False):
    """Batched matrix product with optional adjoints (group.py:58-71)."""
    if adjoint_a:
        a = adjoint(a)
    if adjoint_b:
        b = adjoint(b)
    return a @ b


def adjoint(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x.conj(), -2, -1)


def trace(x: jax.Array) -> jax.Array:
    return jnp.trace(x, axis1=-2, axis2=-1)


def det3x3(x: jax.Array) -> jax.Array:
    """Closed-form 3x3 determinant (cofactor expansion).

    TPU's XLA has no complex LU decomposition (jnp.linalg.det is
    UNIMPLEMENTED there); for 3x3 the explicit form is also faster and
    exactly differentiable.
    """
    a, b, c = x[..., 0, 0], x[..., 0, 1], x[..., 0, 2]
    d, e, f = x[..., 1, 0], x[..., 1, 1], x[..., 1, 2]
    g_, h, i = x[..., 2, 0], x[..., 2, 1], x[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g_) + c * (d * h - e * g_)


def norm2(x: jax.Array, axis=(-2, -1)) -> jax.Array:
    """Frobenius norm squared over `axis` (utils.py:157-168)."""
    n = jnp.square(jnp.abs(x))
    if axis is None or len(axis) == 0:
        return n
    return jnp.sum(n, axis=axis)


# ---------------------------------------------------------------------------
# Matrix exponential
# ---------------------------------------------------------------------------
def expm_taylor(m: jax.Array, order: int = 12) -> jax.Array:
    """Horner-evaluated Taylor series of exp(m) (utils.py:148-154)."""
    eye = eye_of(m)
    x = eye + m / order
    for i in range(order - 1, 0, -1):
        x = eye + (m @ x) / i
    return x


def expm(m: jax.Array, order: int = 12, s: int = 4) -> jax.Array:
    """exp(m) via scaling-and-squaring around the Taylor core.

    The scaling power `s` is static (jit-friendly; no data-dependent
    branching). s=4 handles |m|_F up to ~10 at ~1e-10 accuracy. The
    leapfrog hot path feeds eps-scaled algebra elements (|m| << 1), where
    `update_gauge`'s s=2 is already exact to ~1e-12 for |m|_F < 3.
    """
    x = expm_taylor(m / (2**s), order=order)
    for _ in range(s):
        x = x @ x
    return x


def update_gauge(x: jax.Array, p: jax.Array, s: int = 2) -> jax.Array:
    """x <- exp(p) x (group.py:45-50)."""
    return expm(p, s=s) @ x


# ---------------------------------------------------------------------------
# Projections
# ---------------------------------------------------------------------------
def projectTAH(x: jax.Array) -> jax.Array:
    """Traceless anti-hermitian projection (group.py:92-103):
    R = (x - x†)/2 - tr(x - x†)/(2 Nc) · I
    """
    nc = x.shape[-1]
    r = 0.5 * (x - adjoint(x))
    d = trace(r) / nc
    return r - d[..., None, None] * eye_of(x)


def eigs3x3(tr: jax.Array, p2: jax.Array, det: jax.Array):
    """Eigenvalues of a 3x3 hermitian matrix from char-poly invariants.

    Trigonometric (Cardano) solution, numerically hardened with the same
    clamps as the reference (utils.py:227-283). Inputs: trace, tr(x^2),
    det — all real.
    """
    tr3 = ONE_THIRD * tr
    p23 = ONE_THIRD * p2
    tr32 = tr3 * tr3
    # floor q at eps^2 (dtype-scaled): at an exactly degenerate spectrum
    # q == 0 and sqrt's backward is 1/0 — the resulting NaN gradient is
    # what silently zeroed every SU(3) training run through round 4
    # (see su3_comp.reunit). Below the floor the eigenvalue splitting is
    # unresolvable at this precision anyway, so the forward change is
    # below roundoff. The gradient path (reunit) avoids eigs entirely;
    # this keeps projectSU itself NaN-free under grad as insurance.
    # floor = eps^1.5, not eps^2: the backward forms 1/sq3^2 = q^-3,
    # which must stay inside the dtype's range (eps^2 put q^-3 at ~3e41,
    # past f32 max -> inf -> NaN)
    eps_q = jnp.asarray(jnp.finfo(tr.dtype).eps, tr.dtype)
    q = jnp.maximum(jnp.abs(0.5 * (p23 - tr32)), eps_q * jnp.sqrt(eps_q))
    r = 0.25 * tr3 * (5.0 * tr32 - p2) - 0.5 * det
    sq = jnp.sqrt(q)
    sq3 = q * sq
    # guard the q -> 0 (degenerate eigenvalues) limit; the old guard
    # constant 1e-300 underflows to 0.0 in f32 and guarded nothing
    isq3 = 1.0 / jnp.maximum(sq3, jnp.asarray(jnp.finfo(sq3.dtype).tiny,
                                              sq3.dtype))
    isq3 = jnp.clip(isq3, -3e38, 3e38)
    eps = jnp.finfo(tr.dtype).eps
    rsq3 = jnp.clip(r * isq3, -1.0 + eps, 1.0 - eps)
    t = ONE_THIRD * jnp.arccos(rsq3)
    st = jnp.sin(t)
    ct = jnp.cos(t)
    sqc = sq * ct
    sqs = SQRT3 * sq * st
    ll = tr3 + sqc
    e0 = tr3 - 2.0 * sqc
    e1 = ll + sqs
    e2 = ll - sqs
    return e0, e1, e2


def _rsqrtPHM3f(tr, p2, det):
    """Coefficients (c0, c1, c2) with x^{-1/2} = c0 I + c1 x + c2 x^2
    for positive-definite hermitian x (utils.py:286-317)."""
    e0, e1, e2 = eigs3x3(tr, p2, det)
    se0 = jnp.sqrt(jnp.abs(e0))
    se1 = jnp.sqrt(jnp.abs(e1))
    se2 = jnp.sqrt(jnp.abs(e2))
    u = se0 + se1 + se2
    w = se0 * se1 * se2
    d = w * (se0 + se1) * (se0 + se2) * (se1 + se2)
    di = 1.0 / d
    c0 = di * (
        w * u * u
        + e0 * se0 * (e1 + e2)
        + e1 * se1 * (e0 + e2)
        + e2 * se2 * (e0 + e1)
    )
    c1 = -(tr * u + w) * di
    c2 = u * di
    return c0, c1, c2


def rsqrtPHM3(x: jax.Array) -> jax.Array:
    """(hermitian positive x)^{-1/2} in closed form (utils.py:320-329)."""
    tr = trace(x).real
    x2 = x @ x
    p2 = trace(x2).real
    det = det3x3(x).real
    c0, c1, c2 = _rsqrtPHM3f(tr, p2, det)
    cast = lambda c: c[..., None, None].astype(x.dtype)
    return cast(c0) * eye_of(x) + cast(c1) * x + cast(c2) * x2


def projectU(x: jax.Array) -> jax.Array:
    """Polar projection onto U(3): x (x†x)^{-1/2} (utils.py:332-338)."""
    t = adjoint(x) @ x
    return x @ rsqrtPHM3(t)


def projectSU(x: jax.Array) -> jax.Array:
    """projectU then rotate the det phase to land in SU(3) (utils.py:341-346)."""
    nc = x.shape[-1]
    m = projectU(x)
    d = det3x3(m)
    p = jnp.arctan2(d.imag, d.real) / (-nc)
    phase = jax.lax.complex(jnp.cos(p), jnp.sin(p)).astype(x.dtype)
    return m * phase[..., None, None]


compat_proj = projectSU


# ---------------------------------------------------------------------------
# Unitarity monitors (utils.py:362-391)
# ---------------------------------------------------------------------------
def checkU(x: jax.Array):
    """(mean, max) deviation of x†x from identity per chain."""
    nc = x.shape[-1]
    d = norm2(adjoint(x) @ x - eye_of(x))
    d = d.reshape(d.shape[0], -1)
    a = jnp.mean(d, axis=-1)
    b = jnp.max(d, axis=-1)
    c = 2.0 * (nc * nc + 1.0)
    return jnp.sqrt(a / c), jnp.sqrt(b / c)


def checkSU(x: jax.Array):
    """(mean, max) deviation of x†x from I and det x from 1, per chain."""
    nc = x.shape[-1]
    d = norm2(adjoint(x) @ x - eye_of(x))
    d = d + jnp.square(jnp.abs(det3x3(x) - 1.0))
    d = d.reshape(d.shape[0], -1)
    a = jnp.mean(d, axis=-1)
    b = jnp.max(d, axis=-1)
    c = 2.0 * (nc * nc + 1.0)
    return jnp.sqrt(a / c), jnp.sqrt(b / c)


# ---------------------------------------------------------------------------
# Algebra <-> vector (Gell-Mann coordinates; utils.py:394-445)
# ---------------------------------------------------------------------------
def su3_to_vec(x: jax.Array) -> jax.Array:
    """TAH matrix -> 8 real components, X^a = -2 tr[T^a X]."""
    c = -2.0
    x00 = x[..., 0, 0]
    x01 = x[..., 0, 1]
    x02 = x[..., 0, 2]
    x11 = x[..., 1, 1]
    x12 = x[..., 1, 2]
    x22 = x[..., 2, 2]
    return jnp.stack([
        c * x01.imag,
        c * x01.real,
        x11.imag - x00.imag,
        c * x02.imag,
        c * x02.real,
        c * x12.imag,
        c * x12.real,
        SQRT1BY3 * (2.0 * x22.imag - x11.imag - x00.imag),
    ], axis=-1)


def vec_to_su3(v: jax.Array) -> jax.Array:
    """8 real components -> TAH matrix, X = X^a T^a."""
    s3 = SQRT1BY3
    c = -0.5
    zero = jnp.zeros_like(v[..., 0])
    x01 = c * jax.lax.complex(v[..., 1], v[..., 0])
    x02 = c * jax.lax.complex(v[..., 4], v[..., 3])
    x12 = c * jax.lax.complex(v[..., 6], v[..., 5])
    x2i = s3 * v[..., 7]
    x0i = c * (x2i + v[..., 2])
    x1i = c * (x2i - v[..., 2])
    v00 = jax.lax.complex(zero, x0i)
    v11 = jax.lax.complex(zero, x1i)
    v22 = jax.lax.complex(zero, x2i)
    # rows of the matrix
    r0 = jnp.stack([v00, x01, x02], axis=-1)
    r1 = jnp.stack([-x01.conj(), v11, x12], axis=-1)
    r2 = jnp.stack([-x02.conj(), -x12.conj(), v22], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def group_to_vec(x: jax.Array) -> jax.Array:
    """SU(3)-ish matrix -> 8-vector via projectSU then coords (group.py:138-147)."""
    return su3_to_vec(compat_proj(x))


def vec_to_group(x: jax.Array) -> jax.Array:
    return compat_proj(vec_to_su3(x))


# ---------------------------------------------------------------------------
# Random elements
# ---------------------------------------------------------------------------
def random(key: jax.Array, shape: Sequence[int], dtype=jnp.complex128) -> jax.Array:
    """Haar random SU(3): projectSU of a complex Gaussian (the reference's
    own `random`, group/su3/pytorch/group.py:113-119). Exactly Haar: the
    Ginibre density is invariant under left unitary multiplication, so its
    polar factor carries the unique left-invariant (= Haar) measure;
    verified vs a Householder-QR oracle (eigenangle KS D = 0.005, see
    tests/test_distributions.py)."""
    rdt = _real_dtype(dtype)
    kr, ki = jax.random.split(key)
    r = jax.random.normal(kr, shape, dtype=rdt)
    i = jax.random.normal(ki, shape, dtype=rdt)
    return projectSU(jax.lax.complex(r, i))


def random_momentum(key: jax.Array, shape: Sequence[int],
                    dtype=jnp.complex128) -> jax.Array:
    """Gaussian TAH momenta with the reference's normalization
    (utils.py:171-195). `shape` includes the trailing (3, 3)."""
    assert tuple(shape[-2:]) == (3, 3)
    base = tuple(shape[:-2])
    rdt = _real_dtype(dtype)
    ks = jax.random.split(key, 8)
    n = lambda k, scale: scale * jax.random.normal(k, base, dtype=rdt)
    r3 = n(ks[0], SQRT1BY2)
    r8 = n(ks[1], SQRT1BY2 * SQRT1BY3)
    r01 = n(ks[2], SQRT1BY2)
    r02 = n(ks[3], SQRT1BY2)
    r12 = n(ks[4], SQRT1BY2)
    i01 = n(ks[5], SQRT1BY2)
    i02 = n(ks[6], SQRT1BY2)
    i12 = n(ks[7], SQRT1BY2)
    zero = jnp.zeros_like(r3)
    m00 = jax.lax.complex(zero, r8 + r3)
    m11 = jax.lax.complex(zero, r8 - r3)
    m22 = jax.lax.complex(zero, -2.0 * r8)
    m01 = jax.lax.complex(r01, i01)
    m02 = jax.lax.complex(r02, i02)
    m12 = jax.lax.complex(r12, i12)
    r0 = jnp.stack([m00, m01, m02], axis=-1)
    r1 = jnp.stack([-m01.conj(), m11, m12], axis=-1)
    r2 = jnp.stack([-m02.conj(), -m12.conj(), m22], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2).astype(dtype)


def kinetic_energy(p: jax.Array) -> jax.Array:
    """KE = 0.5 sum_links (|p|^2 - 8) per chain (group.py:125-126)."""
    n = norm2(p) - 8.0
    return 0.5 * jnp.sum(n.reshape(n.shape[0], -1), axis=-1)
