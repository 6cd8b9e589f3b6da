"""Oracle tests for the su(3) algebra machinery (ops/su3_algebra).

Validates against: published structure-constant values (the reference's
literal tables, group/su3/tensorflow/utils.py:41-71), defining algebraic
identities ([T^a,T^b] = f T^c, adX(Y) = [X,Y], Ad: X T^c X† = T^b Ad^bc),
scipy's logm, and autodiff (diffexp/diffprojectTAH vs jax.jacfwd/jvp).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.ops import su3_algebra as alg


def haar_su3(key, batch=()):
    return g.random(key, batch + (3, 3), dtype=jnp.complex128)


def rand_tah(key, batch=()):
    return g.random_momentum(key, batch + (3, 3), dtype=jnp.complex128)


def test_gell_mann_properties():
    lam = np.asarray(alg.gell_mann())
    for a in range(8):
        np.testing.assert_allclose(lam[a], lam[a].conj().T, atol=1e-14)
        assert abs(np.trace(lam[a])) < 1e-14
    tr = np.einsum("aij,bji->ab", lam, lam)
    np.testing.assert_allclose(tr.real, 2.0 * np.eye(8), atol=1e-13)
    np.testing.assert_allclose(tr.imag, 0.0, atol=1e-13)


def test_su3gen_normalization_and_vec_consistency():
    t = np.asarray(alg.su3gen())
    tr = np.einsum("aij,bji->ab", t, t)
    np.testing.assert_allclose(tr.real, -0.5 * np.eye(8), atol=1e-13)
    # the generator basis IS the vec_to_su3 basis: e_a -> T^a
    for a in range(8):
        e = jnp.zeros((8,), jnp.float64).at[a].set(1.0)
        np.testing.assert_allclose(
            np.asarray(g.vec_to_su3(e)), t[a], atol=1e-14)


def test_structure_constants_match_reference_tables():
    """Spot-check the computed f/d tensors against the reference's
    hand-written literals (utils.py:41-71)."""
    f = np.asarray(alg.fabc())
    d = np.asarray(alg.dabc())
    s34 = np.sqrt(3.0) / 2.0
    s13 = np.sqrt(1.0 / 3.0)
    assert abs(f[0, 1, 2] - 1.0) < 1e-13
    assert abs(f[0, 3, 6] - 0.5) < 1e-13
    assert abs(f[0, 4, 5] + 0.5) < 1e-13
    assert abs(f[1, 3, 5] - 0.5) < 1e-13
    assert abs(f[1, 4, 6] - 0.5) < 1e-13
    assert abs(f[2, 3, 4] - 0.5) < 1e-13
    assert abs(f[2, 5, 6] + 0.5) < 1e-13
    assert abs(f[3, 4, 7] - s34) < 1e-13
    assert abs(f[5, 6, 7] - s34) < 1e-13
    assert abs(d[0, 0, 7] + s13) < 1e-13
    assert abs(d[0, 3, 5] + 0.5) < 1e-13
    assert abs(d[1, 3, 6] - 0.5) < 1e-13
    assert abs(d[2, 3, 3] + 0.5) < 1e-13
    assert abs(d[3, 3, 7] - 0.5 * s13) < 1e-13
    assert abs(d[7, 7, 7] - s13) < 1e-13
    # antisymmetry / symmetry
    np.testing.assert_allclose(f, -np.swapaxes(f, 0, 1), atol=1e-13)
    np.testing.assert_allclose(d, np.swapaxes(d, 0, 1), atol=1e-13)
    np.testing.assert_allclose(d, np.transpose(d, (2, 1, 0)), atol=1e-13)


def test_su3ad_is_commutator():
    """su3adapply(su3ad(x), y) == [x, y] for algebra elements."""
    x = rand_tah(jax.random.PRNGKey(0), (4,))
    y = rand_tah(jax.random.PRNGKey(1), (4,))
    lhs = alg.su3adapply(alg.su3ad(x), y)
    rhs = x @ y - y @ x
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_SU3Ad_defining_identity():
    """X T^c X† = T^b AdX^{bc}."""
    x = haar_su3(jax.random.PRNGKey(2), (3,))
    ad = alg.SU3Ad(x)                       # (3, 8, 8)
    t = alg.su3gen()
    lhs = jnp.einsum("nik,ckl,njl->ncij", x, t, x.conj())
    rhs = jnp.einsum("bij,nbc->ncij", t, ad.astype(x.dtype))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)
    # Ad is real orthogonal (adjoint rep of a compact group)
    ada = np.asarray(ad)
    np.testing.assert_allclose(
        np.einsum("nab,ncb->nac", ada, ada),
        np.broadcast_to(np.eye(8), (3, 8, 8)), atol=1e-12)


def test_diffexp_derivative_identity():
    """exp(-X) d/dt exp(X + t dX)|_0 == vec_to_su3(J(adX) vec(dX)).

    x is scaled into the convergence range of the order-13 series (the
    reference's default order; at |x|_F ~ 2.8 the truncation error is
    ~5e-4 for both implementations)."""
    x = 0.3 * rand_tah(jax.random.PRNGKey(3))
    dx = rand_tah(jax.random.PRNGKey(4))
    _, dexp = jax.jvp(lambda m: g.expm(m, s=4), (x,), (dx,))
    lhs = g.adjoint(g.expm(x, s=4)) @ dexp   # exp(-X) d exp(X)
    j = alg.diffexp(alg.su3ad(x))
    rhs = g.vec_to_su3(j @ g.su3_to_vec(dx))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_diffprojectTAH_vs_autodiff():
    """diffprojectTAH(M)^{ac} == d/dv^c su3_to_vec(projectTAH(e^{v T} M))."""
    m = haar_su3(jax.random.PRNGKey(5)) @ (
        2.0 * haar_su3(jax.random.PRNGKey(6)))

    def coords(v):
        return g.su3_to_vec(
            g.projectTAH(g.expm(g.vec_to_su3(v)) @ m))

    jac = jax.jacfwd(coords)(jnp.zeros((8,), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(alg.diffprojectTAH(m)), np.asarray(jac), atol=1e-10)


def test_diffprojectTAHCross_vs_autodiff():
    """Cross term: derivative on Y of projectTAH(X Y) along e^{v T} Y."""
    x = haar_su3(jax.random.PRNGKey(7))
    y = haar_su3(jax.random.PRNGKey(8))

    def coords(v):
        return g.su3_to_vec(
            g.projectTAH(x @ (g.expm(g.vec_to_su3(v)) @ y)))

    jac = jax.jacfwd(coords)(jnp.zeros((8,), jnp.float64))
    np.testing.assert_allclose(
        np.asarray(alg.diffprojectTAHCross(x @ y, x=x)), np.asarray(jac),
        atol=1e-10)


def test_su3_gradient_matches_matrix_route():
    """su3_gradient == 2 * projectTAH-route gradient used by the lattice
    force (they are the same T^a-coordinate derivative)."""
    x = haar_su3(jax.random.PRNGKey(9))

    def f(u):
        return jnp.real(g.trace(u)).sum()

    y, dvec = alg.su3_gradient(f, x)
    # finite-difference check along a random direction
    v = np.random.default_rng(0).normal(size=8)
    eps = 1e-6
    fp = f(g.expm(g.vec_to_su3(jnp.asarray(eps * v))) @ x)
    fm = f(g.expm(g.vec_to_su3(jnp.asarray(-eps * v))) @ x)
    np.testing.assert_allclose(
        float(jnp.dot(dvec, jnp.asarray(v))), float((fp - fm) / (2 * eps)),
        rtol=1e-5, atol=1e-7)


def test_log3x3_roundtrip_and_scipy():
    import scipy.linalg
    x = np.asarray(haar_su3(jax.random.PRNGKey(10), (6,)))
    lg = np.asarray(alg.log3x3(jnp.asarray(x)))
    for i in range(x.shape[0]):
        ref = scipy.linalg.logm(x[i])
        np.testing.assert_allclose(lg[i], ref, atol=5e-4)
    # roundtrip through expm is much tighter than the scipy comparison
    back = np.asarray(g.expm(jnp.asarray(lg), s=4))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_sun_manifold_roundtrip():
    x = haar_su3(jax.random.PRNGKey(11), (4,))
    a = 0.1 * rand_tah(jax.random.PRNGKey(12), (4,))
    u = x @ a                      # tangent at x
    y = alg.sun_exp(x, u)
    # y stays on the group
    dev_mean, _ = g.checkSU(y)
    assert float(jnp.max(dev_mean)) < 1e-8
    u_back = alg.sun_log(x, y)
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-4)
    # proju recovers an algebra tangent exactly
    np.testing.assert_allclose(
        np.asarray(alg.sun_proju(x, u)), np.asarray(a), atol=1e-12)


def test_near_identity_generators():
    for eps in (0.05, 0.2):
        m2 = alg.random_SU2(jax.random.PRNGKey(13), eps, (64,))
        eye2 = np.eye(2)
        m2n = np.asarray(m2)
        np.testing.assert_allclose(
            np.einsum("nij,nkj->nik", m2n, m2n.conj()),
            np.broadcast_to(eye2, (64, 2, 2)), atol=1e-12)
        det2 = m2n[:, 0, 0] * m2n[:, 1, 1] - m2n[:, 0, 1] * m2n[:, 1, 0]
        np.testing.assert_allclose(det2, 1.0, atol=1e-12)

        m3 = alg.random_SU3(jax.random.PRNGKey(14), eps, (64,))
        dev_mean, _ = g.checkSU(m3)
        assert float(jnp.max(dev_mean)) < 1e-10
        # distance from identity scales with eps (3 embedded SU(2)s)
        dist = np.abs(np.asarray(m3) - np.eye(3)).max(axis=(1, 2))
        assert dist.max() < 4.0 * eps
        assert dist.mean() > 0.2 * eps

    arr = alg.random_SU3_array(jax.random.PRNGKey(15), 5, 0.1)
    assert arr.shape == (10, 3, 3)
    np.testing.assert_allclose(
        np.asarray(arr[0] @ arr[1]), np.eye(3), atol=1e-12)


def test_su3_jacobian_left_translation_logdet_zero():
    """VALIDATES THE REFERENCE'S PUNT: the SU(3) x-update is a left
    translation x -> exp(eps v) x (v independent of x), whose Jacobian in
    the tangent chart is Ad_{exp(eps v)} — orthogonal, so logdet == 0
    exactly (reference sets logdet=0 without proof,
    dynamics/pytorch/dynamics.py:1425)."""
    x = haar_su3(jax.random.PRNGKey(16))
    v = rand_tah(jax.random.PRNGKey(17))
    gmat = g.expm(0.3 * v, s=2)

    _, jac = alg.su3_jacobian(lambda u: gmat @ u, x, is_SU3=True)
    sign, logdet = np.linalg.slogdet(np.asarray(jac))
    assert abs(float(logdet)) < 1e-9
