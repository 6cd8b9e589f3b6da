"""SU(3) group/algebra unit tests.

Oracles: scipy.linalg.expm, numpy linear algebra, and group-theoretic
identities (unitarity, det=1, tracelessness, Haar/TAH statistics) — the
invariants the reference relies on at runtime via checkSU/checkU
(reference src/l2hmc/group/su3/pytorch/utils.py:362-391).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from l2hmc_tpu.ops import su3 as g

KEY = jax.random.PRNGKey(7)
SHAPE = (4, 2, 3, 3)  # small batch of matrices


@pytest.fixture(scope="module")
def tah():
    return g.random_momentum(KEY, SHAPE, dtype=jnp.complex128)


@pytest.fixture(scope="module")
def unitary():
    return g.random(jax.random.PRNGKey(8), SHAPE, dtype=jnp.complex128)


def test_random_momentum_is_tah(tah):
    x = np.asarray(tah)
    np.testing.assert_allclose(x, -np.conj(np.swapaxes(x, -2, -1)), atol=1e-14)
    np.testing.assert_allclose(np.trace(x, axis1=-2, axis2=-1), 0, atol=1e-14)


def test_random_momentum_normalization():
    """E[|p|^2] per link = 8 (so that KE = (norm2 - 8)/2 is centered)."""
    p = g.random_momentum(jax.random.PRNGKey(0), (20000, 3, 3))
    n2 = float(jnp.mean(g.norm2(p)))
    assert abs(n2 - 8.0) < 0.15


def test_kinetic_energy_shape_and_center():
    p = g.random_momentum(jax.random.PRNGKey(1), (64, 4, 2, 2, 2, 2, 3, 3))
    ke = g.kinetic_energy(p)
    assert ke.shape == (64,)
    # mean over chains of centered KE ~ 0 with fluctuation ~ sqrt(links*8/2)
    assert abs(float(jnp.mean(ke))) < 30.0


def test_expm_vs_scipy(tah):
    got = np.asarray(g.expm(tah))
    want = np.empty_like(got)
    flat = np.asarray(tah).reshape(-1, 3, 3)
    for i, m in enumerate(flat):
        want.reshape(-1, 3, 3)[i] = scipy.linalg.expm(m)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_expm_large_norm():
    """Scaling-and-squaring keeps accuracy at |m| ~ 3."""
    m = 3.0 * np.asarray(
        g.random_momentum(jax.random.PRNGKey(2), (8, 3, 3))
    )
    got = np.asarray(g.expm(jnp.asarray(m)))
    for i in range(8):
        np.testing.assert_allclose(
            got[i], scipy.linalg.expm(m[i]), atol=1e-9
        )


def test_exp_of_tah_is_su3(tah):
    u = g.expm(tah)
    a, b = g.checkSU(u.reshape(4, -1, 3, 3))
    assert float(jnp.max(b)) < 1e-11


def test_random_is_su3(unitary):
    x = np.asarray(unitary)
    xhx = np.swapaxes(x.conj(), -2, -1) @ x
    eye = np.broadcast_to(np.eye(3), xhx.shape)
    np.testing.assert_allclose(xhx, eye, atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(x), 1.0, atol=1e-12)


def test_projectSU_idempotent_on_su3(unitary):
    y = g.projectSU(unitary)
    np.testing.assert_allclose(np.asarray(y), np.asarray(unitary), atol=1e-10)


def test_projectSU_of_perturbed(unitary):
    """projectSU recovers an SU(3) matrix from a noisy one."""
    noise = 0.05 * np.random.default_rng(0).standard_normal(SHAPE + (2,))
    x = np.asarray(unitary) + noise[..., 0] + 1j * noise[..., 1]
    y = g.projectSU(jnp.asarray(x))
    _, b = g.checkSU(y.reshape(4, -1, 3, 3))
    assert float(jnp.max(b)) < 1e-12


def test_projectTAH_properties(unitary):
    r = g.projectTAH(unitary)
    x = np.asarray(r)
    np.testing.assert_allclose(x, -np.conj(np.swapaxes(x, -2, -1)), atol=1e-13)
    np.testing.assert_allclose(
        np.trace(x, axis1=-2, axis2=-1), 0, atol=1e-13
    )


def test_projectTAH_fixes_tah(tah):
    np.testing.assert_allclose(
        np.asarray(g.projectTAH(tah)), np.asarray(tah), atol=1e-14
    )


def test_vec_roundtrip(tah):
    v = g.su3_to_vec(tah)
    assert v.shape == SHAPE[:-2] + (8,)
    back = g.vec_to_su3(v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tah), atol=1e-13)


def test_vec_roundtrip_from_vec():
    v = jax.random.normal(jax.random.PRNGKey(3), (10, 8), dtype=jnp.float64)
    m = g.vec_to_su3(v)
    x = np.asarray(m)
    np.testing.assert_allclose(x, -np.conj(np.swapaxes(x, -2, -1)), atol=1e-14)
    v2 = g.su3_to_vec(m)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-13)


def test_vec_norm_convention():
    """|p|^2 (Frobenius) = sum_a (p^a)^2 / 2 * ... : with tr[T^a T^b] =
    -delta^ab/2, |X|_F^2 = (1/2) sum_a (X^a)^2."""
    v = jax.random.normal(jax.random.PRNGKey(4), (10, 8), dtype=jnp.float64)
    m = g.vec_to_su3(v)
    np.testing.assert_allclose(
        np.asarray(g.norm2(m)), 0.5 * np.sum(np.asarray(v) ** 2, -1),
        rtol=1e-12,
    )


def test_rsqrtPHM3():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((6, 3, 3)) + 1j * rng.standard_normal((6, 3, 3))
    h = a @ np.conj(np.swapaxes(a, -2, -1)) + 0.5 * np.eye(3)  # PD hermitian
    got = np.asarray(g.rsqrtPHM3(jnp.asarray(h)))
    for i in range(6):
        w, vmat = np.linalg.eigh(h[i])
        want = vmat @ np.diag(w ** -0.5) @ np.conj(vmat.T)
        np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_checkU_checkSU_flag_violations(unitary):
    bad = np.asarray(unitary).copy()
    bad[..., 0, 0] *= 1.05
    a_good, _ = g.checkSU(unitary.reshape(4, -1, 3, 3))
    a_bad, _ = g.checkSU(jnp.asarray(bad).reshape(4, -1, 3, 3))
    assert float(jnp.max(a_good)) < 1e-12
    assert float(jnp.min(a_bad)) > 1e-3


def test_eigs3x3_vs_numpy():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((20, 3, 3)) + 1j * rng.standard_normal((20, 3, 3))
    h = 0.5 * (a + np.conj(np.swapaxes(a, -2, -1)))
    tr = np.trace(h, axis1=-2, axis2=-1).real
    p2 = np.trace(h @ h, axis1=-2, axis2=-1).real
    det = np.linalg.det(h).real
    e0, e1, e2 = g.eigs3x3(jnp.asarray(tr), jnp.asarray(p2), jnp.asarray(det))
    got = np.sort(np.stack([e0, e1, e2], -1), axis=-1)
    want = np.sort(np.linalg.eigvalsh(h), axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-8)
