"""U(1) group + lattice unit tests.

Oracles:
  * a from-scratch numpy implementation (independent loop-based Wilson loop
    sum), mirroring the role of the reference's numpy lattice
    (reference src/l2hmc/lattice/u1/numpy/lattice.py)
  * jax.grad as the force oracle
  * the analytic plaquette i1(beta)/i0(beta)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import u1 as g
from l2hmc_tpu.ops import lattice_u1 as lat

NT, NX = 6, 8
NB = 4


def numpy_wilson_loops(x):
    """Loop-based oracle: W[t,x] = xu[t,x]+xv[t+1,x]-xu[t,x+1]-xv[t,x]."""
    nb = x.shape[0]
    w = np.zeros((nb, NT, NX))
    for b in range(nb):
        for t in range(NT):
            for xx in range(NX):
                w[b, t, xx] = (
                    x[b, 0, t, xx]
                    + x[b, 1, (t + 1) % NT, xx]
                    - x[b, 0, t, (xx + 1) % NX]
                    - x[b, 1, t, xx]
                )
    return w


@pytest.fixture(scope="module")
def x():
    key = jax.random.PRNGKey(0)
    return g.random(key, (NB, 2, NT, NX), dtype=jnp.float64)


def test_wilson_loops_vs_numpy(x):
    w = lat.wilson_loops(x, NT, NX)
    w_np = numpy_wilson_loops(np.asarray(x))
    np.testing.assert_allclose(np.asarray(w), w_np, atol=1e-12)


def test_action_vs_numpy(x):
    beta = 2.0
    s = lat.action(x, beta, NT, NX)
    w_np = numpy_wilson_loops(np.asarray(x))
    s_np = beta * (1.0 - np.cos(w_np)).sum((1, 2))
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-10)


def test_grad_action_matches_autodiff(x):
    beta = 3.0
    f_closed = lat.grad_action(x, beta, NT, NX)
    f_auto = lat.grad_action_autodiff(x, beta, NT, NX)
    np.testing.assert_allclose(
        np.asarray(f_closed), np.asarray(f_auto), atol=1e-10
    )


def test_gauge_invariance_of_action(x):
    """The Wilson action is invariant under U(1) gauge transformations:
    x_mu(n) -> x_mu(n) + a(n) - a(n + mu)."""
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (NB, NT, NX), dtype=jnp.float64)
    xl = x.reshape(NB, 2, NT, NX)
    xu = xl[:, 0] + a - jnp.roll(a, -1, axis=1)
    xv = xl[:, 1] + a - jnp.roll(a, -1, axis=2)
    # NOTE: direction 0 rolls over t (axis 1 of (nb,nt,nx))
    xg = jnp.stack([xu, xv], 1)
    s0 = lat.action(x, 2.0, NT, NX)
    s1 = lat.action(xg, 2.0, NT, NX)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-9)


def test_charges_integer_valued(x):
    """intQ must be (near-)integer: sum of projected plaquette angles / 2pi
    telescopes to the winding number."""
    w = lat.wilson_loops(x, NT, NX)
    q = lat.int_charges(w)
    np.testing.assert_allclose(
        np.asarray(q), np.round(np.asarray(q)), atol=1e-8
    )


def test_plaq_exact_value():
    """i1/i0 ratio sanity: known values (scipy cross-check values)."""
    # scipy.special.i1(4.0)/i0(4.0) = 0.8635226
    assert abs(float(lat.plaq_exact(4.0)) - 0.8635226) < 1e-4
    assert abs(float(lat.plaq_exact(1.0)) - 0.4463900) < 1e-4


def test_project_angle_range():
    xs = jnp.linspace(-4 * np.pi, 4 * np.pi, 101)
    p = lat.project_angle(xs)
    assert float(p.min()) > -np.pi - 1e-9
    assert float(p.max()) <= np.pi + 1e-9
    np.testing.assert_allclose(np.cos(p), np.cos(xs), atol=1e-7)


def test_compat_proj_range():
    xs = jnp.linspace(-10.0, 10.0, 97)
    p = g.compat_proj(xs)
    assert float(p.min()) >= -np.pi - 1e-9
    assert float(p.max()) <= np.pi + 1e-9
    np.testing.assert_allclose(np.sin(p), np.sin(xs), atol=1e-7)


def test_kinetic_energy():
    v = jnp.ones((3, 2, NT, NX))
    ke = g.kinetic_energy(v)
    np.testing.assert_allclose(np.asarray(ke), 0.5 * 2 * NT * NX)


def test_wilson_loops4x4_gauge_invariant(x):
    """4x4 loops are also gauge invariant (closed loops)."""
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (NB, NT, NX), dtype=jnp.float64)
    xl = x.reshape(NB, 2, NT, NX)
    xu = xl[:, 0] + a - jnp.roll(a, -1, axis=1)
    xv = xl[:, 1] + a - jnp.roll(a, -1, axis=2)
    xg = jnp.stack([xu, xv], 1)
    p0 = lat.plaqs4x4(lat.wilson_loops4x4(x, NT, NX))
    p1 = lat.plaqs4x4(lat.wilson_loops4x4(xg, NT, NX))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), rtol=1e-8)


def test_lattice_class_api():
    lattice = lat.LatticeU1(NB, [NT, NX])
    key = jax.random.PRNGKey(1)
    x = lattice.random(key)
    v = lattice.random_momentum(jax.random.PRNGKey(2))
    beta = jnp.asarray(1.0)
    assert lattice.action(x, beta).shape == (NB,)
    assert lattice.kinetic_energy(v).shape == (NB,)
    m = lattice.calc_metrics(x)
    assert set(m) == {"plaqs", "p4x4", "intQ", "sinQ"}
    assert lattice.plaqs_diff(beta, x).shape == (NB,)
