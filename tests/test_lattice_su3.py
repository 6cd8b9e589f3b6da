"""4D SU(3) lattice tests.

Oracles: autodiff for the staple force, gauge invariance + cold-lattice
limits for action/plaquettes (the invariants the reference checks by hand
in its __main__ smoke blocks, reference lattice/su3/pytorch/lattice.py:372+).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.ops import lattice_su3 as lat

VOL = (2, 2, 2, 4)
NB = 2
SHAPE = (NB, 4, *VOL, 3, 3)


@pytest.fixture(scope="module")
def x():
    return g.random(jax.random.PRNGKey(11), SHAPE, dtype=jnp.complex128)


def test_cold_lattice_plaqs():
    """Identity links -> plaquette = 1, action = -2 beta Nplaq / ... exact:
    S = -(beta/3) * 6 * vol * 3 = -6 beta vol."""
    x = jnp.broadcast_to(jnp.eye(3, dtype=jnp.complex128), SHAPE)
    wl, _ = lat.wilson_loops(x, VOL)
    vol = int(np.prod(VOL))
    np.testing.assert_allclose(np.asarray(lat.plaqs(wl, vol)), 1.0, atol=1e-14)
    s = lat.action(x, 6.0, VOL)
    np.testing.assert_allclose(np.asarray(s), -6.0 * 6.0 * vol, rtol=1e-12)


def test_action_gauge_invariance(x):
    """S invariant under U_mu(n) -> g(n) U_mu(n) g(n+mu)†."""
    gt = g.random(jax.random.PRNGKey(12), (NB, *VOL, 3, 3),
                  dtype=jnp.complex128)
    xl = x.reshape(SHAPE)
    xs = []
    for u in range(4):
        gu = jnp.roll(gt, -1, axis=u + 1)
        xs.append(gt @ xl[:, u] @ g.adjoint(gu))
    xg = jnp.stack(xs, axis=1)
    s0 = lat.action(x, 2.0, VOL)
    s1 = lat.action(xg, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-11)


def test_action_gauge_invariance_with_rect(x):
    gt = g.random(jax.random.PRNGKey(13), (NB, *VOL, 3, 3),
                  dtype=jnp.complex128)
    xl = x.reshape(SHAPE)
    xs = []
    for u in range(4):
        gu = jnp.roll(gt, -1, axis=u + 1)
        xs.append(gt @ xl[:, u] @ g.adjoint(gu))
    xg = jnp.stack(xs, axis=1)
    s0 = lat.action(x, 2.0, VOL, c1=-1.4088)
    s1 = lat.action(xg, 2.0, VOL, c1=-1.4088)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-11)


def test_staple_force_matches_autodiff(x):
    beta = 1.7
    f_staple = lat.grad_action(x, beta, VOL)
    f_auto = lat.grad_action_autodiff(x, beta, VOL)
    np.testing.assert_allclose(
        np.asarray(f_staple), np.asarray(f_auto), atol=1e-11
    )


def test_force_is_tah(x):
    f = lat.grad_action(x, 2.0, VOL).reshape(SHAPE)
    fn = np.asarray(f)
    np.testing.assert_allclose(
        fn, -np.conj(np.swapaxes(fn, -2, -1)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.trace(fn, axis1=-2, axis2=-1), 0.0, atol=1e-12
    )


def test_rect_force_autodiff_is_tah(x):
    f = lat.grad_action_autodiff(x, 2.0, VOL, c1=-0.331).reshape(SHAPE)
    fn = np.asarray(f)
    np.testing.assert_allclose(
        fn, -np.conj(np.swapaxes(fn, -2, -1)), atol=1e-12
    )


def test_charges_translation_invariance(x):
    """Topological charge density sums are translation invariant."""
    wl, _ = lat.wilson_loops(x, VOL)
    vol = int(np.prod(VOL))
    q0 = lat.charges(wl, vol)
    xr = jnp.roll(x.reshape(SHAPE), 1, axis=3)  # translate along x
    wlr, _ = lat.wilson_loops(xr, VOL)
    q1 = lat.charges(wlr, vol)
    np.testing.assert_allclose(np.asarray(q0.sinQ), np.asarray(q1.sinQ),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(q0.intQ), np.asarray(q1.intQ),
                               atol=1e-12)


def test_lattice_class_api(x):
    lattice = lat.LatticeSU3(NB, list(VOL))
    beta = jnp.asarray(1.0)
    assert lattice.action(x, beta).shape == (NB,)
    ke = lattice.kinetic_energy(
        lattice.random_momentum(jax.random.PRNGKey(1)))
    assert ke.shape == (NB,)
    m = lattice.calc_metrics(x)
    assert set(m) == {"plaqs", "intQ", "sinQ"}
    # plaqs of a hot (random) lattice should be small but finite
    assert float(jnp.max(jnp.abs(m["plaqs"]))) < 0.5
