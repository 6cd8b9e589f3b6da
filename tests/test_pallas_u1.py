"""Pallas U(1) kernel vs jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.ops import lattice_u1 as lat
from l2hmc_tpu.ops.pallas import u1_kernels

NT, NX, NB = 16, 16, 256


def test_force_action_matches_reference():
    x = jax.random.uniform(
        jax.random.PRNGKey(0), (NB, 2 * NT * NX),
        dtype=jnp.float32, minval=-3.0, maxval=3.0)
    beta = 4.0
    force, act = u1_kernels.force_action(x, beta, NT, NX, interpret=True)
    f_ref = lat.grad_action(x, jnp.float32(beta), NT, NX)
    a_ref = lat.action(x, jnp.float32(beta), NT, NX)
    np.testing.assert_allclose(np.asarray(force), np.asarray(f_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(act), np.asarray(a_ref),
                               rtol=2e-5)


def test_custom_vjp_matches_autodiff():
    """Gradient THROUGH the Pallas force (custom VJP) == gradient through
    the jnp closed-form force."""
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (8, 2 * NT * NX),
        dtype=jnp.float64, minval=-3.0, maxval=3.0)
    beta = jnp.float64(2.0)

    def scalar_of_force(fa):
        def f(x):
            force, act = fa(x)
            return jnp.sum(jnp.sin(force) * 1.7) + jnp.sum(act * 0.3)
        return f

    pallas_fa = lambda x: u1_kernels.force_action_ad(x, beta, NT, NX, True)
    ref_fa = lambda x: (lat.grad_action(x, beta, NT, NX),
                        lat.action(x, beta, NT, NX))
    g_pallas = jax.grad(scalar_of_force(pallas_fa))(x)
    g_ref = jax.grad(scalar_of_force(ref_fa))(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               atol=1e-8)


def test_transposed_entry():
    xt = jax.random.uniform(
        jax.random.PRNGKey(1), (2, NT, NX, NB),
        dtype=jnp.float32, minval=-3.0, maxval=3.0)
    ft, act = u1_kernels.force_action_t(xt, 2.0, NT, NX, interpret=True)
    assert ft.shape == xt.shape
    assert act.shape == (NB,)
    x = jnp.transpose(xt, (3, 0, 1, 2)).reshape(NB, -1)
    f_ref = lat.grad_action(x, jnp.float32(2.0), NT, NX)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(ft, (3, 0, 1, 2)).reshape(NB, -1)),
        np.asarray(f_ref), atol=2e-5)
