"""Wilson flow + clover topological charge (ops/wilson_flow.py,
su3_comp.clover_field/topo_charge_clover).

The reference repo has NO flow and its SU(3) integer charge is a TODO
stub (lattice/su3/pytorch/lattice.py:232-235); these are capabilities
the rebuild adds, so the oracles are first-principles:
  * an abelian constant-flux torus config whose clover charge is exactly
    2 q1 q2 sinc(f1) sinc(f2),
  * gauge invariance under a random local SU(3) rotation,
  * the gradient-flow property dS/dt <= 0 (monotone smoothing),
  * RK3 order: global error ~ eps^3 against a fine-step reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.ops import su3_comp as comp
from l2hmc_tpu.ops import wilson_flow as wf

L = 4
LAT = (L, L, L, L)
V = L ** 4
NB = 2


def _flux_config(q1: int, q2: int) -> jax.Array:
    """Abelian constant-flux config: flux 2*pi*q1/L^2 in the (0,1)
    plane (diag(e^{ia}, e^{-ia}, 1) embedding), q2 in (2,3)."""
    n = np.indices(LAT)
    U = np.zeros((1, 4, *LAT, 3, 3), dtype=np.complex128)
    U[..., 0, 0] = U[..., 1, 1] = U[..., 2, 2] = 1.0

    def embed(d, phase):
        U[0, d, ..., 0, 0] = np.exp(1j * phase)
        U[0, d, ..., 1, 1] = np.exp(-1j * phase)

    a1 = 2 * np.pi * q1 / (L * L)
    embed(0, -a1 * n[1])
    embed(1, np.where(n[1] == L - 1, 2 * np.pi * q1 * n[0] / L, 0.0))
    a2 = 2 * np.pi * q2 / (L * L)
    embed(2, -a2 * n[3])
    embed(3, np.where(n[3] == L - 1, 2 * np.pi * q2 * n[2] / L, 0.0))
    return jnp.asarray(U)


@pytest.mark.parametrize("q1,q2", [(1, 1), (1, 2), (-1, 1)])
def test_clover_charge_flux_oracle(q1, q2):
    x = comp.from_complex_lattice(_flux_config(q1, q2))
    Q = jax.jit(lambda x: comp.topo_charge_clover(x, LAT, 1))(x)
    f1 = 2 * np.pi * q1 / (L * L)
    f2 = 2 * np.pi * q2 / (L * L)
    expect = 2 * q1 * q2 * (np.sin(f1) / f1) * (np.sin(f2) / f2)
    np.testing.assert_allclose(float(Q[0]), expect, rtol=1e-10)


def test_clover_charge_cold_zero():
    x = comp.from_complex_lattice(jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.complex128), (NB, 4, *LAT, 3, 3)))
    np.testing.assert_array_equal(
        np.asarray(comp.topo_charge_clover(x, LAT, NB)), 0.0)


def test_clover_charge_gauge_invariant():
    key = jax.random.PRNGKey(0)
    x = g.random(key, (NB, 4, *LAT, 3, 3), dtype=jnp.complex128)
    # local gauge transform: U_u(n) -> g(n) U_u(n) g^(n+u)
    gt = np.asarray(g.random(jax.random.PRNGKey(1), (NB, *LAT, 3, 3),
                             dtype=jnp.complex128))
    xn = np.asarray(x)
    xg = np.empty_like(xn)
    for u in range(4):
        g_pu = np.roll(gt, -1, axis=1 + u)
        xg[:, u] = gt @ xn[:, u] @ np.conj(np.swapaxes(g_pu, -1, -2))
    q0 = comp.topo_charge_clover(comp.from_complex_lattice(x), LAT, NB)
    q1 = comp.topo_charge_clover(
        comp.from_complex_lattice(jnp.asarray(xg)), LAT, NB)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-9)


@pytest.fixture(scope="module")
def hot_x():
    return g.random(jax.random.PRNGKey(7), (NB, 4, *LAT, 3, 3),
                    dtype=jnp.complex128)


def test_flow_smooths_monotonically(hot_x):
    """Gradient flow: the Wilson action decreases every step and the
    plaquette rises toward 1."""
    xf = comp.from_complex_lattice(hot_x)
    res = jax.jit(lambda x: wf.flow(x, 0.02, 20, LAT, NB))(xf)
    obs = wf.flow_observables(res.t, res.tr, V)
    plaq = np.asarray(obs["plaq"])
    assert np.all(np.diff(plaq, axis=0) > 0), "plaquette must rise"
    assert np.all(plaq[-1] > plaq[0] + 0.05)
    # unitarity preserved through 20 RK3 steps (projectSU each step)
    out = comp.to_complex_lattice(res.x, LAT, NB, jnp.complex128)
    dev_mean, _ = g.checkSU(out)
    assert float(jnp.max(dev_mean)) < 1e-10


def test_flow_rk3_order(hot_x):
    """Halving eps at fixed flow time cuts the global error ~8x
    (third-order integrator)."""
    xf = comp.from_complex_lattice(hot_x)
    t_end = 0.12

    def run(nsteps):
        res = jax.jit(
            lambda x: wf.flow(x, t_end / nsteps, nsteps, LAT, NB))(xf)
        return comp.to_complex_lattice(res.x, LAT, NB, jnp.complex128)

    ref = run(48)
    e1 = float(jnp.max(jnp.abs(run(6) - ref)))
    e2 = float(jnp.max(jnp.abs(run(12) - ref)))
    assert e1 / e2 > 5.5, (e1, e2)   # exact 3rd order -> ~8
    assert e2 < 1e-5


def test_flow_preserves_flux_charge():
    """The flux config is a flow fixed point family (constant abelian
    field strength): its clover charge is flow-stable to O(eps^3)."""
    x = comp.from_complex_lattice(_flux_config(1, 1))
    q0 = float(comp.topo_charge_clover(x, LAT, 1)[0])
    res = jax.jit(lambda x: wf.flow(x, 0.05, 10, LAT, 1))(x)
    q1 = float(comp.topo_charge_clover(res.x, LAT, 1)[0])
    # topological sectors: the charge must not drift between integers
    assert abs(q1 - q0) < 0.05, (q0, q1)


def test_flow_complex_lattice_wrapper(hot_x):
    x2, obs = jax.jit(
        lambda x: wf.flow_complex_lattice(x, 0.02, 5))(hot_x)
    assert x2.shape == hot_x.shape and x2.dtype == hot_x.dtype
    assert obs["plaq"].shape == (5, NB)
    assert obs["t2E"].shape == (5, NB)
    assert np.all(np.isfinite(np.asarray(obs["t2E"])))


def test_sharded_flow_matches_single_device():
    """Flow + clover charge on the (data x lattice) mesh == single
    device (same halo-exchange parity statement as the HMC tests)."""
    from l2hmc_tpu.parallel.lattice_sharded import (ShardedLatticeSU3,
                                                    make_mesh_2d)

    assert len(jax.devices()) >= 8
    x = g.random(jax.random.PRNGKey(3), (4, 4, *LAT, 3, 3),
                 dtype=jnp.complex128)
    mesh = make_mesh_2d(2, 4)
    sl = ShardedLatticeSU3(mesh, 4, list(LAT))
    xs = sl.shard(x)
    x_sh, obs_sh = sl.flow(xs, 0.02, 4)

    xf = comp.from_complex_lattice(x)
    res = wf.flow(xf, 0.02, 4, LAT, 4)
    obs = wf.flow_observables(res.t, res.tr, V)
    q = comp.topo_charge_clover(res.x, LAT, 4)
    x_ref = comp.to_complex_lattice(res.x, LAT, 4, x.dtype)

    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(obs_sh["plaq"]),
                               np.asarray(obs["plaq"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(obs_sh["Qclover"]),
                               np.asarray(q), atol=1e-10)
