"""Lattice-domain decomposition tests on the virtual 8-device CPU mesh.

Sharded (data x lattice) SU(3) action/force/plaquettes/HMC must equal the
single-device implementations bit-for-bit (up to fp reassociation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import lattice_su3 as lat
from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.parallel.halo import roll_halo
from l2hmc_tpu.parallel.lattice_sharded import (
    ShardedLatticeSU3, make_mesh_2d,
)

VOL = (4, 2, 2, 2)   # t=4 shards over 4 lattice devices
NB = 4               # chains shard over 2 data devices


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh_2d(2, 4)


@pytest.fixture(scope="module")
def x():
    return g.random(jax.random.PRNGKey(0), (NB, 4, *VOL, 3, 3),
                    dtype=jnp.complex128)


def test_halo_roll_matches_jnp_roll(mesh):
    """roll_halo under shard_map == jnp.roll globally."""
    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    a = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    spec = P(None, "lattice")
    for shift in (-1, 1):
        fn = shard_map(
            lambda t: roll_halo(t, shift, 1, "lattice"),
            mesh=mesh, in_specs=(spec,), out_specs=spec)
        got = fn(jax.device_put(a, NamedSharding(mesh, spec)))
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(jnp.roll(a, shift, axis=1)))


def test_sharded_action_matches(mesh, x):
    sl = ShardedLatticeSU3(mesh, NB, list(VOL))
    xs = sl.shard(x)
    s_sharded = sl.action(xs, 2.0)
    s_ref = lat.action(x, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(s_sharded), np.asarray(s_ref),
                               rtol=1e-12)


def test_sharded_force_matches(mesh, x):
    sl = ShardedLatticeSU3(mesh, NB, list(VOL))
    xs = sl.shard(x)
    f_sharded = sl.grad_action(xs, 2.0)
    f_ref = lat.grad_action(x, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(f_sharded), np.asarray(f_ref),
                               atol=1e-12)


def test_sharded_plaqs_matches(mesh, x):
    sl = ShardedLatticeSU3(mesh, NB, list(VOL))
    xs = sl.shard(x)
    p_sharded = sl.plaqs(xs)
    wl, _ = lat.wilson_loops(x, VOL)
    p_ref = lat.plaqs(wl, int(np.prod(VOL)))
    np.testing.assert_allclose(np.asarray(p_sharded), np.asarray(p_ref),
                               rtol=1e-12)


def test_sharded_hmc_trajectory_matches(mesh, x):
    """Whole sharded leapfrog trajectory == single-device trajectory."""
    sl = ShardedLatticeSU3(mesh, NB, list(VOL))
    v = g.random_momentum(jax.random.PRNGKey(2), x.shape,
                          dtype=jnp.complex128)
    xs, vs = sl.shard(x), sl.shard(v)
    xp_s, vp_s, dh_s = sl.hmc_trajectory(xs, vs, 2.0, 0.01, 3)

    # single-device reference trajectory
    def body(carry, _):
        x_, v_, f_ = carry
        v1 = v_ - 0.5 * 0.01 * f_
        xp = g.update_gauge(x_, 0.01 * v1)
        f2 = lat.grad_action(xp, 2.0, VOL)
        v2 = v1 - 0.5 * 0.01 * f2
        return (xp, v2, f2), None

    f0 = lat.grad_action(x, 2.0, VOL)
    (xp_r, vp_r, _), _ = jax.lax.scan(body, (x, v, f0), None, length=3)
    h0 = g.kinetic_energy(v) + lat.action(x, 2.0, VOL)
    h1 = g.kinetic_energy(vp_r) + lat.action(xp_r, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(xp_s), np.asarray(xp_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(dh_s), np.asarray(h0 - h1),
                               atol=1e-9)


def test_sharded_hmc_step_runs(mesh, x):
    sl = ShardedLatticeSU3(mesh, NB, list(VOL))
    xs = sl.shard(x)
    x_out, m = sl.hmc_step(xs, 2.0, jax.random.PRNGKey(3), 0.01, 3)
    acc = np.asarray(m["acc"])
    assert acc.shape == (NB,)
    assert np.all((acc >= 0) & (acc <= 1))
    # output keeps the 2-D sharding (specs match modulo trailing Nones)
    def norm(spec):
        s = tuple(spec)
        while s and s[-1] is None:
            s = s[:-1]
        return s
    assert norm(x_out.sharding.spec) == norm(xs.sharding.spec)


@pytest.mark.skipif(
    __import__("os").environ.get("L2HMC_FULL_TESTS") != "1",
    reason="16^4 feasibility evidence (BASELINE config #5): ~4 min XLA "
           "compile + ~43 s/step on the emulated CPU mesh; the geometry "
           "exercises no code path the 4x2x2x2 tests miss")
def test_16e4_sharded_hmc_step():
    """BASELINE config #5 feasibility: one jitted sharded HMC step at
    16^4 (2 chains over a [2, 4] mesh) compiles and executes on the
    virtual mesh. Measured on this machine: 226 s compile, 42.8 s/step
    warm (CPU emulation; the same graph is ~ms-scale per step on v5e).
    HBM arithmetic lives in README 'Scaling to 16^4'."""
    mesh = make_mesh_2d(2, 4)
    sl = ShardedLatticeSU3(mesh, 2, [16, 16, 16, 16])
    x = sl.shard(jnp.broadcast_to(jnp.eye(3, dtype=jnp.complex64),
                                  sl.xshape))
    x2, m = sl.hmc_step(x, 6.0, jax.random.PRNGKey(0), 0.01, 2)
    acc = np.asarray(m["acc"])
    assert acc.shape == (2,)
    assert np.all(np.isfinite(acc))
    p = np.asarray(sl.plaqs(x2))
    assert np.all(np.isfinite(p)) and np.all(p > 0.9)  # near-cold start
