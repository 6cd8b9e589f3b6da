"""Loss function tests."""
import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.configs import LossConfig
from l2hmc_tpu.models.loss import LatticeLoss, mixed_loss
from l2hmc_tpu.ops.lattice_u1 import LatticeU1
from l2hmc_tpu.ops.lattice_su3 import LatticeSU3
from l2hmc_tpu.ops import u1 as u1g
from l2hmc_tpu.ops import su3 as su3g


def test_mixed_loss_formula():
    l = jnp.asarray(2.0)
    np.testing.assert_allclose(float(mixed_loss(l, 0.5)), 0.5 / 2 - 2 / 0.5)


def test_charge_loss_rewards_movement():
    """Bigger charge change => more negative loss (non-mixed)."""
    lat = LatticeU1(4, [8, 8])
    cfg = LossConfig(use_mixed_loss=False, charge_weight=0.01)
    loss = LatticeLoss(lat, cfg)
    key = jax.random.PRNGKey(0)
    x1 = u1g.random(key, (4, 2 * 64), dtype=jnp.float64)
    acc = jnp.ones(4, dtype=jnp.float64)
    l_small = loss(x1, x1 + 0.01, acc)
    x_far = u1g.random(jax.random.PRNGKey(1), (4, 2 * 64), dtype=jnp.float64)
    l_big = loss(x1, x_far, acc)
    assert float(l_big) < float(l_small) <= 0.0


def test_acc_weighting():
    """acc = 0 (all rejected) kills the non-mixed loss entirely."""
    lat = LatticeU1(4, [8, 8])
    cfg = LossConfig(use_mixed_loss=False, charge_weight=0.01)
    loss = LatticeLoss(lat, cfg)
    x1 = u1g.random(jax.random.PRNGKey(2), (4, 128), dtype=jnp.float64)
    x2 = u1g.random(jax.random.PRNGKey(3), (4, 128), dtype=jnp.float64)
    l0 = loss(x1, x2, jnp.zeros(4, dtype=jnp.float64))
    np.testing.assert_allclose(float(l0), 0.0, atol=1e-12)


def test_u1_plaq_weight_path_works():
    """The U(1)+plaq_weight path is usable here (dead/broken in the
    reference, loss.py:57-70)."""
    lat = LatticeU1(4, [8, 8])
    cfg = LossConfig(use_mixed_loss=False, charge_weight=0.01,
                     plaq_weight=0.1, rmse_weight=0.1)
    loss = LatticeLoss(lat, cfg)
    x1 = u1g.random(jax.random.PRNGKey(4), (4, 128), dtype=jnp.float64)
    x2 = u1g.random(jax.random.PRNGKey(5), (4, 128), dtype=jnp.float64)
    val = loss(x1, x2, 0.5 * jnp.ones(4, dtype=jnp.float64))
    assert np.isfinite(float(val))


def test_su3_loss_terms():
    lat = LatticeSU3(2, [2, 2, 2, 2])
    cfg = LossConfig(use_mixed_loss=False, charge_weight=0.0,
                     plaq_weight=0.1, rmse_weight=0.1)
    loss = LatticeLoss(lat, cfg)
    x1 = su3g.random(jax.random.PRNGKey(6), (2, 4, 2, 2, 2, 2, 3, 3))
    x2 = su3g.random(jax.random.PRNGKey(7), (2, 4, 2, 2, 2, 2, 3, 3))
    acc = jnp.ones(2, dtype=jnp.float64)
    val = loss(x1, x2, acc)
    assert np.isfinite(float(val))
    assert float(val) < 0  # movement rewarded


def test_mixed_loss_mode_finite():
    lat = LatticeU1(4, [8, 8])
    cfg = LossConfig(use_mixed_loss=True, charge_weight=0.01)
    loss = LatticeLoss(lat, cfg)
    x1 = u1g.random(jax.random.PRNGKey(8), (4, 128), dtype=jnp.float64)
    val = loss(x1, x1, jnp.ones(4, dtype=jnp.float64))
    assert np.isfinite(float(val))


def test_lattice_metrics_keys():
    lat = LatticeU1(4, [8, 8])
    loss = LatticeLoss(lat, LossConfig())
    x1 = u1g.random(jax.random.PRNGKey(9), (4, 128), dtype=jnp.float64)
    x2 = u1g.random(jax.random.PRNGKey(10), (4, 128), dtype=jnp.float64)
    m = loss.lattice_metrics(x1, x2)
    assert set(m) >= {"plaqs", "intQ", "sinQ", "dQint", "dQsin"}

def test_divergent_chain_does_not_poison_loss_or_grads():
    """One chain with a NaN proposal (blown-up leapfrog) must cost ONLY
    that chain: the loss stays finite and the other chains' gradient
    survives. Before the fix, 0(acc) * NaN(diff) = NaN poisoned the batch
    mean, and the reference-parity nan_to_num-on-grads then silently
    zeroed the ENTIRE update — an 8^4 hot-start run trained for 600 steps
    with loss=nan and learned nothing."""
    lat = LatticeU1(4, [8, 8])
    for mixed in (False, True):
        cfg = LossConfig(use_mixed_loss=mixed, charge_weight=0.01,
                         rmse_weight=0.01)
        loss = LatticeLoss(lat, cfg)
        x1 = u1g.random(jax.random.PRNGKey(11), (4, 128), dtype=jnp.float64)
        x2 = u1g.random(jax.random.PRNGKey(12), (4, 128), dtype=jnp.float64)
        x2 = x2.at[0].set(jnp.nan)                      # divergent chain
        acc = jnp.array([0.0, 1.0, 1.0, 1.0], dtype=jnp.float64)

        val, g = jax.value_and_grad(lambda xp: loss(x1, xp, acc))(x2)
        assert np.isfinite(float(val)), f"mixed={mixed}: loss is not finite"
        g = np.asarray(g)
        # healthy chains keep their gradient signal
        assert np.all(np.isfinite(g[1:])), f"mixed={mixed}"
        assert float(np.max(np.abs(g[1:]))) > 0, f"mixed={mixed}"

def test_flowed_charge_loss_su3():
    """loss.charge_flow_nsteps > 0 (SU(3)): the charge term is computed
    on the Wilson-FLOWED clover charge, differentiably — gradients flow
    back through the RK3 flow into the proposal. Motivation quantified in
    records/su3_8x8_b57_quality.md: the unflowed sinQ signal is UV noise
    at SU(3) (~2.6e-4/draw) while the flowed sector charge moves 0.126
    integer units/draw. No reference counterpart (its SU(3) intQ is a
    TODO stub, src/l2hmc/lattice/su3/pytorch/lattice.py:232-235)."""
    from l2hmc_tpu.configs import LossConfig
    from l2hmc_tpu.ops import su3 as sg

    lat = LatticeSU3(2, [2, 2, 2, 2])
    cfg = LossConfig(use_mixed_loss=False, charge_weight=0.1,
                     charge_flow_nsteps=2, charge_flow_eps=0.05)
    loss = LatticeLoss(lat, cfg)
    x1 = sg.random(jax.random.PRNGKey(1),
                   (2, 4, 2, 2, 2, 2, 3, 3)).astype(jnp.complex64)
    x2 = sg.random(jax.random.PRNGKey(2),
                   (2, 4, 2, 2, 2, 2, 3, 3)).astype(jnp.complex64)
    acc = jnp.ones(2, dtype=jnp.float32)

    val, g = jax.jit(jax.value_and_grad(
        lambda xp: loss(x1, xp, acc), holomorphic=False))(x2)
    assert np.isfinite(float(val))
    assert float(val) < 0  # movement rewarded (plain -q/w form)
    gm = float(np.max(np.abs(np.asarray(g))))
    assert np.isfinite(gm) and gm > 0, "no gradient through the flow"

    # the flowed term must actually differ from the unflowed one
    cfg0 = LossConfig(use_mixed_loss=False, charge_weight=0.1)
    val0 = LatticeLoss(lat, cfg0)(x1, x2, acc)
    assert abs(float(val) - float(val0)) > 1e-9
