"""Determinism: same seed => identical training trajectory (the
reference's seed_everything + deterministic-algorithms hardening,
reference utils/dist.py:306-340, becomes exact PRNG-key determinism)."""
import jax
import numpy as np

from l2hmc_tpu.configs import get_config
from l2hmc_tpu.train.trainer import Trainer


def _run(seed):
    cfg = get_config([
        f"seed={seed}",
        "dynamics.nchains=8", "dynamics.latvolume=[4, 4]",
        "dynamics.nleapfrog=2", "network.units=[8]",
        "network.use_batch_norm=false", "network.dropout_prob=0.1",
        "steps.nera=1", "steps.nepoch=1", "steps.test=1",
        "precision=float64",
    ])
    t = Trainer(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    ts, x = t.init_state(key)
    for i in range(3):
        key, k = jax.random.split(key)
        ts, x, m = t.train_step(ts, x, 2.0, k)
    return np.asarray(x), float(m["loss"])


def test_same_seed_same_trajectory():
    x1, l1 = _run(123)
    x2, l2 = _run(123)
    np.testing.assert_array_equal(x1, x2)
    assert l1 == l2


def test_different_seed_different_trajectory():
    x1, _ = _run(123)
    x2, _ = _run(321)
    assert np.abs(x1 - x2).max() > 1e-6
