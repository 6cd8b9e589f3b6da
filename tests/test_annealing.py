"""Annealer + ReduceLROnPlateau controller tests."""
import numpy as np

from l2hmc_tpu.configs import AnnealingSchedule, LearningRateConfig
from l2hmc_tpu.train.annealing import Annealer, ReduceLROnPlateau


def make_annealer(patience=2):
    sched = AnnealingSchedule(beta_init=4.0, beta_final=6.0)
    sched.setup(5, 100)
    return Annealer(sched, patience=patience)


def test_annealer_advances_on_improvement():
    a = make_annealer()
    b = a.end_era(0, 4.0, [10.0, 8.0, 6.0])  # improving
    assert b > 4.0


def test_annealer_holds_then_backs_off():
    a = make_annealer(patience=1)
    a._prev_best = -100.0  # nothing will improve on this
    b0 = 4.5
    a.betas = [4.0, b0]
    b1 = a.end_era(0, b0, [5.0, 6.0, 7.0])   # worsening slope, not improved
    assert b1 == b0  # patient hold (count not exceeded)
    a.betas.append(b0)
    a.betas.append(b0)
    b2 = a.end_era(1, b0, [5.0, 6.0, 7.0])
    assert b2 == 4.0  # backed off to previous beta


def test_annealer_caps_at_beta_final():
    a = make_annealer()
    b = a.end_era(0, 6.0, [3.0, 2.0])
    assert b <= 6.0


def test_plateau_decays_after_patience():
    cfg = LearningRateConfig(lr_init=1e-3, factor=0.5, patience=2,
                             min_delta=1e-4, min_lr=1e-6)
    p = ReduceLROnPlateau(cfg)
    assert p.update(1.0) == 1e-3       # new best
    assert p.update(1.0) == 1e-3       # wait 1
    lr = p.update(1.0)                 # wait 2 -> decay
    assert abs(lr - 5e-4) < 1e-12


def test_plateau_respects_min_lr():
    cfg = LearningRateConfig(lr_init=1e-5, factor=0.1, patience=1,
                             min_lr=1e-6)
    p = ReduceLROnPlateau(cfg)
    p.update(1.0)
    for _ in range(10):
        lr = p.update(1.0)
    assert lr >= 1e-6


def test_trainer_set_lr():
    import jax
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer
    cfg = get_config([
        "dynamics.nchains=4", "dynamics.latvolume=[4, 4]",
        "dynamics.nleapfrog=2", "network.units=[8]",
        "steps.nera=1", "steps.nepoch=1", "steps.test=1",
        "precision=float64",
    ])
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(0))
    ts2 = trainer._set_lr(ts, 1e-5)
    lr = float(np.asarray(ts2.opt_state[0].hyperparams["learning_rate"]))
    assert abs(lr - 1e-5) < 1e-12
    # a step still runs with the modified opt state
    ts3, _, m = trainer.train_step(ts2, x, 2.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
