"""flow_nsteps > 0 wires Wilson-flowed observables through the eval
surface: every eval/hmc draw carries flowQ (flowed clover charge),
flow_plaq and flow_t2E, and Experiment.sampler_stats reports the flowed
tunneling rate (dQint_flow). Uses the canonical SU(3) test config."""
import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.train.trainer import Trainer

from su3_testlib import su3_cfg, x32_mode  # noqa: F401 (autouse fixture)


def test_hmc_eval_emits_flowed_observables():
    cfg = su3_cfg(["flow_nsteps=3", "flow_eps=0.05"])
    tr = Trainer(cfg)
    assert tr._flow_enabled
    ts, x = tr.init_state(jax.random.PRNGKey(0))
    tr.evaluate(ts, jax.random.PRNGKey(1), job_type="hmc", nsteps=4,
                x=x, nchains=cfg.dynamics.nchains)
    h = tr.histories["hmc"].get_dataset()
    for k in ("flowQ", "flow_plaq", "flow_t2E"):
        assert k in h, list(h)
        assert np.all(np.isfinite(np.asarray(h[k])))
    # flowed plaquette is smoothed ABOVE the unflowed one
    assert float(np.mean(h["flow_plaq"])) > float(np.mean(h["plaqs"]))

    # sampler_stats picks up the flowed series
    from l2hmc_tpu.experiment import Experiment
    exp = Experiment.__new__(Experiment)
    exp.trainer = tr
    stats = Experiment.sampler_stats(exp, "hmc")
    assert "dQint_flow" in stats and "flowQ_mean_abs" in stats
    assert np.isfinite(stats["dQint_flow"])


def test_flow_disabled_by_default():
    cfg = su3_cfg()
    tr = Trainer(cfg)
    assert not tr._flow_enabled
