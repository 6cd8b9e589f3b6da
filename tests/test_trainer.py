"""Trainer smoke + behavior tests (tiny configs, CPU)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.configs import get_config
from l2hmc_tpu.train.trainer import Trainer


def tiny_u1_config(**over):
    cfg = get_config([
        "dynamics.nchains=16",
        "dynamics.latvolume=[8, 8]",
        "dynamics.nleapfrog=2",
        "dynamics.eps=0.1",
        "network.units=[8, 8]",
        "network.use_batch_norm=false",
        "network.dropout_prob=0.0",
        "steps.nera=1",
        "steps.nepoch=4",
        "steps.test=3",
        "steps.log=1",
        "annealing_schedule.beta_init=2.0",
        "annealing_schedule.beta_final=2.0",
        "precision=float64",
    ] + [f"{k}={v}" for k, v in over.items()])
    return cfg


def test_train_step_updates_params_and_loss_finite():
    trainer = Trainer(tiny_u1_config())
    ts, x = trainer.init_state(jax.random.PRNGKey(0))
    ts2, x2, metrics = trainer.train_step(ts, x, 2.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(ts2.step) == 1
    # some parameter must have moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts.params, ts2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
    acc = np.asarray(metrics["acc"])
    assert np.all((acc >= 0) & (acc <= 1))


def test_train_loop_and_eval():
    trainer = Trainer(tiny_u1_config())
    ts, x = trainer.init_state(jax.random.PRNGKey(2))
    ts, x, key = trainer.train(ts, x, jax.random.PRNGKey(3))
    hist = trainer.histories["train"].get_dataset()
    assert "loss" in hist and np.isfinite(hist["loss"]).all()
    # eval + hmc smoke
    x_eval, key, _ = trainer.evaluate(ts, key, job_type="eval", nsteps=2)
    x_hmc, key, info = trainer.evaluate(ts, key, job_type="hmc", nsteps=2)
    assert "acc" in trainer.histories["eval"].history
    assert "acc" in trainer.histories["hmc"].history
    assert info["eps"] > 0


def test_training_improves_loss_u1():
    """Optimization sanity: on a FIXED batch and PRNG key (deterministic
    objective) repeated train steps must reduce the loss."""
    cfg = tiny_u1_config(**{
        "dynamics.nchains": 32, "loss.use_mixed_loss": "false",
    })
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(4))
    x, _ = trainer.warmup(x, 2.0, jax.random.PRNGKey(6), nsteps=20)
    k = jax.random.PRNGKey(5)
    losses = []
    for i in range(25):
        ts, _, m = trainer.train_step(ts, x, 2.0, k)  # same x, same key
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# The SU(3) train smoke is COMPILED now and lives in
# tests/test_su3_train_compiled.py (shares its graph with the sharded
# parity tests via tests/su3_testlib.py) — VERDICT r2 #4.


def test_eps_fixed_freezes_step_sizes():
    cfg = tiny_u1_config(**{"dynamics.eps_fixed": "true"})
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(9))
    ts2, _, _ = trainer.train_step(ts, x, 2.0, jax.random.PRNGKey(10))
    np.testing.assert_allclose(np.asarray(ts2.params.xeps),
                               np.asarray(ts.params.xeps))
    np.testing.assert_allclose(np.asarray(ts2.params.veps),
                               np.asarray(ts.params.veps))


def test_verbose_per_leapfrog_metrics_pipeline():
    """dynamics.verbose=true threads per-leapfrog energy/logdet/logprob
    from the scan through train/eval metrics into the (chain, leapfrog,
    draw) dataset (reference dynamics/pytorch/dynamics.py:968-1022 ->
    utils/history.py:854-892)."""
    cfg = tiny_u1_config(**{"dynamics.verbose": "true"})
    nlf = cfg.dynamics.nleapfrog
    nb = cfg.dynamics.nchains
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(20))
    for step in range(3):
        ts, x, m = trainer.train_step(ts, x, 2.0, jax.random.PRNGKey(step))
        for k in ("energy", "logdet", "logprob"):
            assert m[k].shape == (2 * nlf, nb), (k, m[k].shape)
        trainer.histories["train"].update(m)
    ds = trainer.histories["train"].get_dataset()
    assert ds["energy"].shape == (nb, 2 * nlf, 3)
    # eval path too
    x2, me = trainer.eval_step(ts, x, 2.0, jax.random.PRNGKey(99))
    assert me["energy"].shape == (2 * nlf, nb)
    # xarray dims are (chain, leapfrog, draw)
    try:
        xr_ds = trainer.histories["train"].to_xarray()
        assert tuple(xr_ds["energy"].dims) == ("chain", "leapfrog", "draw")
    except ImportError:
        pass


def test_merge_directions_false_routes_single_direction_kernel():
    """merge_directions=false must change the actual kernel the Trainer
    runs (VERDICT r1: round 1 only changed eps_hmc/timer normalization)."""
    cfg_fb = tiny_u1_config()
    cfg_sd = tiny_u1_config(**{"dynamics.merge_directions": "false"})
    t_fb = Trainer(cfg_fb)
    t_sd = Trainer(cfg_sd)
    assert t_fb.evals_per_step == 2 * cfg_fb.dynamics.nleapfrog
    assert t_sd.evals_per_step == cfg_sd.dynamics.nleapfrog
    ts1, x1 = t_fb.init_state(jax.random.PRNGKey(0))
    ts2, x2 = t_sd.init_state(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    k = jax.random.PRNGKey(1)
    _, xo1, m1 = t_fb.train_step(ts1, x1, 2.0, k)
    _, xo2, m2 = t_sd.train_step(ts2, x2, 2.0, k)
    # same params/key but different kernels -> different proposals
    assert not np.allclose(np.asarray(xo1), np.asarray(xo2))
    # eval path as well
    _, me1 = t_fb.eval_step(ts1, x1, 2.0, k)
    _, me2 = t_sd.eval_step(ts2, x2, 2.0, k)
    assert not np.allclose(np.asarray(me1["sumlogdet"]),
                           np.asarray(me2["sumlogdet"]))


def test_verbose_metrics_on_single_direction_kernel():
    """verbose + merge_directions=false: the single-direction kernel also
    emits the per-leapfrog series (shape (nlf, nb)) — caught missing by
    an e2e CLI probe in round 2."""
    cfg = tiny_u1_config(**{"dynamics.verbose": "true",
                            "dynamics.merge_directions": "false"})
    nlf = cfg.dynamics.nleapfrog
    nb = cfg.dynamics.nchains
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(30))
    ts, x, m = trainer.train_step(ts, x, 2.0, jax.random.PRNGKey(31))
    for k in ("energy", "logdet", "logprob"):
        assert m[k].shape == (nlf, nb), (k, m[k].shape)


def test_grad_accumulation():
    """grad_accum_steps=k applies the optimizer every k-th step with the
    accumulated-mean gradient (the reference's DeepSpeed gas semantics,
    reference configs.py:695-699): params are frozen between boundaries
    and move at the boundary."""
    cfg = tiny_u1_config(**{"grad_accum_steps": "2"})
    trainer = Trainer(cfg)
    ts0, x = trainer.init_state(jax.random.PRNGKey(40))
    ts1, x, _ = trainer.train_step(ts0, x, 2.0, jax.random.PRNGKey(41))
    # first micro-step: gradients accumulated, params unchanged
    w0 = jax.tree_util.tree_leaves(ts0.params.vnets)[0]
    w1 = jax.tree_util.tree_leaves(ts1.params.vnets)[0]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    ts2, x, _ = trainer.train_step(ts1, x, 2.0, jax.random.PRNGKey(42))
    # boundary: params move
    w2 = jax.tree_util.tree_leaves(ts2.params.vnets)[0]
    assert float(np.max(np.abs(np.asarray(w2) - np.asarray(w1)))) > 0

    # the plateau controller's lr rewrite reaches through MultiSteps
    ts3 = trainer._set_lr(ts2, 1e-5)
    st = ts3.opt_state.inner_opt_state
    idx = 1 if (cfg.learning_rate.clip_norm or 0) > 0 else 0
    assert float(st[idx].hyperparams["learning_rate"]) == 1e-5


def test_noam_lr_schedule():
    """learning_rate.schedule=noam: the LR optax ACTUALLY applied — read
    from opt_state.hyperparams after each train step, the same way
    test_grad_accumulation inspects the plateau rewrite — matches the
    closed-form transformer rate lr_init * d^-1/2 * min(s^-1/2,
    s*warmup^-3/2) (reference learning_rate/pytorch/learning_rate.py:11-19)
    at every step. A mis-wired schedule (wrong constant, never advancing,
    silently replaced by a fixed lr) fails here."""
    import numpy as np

    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer

    cfg = get_config([
        "dynamics.nchains=4", "dynamics.latvolume=[8, 8]",
        "learning_rate.schedule=noam", "learning_rate.warmup=100",
        "learning_rate.lr_init=1.0", "learning_rate.clip_norm=1.0",
    ])
    tr = Trainer(cfg)
    ts, x = tr.init_state(jax.random.PRNGKey(0))
    d = max(cfg.network.units)

    def rate(s):
        s = max(s, 1)
        return (d ** -0.5) * min(s ** -0.5, s * 100 ** -1.5)

    def applied_lr(train_state):
        st = train_state.opt_state
        st = getattr(st, "inner_opt_state", st)  # unwrap MultiSteps
        for part in st:
            if hasattr(part, "hyperparams"):
                return float(part.hyperparams["learning_rate"])
        raise AssertionError("no hyperparams in opt_state — schedule "
                             "not wired through inject_hyperparams")

    key = jax.random.PRNGKey(1)
    for step in range(1, 4):
        key, sub = jax.random.split(key)
        ts, x, m = tr.train_step(ts, x, 4.0, sub)
        assert np.isfinite(float(m["loss"]))
        got = applied_lr(ts)
        # inject_hyperparams evaluates the schedule at its pre-update
        # count (step-1); noam clamps s to >= 1
        want = rate(step - 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=(
            f"applied lr at step {step} is {got}, closed form says {want}"))
    # sanity on the shape itself: rises through warmup, decays after
    assert rate(50) < rate(100) > rate(400)


def test_fixed_budget_warmup_runs_full_nsteps():
    """steps.warmup > 0 thermalizes for EXACTLY the requested number of
    HMC trajectories, no stationarity early-stop (configs.Steps.warmup —
    the 8^4 record started training at plaq 0.0007 vs equilibrium ~0.55
    because the adaptive warmup plateau-fooled after <60 steps)."""
    cfg = tiny_u1_config()
    trainer = Trainer(cfg)
    _, x = trainer.init_state(jax.random.PRNGKey(50))
    calls = []
    real = trainer.hmc_step

    def counting(x, beta, key, eps=None):
        calls.append(1)
        return real(x, beta, key, eps)

    trainer.hmc_step = counting
    # U(1) at beta=1: the adaptive path would stop at the exact-plaquette
    # criterion; exact=True must ignore it and run the full budget
    trainer.warmup(x, 1.0, jax.random.PRNGKey(51), nsteps=7, exact=True)
    assert len(calls) == 7
