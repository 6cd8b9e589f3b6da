"""Kill-and-resume: a run interrupted mid-beta-ladder and restored from
its per-era checkpoint must continue bit-identically to an uninterrupted
run (VERDICT r1 #5; reference trainers/pytorch/trainer.py:573-701,
1826-1829 — which restores model/optimizer but NOT x/RNG/era position;
this rebuild checkpoints the full resumable state)."""
import os

import jax
import numpy as np

from l2hmc_tpu.experiment import build_experiment


def _overrides(outdir, extra=()):
    return [
        "dynamics.nchains=16",
        "dynamics.latvolume=[4, 4]",
        "dynamics.nleapfrog=2",
        "network.units=[4]",
        "network.dropout_prob=0.0",
        "steps.nera=3",
        "steps.nepoch=3",
        "steps.log=1",
        # plateau decay ON with patience 1: the controller state
        # (best/wait/lr) is checkpointed per era (VERDICT r2 #6), so the
        # resumed run must reproduce run A's LR trajectory exactly
        "learning_rate.factor=0.5",
        "learning_rate.patience=1",
        "annealing_schedule.beta_init=2.0",
        "annealing_schedule.beta_final=3.0",
        "seed=123",
        "save=true",
        f"outdir={outdir}",
        *extra,
    ]


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    # A: uninterrupted 3-era run
    ex_a = build_experiment(_overrides(tmp_path / "a"))
    ex_a.train()

    # B: run 2 eras, "die", then a FRESH Experiment restores and finishes
    ex_b1 = build_experiment(_overrides(tmp_path / "b"))
    ex_b1.train(max_eras=2)
    del ex_b1
    ex_b2 = build_experiment(_overrides(tmp_path / "b", ["restore=true"]))
    ex_b2.train()

    assert ex_b2._start_era == 2   # actually resumed, not restarted
    np.testing.assert_array_equal(np.asarray(ex_a._ts.step),
                                  np.asarray(ex_b2._ts.step))
    np.testing.assert_array_equal(np.asarray(ex_a._ts.params.xeps),
                                  np.asarray(ex_b2._ts.params.xeps))
    np.testing.assert_array_equal(np.asarray(ex_a._x),
                                  np.asarray(ex_b2._x))
    for a, b in zip(
            jax.tree_util.tree_leaves(ex_a._ts.params.vnets),
            jax.tree_util.tree_leaves(ex_b2._ts.params.vnets)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed history covers the full run (loaded + appended)
    ha = ex_a.trainer.histories["train"].get_dataset()
    hb = ex_b2.trainer.histories["train"].get_dataset()
    assert ha["loss"].shape == hb["loss"].shape
    np.testing.assert_allclose(ha["loss"][-1], hb["loss"][-1])
    # plateau controller memory continued, not reset (VERDICT r2 #6)
    sa = ex_a.trainer.controller_state()["plateau"]
    sb = ex_b2.trainer.controller_state()["plateau"]
    assert sa == sb


def test_restore_with_no_checkpoint_starts_fresh(tmp_path):
    ex = build_experiment(_overrides(tmp_path / "c", ["restore=true"]))
    ts, x = ex.setup()
    assert ex._start_era == 0
    assert int(ts.step) == 0


def test_checkpoint_complex_leaves_roundtrip(tmp_path):
    """Complex leaves (the SU(3) lattice) must survive save->restore.

    On the axon TPU backend orbax's direct device->host transfer of a
    complex64 array raises UNIMPLEMENTED mid-save (observed killing a
    full training run at the first era checkpoint); save_checkpoint now
    pre-transfers complex leaves as re/im float pairs. This test pins the
    roundtrip semantics (values, dtypes) that the fix must preserve."""
    from l2hmc_tpu.utils import checkpoint as ckpt

    key = jax.random.key(0)
    tree = {
        "x": jax.numpy.asarray(
            np.arange(12).reshape(3, 4) + 1j * np.ones((3, 4)),
            dtype=np.complex64),
        "w": jax.numpy.ones((2, 2), np.float32),
        "era": np.int64(2),
    }
    ckpt.save_checkpoint(tmp_path, 7, tree)
    got = ckpt.restore_checkpoint(tmp_path, jax.tree_util.tree_map(
        np.zeros_like, tree))
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(tree["x"]))
    assert np.asarray(got["x"]).dtype == np.complex64
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(tree["w"]))
    assert int(got["era"]) == 2
