"""History / timer / plots utility tests."""
import os

import numpy as np

from l2hmc_tpu.utils.history import History, summarize_dict
from l2hmc_tpu.utils.step_timer import StepTimer
from l2hmc_tpu.utils import plots


def test_history_accumulate_and_dataset():
    h = History()
    for step in range(5):
        avgs = h.update({"loss": np.float64(step), "acc": np.ones(4) * 0.5})
        assert avgs["acc"] == 0.5
    d = h.get_dataset()
    assert d["loss"].shape == (5,)
    assert d["acc"].shape == (4, 5)  # (chain, draw)


def test_history_per_leapfrog_reshape():
    h = History()
    for _ in range(3):
        h.update({"energy": np.zeros((6, 4))})  # (nlf, chain) per draw
    d = h.get_dataset()
    assert d["energy"].shape == (4, 6, 3)  # (chain, leapfrog, draw)


def test_history_save(tmp_path):
    h = History()
    for i in range(4):
        h.update({"x": np.random.randn(3)})
    p = h.save(str(tmp_path), "train")
    assert os.path.exists(p)
    assert os.path.exists(tmp_path / "train_summary.json")


def test_step_timer_rates():
    t = StepTimer(evals_per_step=8)
    import time
    for _ in range(3):
        with t:
            time.sleep(0.01)
    r = t.get_eval_rate()
    assert r["nsteps"] == 3
    assert r["nevals"] == 24
    assert r["eval_rate"] > 0


def test_summarize_dict():
    s = summarize_dict({"a": np.float64(1.5), "b": np.ones(3)})
    assert "a=1.5" in s and "b=1" in s


def test_plots(tmp_path):
    hist = {
        "loss": np.random.randn(20),
        "acc": np.random.rand(4, 20),
        "energy": np.random.randn(4, 6, 20),
    }
    out = plots.plot_history(hist, str(tmp_path))
    assert len(out) == 3
    for p in out:
        assert os.path.exists(p)
    rp = plots.plot_ridge(np.random.randn(4, 50), "intQ", str(tmp_path))
    assert rp is None or os.path.exists(rp)


def test_measure_improvement(tmp_path):
    he = {"dQint": np.full((4, 10), 0.3)}
    hh = {"dQint": np.full((4, 10), 0.1)}
    imp = plots.measure_improvement(he, hh, str(tmp_path))
    assert abs(imp - 3.0) < 1e-12
    assert os.path.exists(tmp_path / "model_improvement.txt")


def test_compile_cache_machine_keyed(tmp_path):
    """Cache dirs are host-fingerprinted: entries written on another
    machine live in a different subdir and can never be deserialized
    here (the r3 full-suite SIGSEGV read a foreign AOT entry)."""
    from l2hmc_tpu.utils import compile_cache as cc

    fp = cc.host_fingerprint()
    assert len(fp) == 12 and int(fp, 16) >= 0
    assert fp == cc.host_fingerprint()  # stable within a host
    d = cc.machine_cache_dir(str(tmp_path))
    assert os.path.isdir(d) and os.path.basename(d) == fp

def test_probe_entry_crash_deletes_corrupt_entry(tmp_path):
    """A cache entry whose deserialization CRASHES the probe child must be
    deleted (reader sees a clean miss) — the r4 full-suite SIGSEGV was the
    main process deserializing an entry a crashed writer left truncated."""
    import signal

    from l2hmc_tpu.utils import compile_cache as cc

    entry = str(tmp_path / "k-cache")
    for suffix in ("-cache", "-atime"):
        (tmp_path / f"k{suffix}").write_bytes(b"garbage")

    def segv_probe():
        os.kill(os.getpid(), signal.SIGSEGV)

    assert cc.probe_entry(entry, segv_probe, timeout_secs=30) == "deleted"
    assert not os.path.exists(entry)
    assert not os.path.exists(str(tmp_path / "k-atime"))
    assert not os.path.exists(entry + ".ok")

    # a probe that raises (e.g. zstd error on a truncated file) also
    # classifies as corrupt — exceptions and signals both delete
    (tmp_path / "k-cache").write_bytes(b"garbage")

    def raising_probe():
        raise ValueError("truncated")

    assert cc.probe_entry(entry, raising_probe, timeout_secs=30) == "deleted"
    assert not os.path.exists(entry)


def test_probe_entry_ok_writes_marker_once(tmp_path):
    """A successful probe writes the .ok marker so future reads of that
    entry skip the fork entirely; a miss probe leaves the entry alone."""
    from l2hmc_tpu.utils import compile_cache as cc

    entry = str(tmp_path / "k-cache")
    (tmp_path / "k-cache").write_bytes(b"valid-enough")

    assert cc.probe_entry(entry, lambda: True, timeout_secs=30) == "ok"
    assert os.path.exists(entry + ".ok")
    assert os.path.exists(entry)

    os.remove(entry + ".ok")
    assert cc.probe_entry(entry, lambda: False, timeout_secs=30) == "miss"
    assert os.path.exists(entry)          # miss never deletes
    assert not os.path.exists(entry + ".ok")
