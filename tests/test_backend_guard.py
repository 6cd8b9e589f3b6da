"""Fail-fast TPU backend guard (utils/backend_guard.py): the CLI must
never hang forever on a wedged tunnel session — observed as a training
run asleep on a futex for 20 min inside backend init."""
import os

import pytest

from l2hmc_tpu.utils import backend_guard as bg


def test_noop_on_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(bg, "_probe", lambda t: calls.append(t) or (True, ""))
    bg.ensure_backend()
    assert calls == []  # CPU runs never probe


def test_noop_on_skip_env(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("L2HMC_SKIP_BACKEND_PROBE", "1")
    calls = []
    monkeypatch.setattr(bg, "_probe", lambda t: calls.append(t) or (True, ""))
    bg.ensure_backend()
    assert calls == []


def test_retries_then_exits_with_message(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("L2HMC_SKIP_BACKEND_PROBE", raising=False)
    monkeypatch.setattr(bg.time, "sleep", lambda s: None)
    attempts = []
    monkeypatch.setattr(
        bg, "_probe", lambda t: attempts.append(t) or (False, "hung >90s"))
    with pytest.raises(SystemExit, match="TPU backend is unreachable"):
        bg.ensure_backend(backoffs=(0, 1, 2))
    assert len(attempts) == 3


def test_succeeds_after_transient_failure(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("L2HMC_SKIP_BACKEND_PROBE", raising=False)
    monkeypatch.setattr(bg.time, "sleep", lambda s: None)
    results = iter([(False, "UNAVAILABLE"), (True, "NDEV 1")])
    monkeypatch.setattr(bg, "_probe", lambda t: next(results))
    bg.ensure_backend(backoffs=(0, 1, 2))  # no raise


def test_probe_subprocess_real_cpu():
    """The probe subprocess itself works against a real (CPU) backend."""
    env_backup = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        ok, detail = bg._probe(120)
        assert ok, detail
        assert "NDEV" in detail
        # the probe must exercise compile+execute, not just device
        # listing: sum(i^2, i<64) = 85344 comes back through the jit
        assert "85344" in detail
    finally:
        if env_backup is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = env_backup
