"""Autocorrelation/ESS estimator tests against analytic AR(1) values."""
import numpy as np

from l2hmc_tpu.utils import autocorr as ac


def ar1(n, rho, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty(n)
    x[0] = rng.standard_normal()
    for i in range(1, n):
        x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * rng.standard_normal()
    return x


def test_iid_tau_is_half():
    x = np.random.default_rng(1).standard_normal(20000)
    tau = ac.integrated_autocorr_time(x)
    assert abs(tau - 0.5) < 0.15


def test_ar1_tau_matches_analytic():
    """AR(1): tau_int = (1+rho)/(2(1-rho))."""
    rho = 0.8
    x = ar1(200000, rho, seed=2)
    tau = ac.integrated_autocorr_time(x)
    expected = (1 + rho) / (2 * (1 - rho))  # = 4.5
    assert abs(tau - expected) / expected < 0.15


def test_ess_scales_inverse_tau():
    x_iid = np.random.default_rng(3).standard_normal(10000)
    x_corr = ar1(10000, 0.9, seed=4)
    assert ac.effective_sample_size(x_iid) > 5 * ac.effective_sample_size(x_corr)


def test_chain_stats_shape():
    arr = np.random.default_rng(5).standard_normal((4, 5000))
    s = ac.chain_stats(arr)
    assert s["nchains"] == 4
    assert 0 < s["ess_per_step"] <= 1.0
    assert s["tau_int"] > 0.3


def test_tunneling_rate():
    q = np.array([[0, 0, 1, 1, 2], [1, 1, 1, 0, 0]], dtype=float)
    # per-chain diffs: [0,1,0,1] and [0,0,1,0] -> mean = 3/8
    assert abs(ac.tunneling_rate(q) - 3 / 8) < 1e-12
