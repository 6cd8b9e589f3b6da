"""HaarSUN distribution + trackers tests."""
import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.distributions import HaarSUN


def test_rsample_is_su3():
    d = HaarSUN(3, dtype=jnp.complex128)
    x = d.rsample(jax.random.PRNGKey(0), (64,))
    xn = np.asarray(x)
    xhx = np.conj(np.swapaxes(xn, -2, -1)) @ xn
    np.testing.assert_allclose(xhx, np.broadcast_to(np.eye(3), xhx.shape),
                               atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(xn), 1.0, atol=1e-10)


def test_rsample_haar_invariance():
    """Haar measure: E[|tr U|^2] = 1 for SU(N) (Schur orthogonality)."""
    d = HaarSUN(3, dtype=jnp.complex128)
    x = d.rsample(jax.random.PRNGKey(1), (20000,))
    tr = np.trace(np.asarray(x), axis1=-2, axis2=-1)
    m = np.mean(np.abs(tr) ** 2)
    assert abs(m - 1.0) < 0.05
    # and E[tr U] = 0
    assert abs(np.mean(tr)) < 0.05


def test_log_prob_constant():
    d = HaarSUN(3, dtype=jnp.complex128)
    x = d.rsample(jax.random.PRNGKey(2), (5,))
    lp = d.log_prob(x)
    assert lp.shape == (5,)
    assert np.allclose(np.asarray(lp), np.asarray(lp)[0])
    # vol(SU(3)) = 2 pi^5 / (1! 2!) = pi^5 -> log_prob = -5 log pi
    np.testing.assert_allclose(float(lp[0]), -5.0 * np.log(np.pi),
                               rtol=1e-12)


def test_trackers_noop(tmp_path):
    from l2hmc_tpu.utils.trackers import Trackers
    t = Trackers(str(tmp_path), use_tb=True, use_wandb=False, use_aim=False)
    t.update_summaries({"loss": np.float64(1.0), "acc": np.ones(4)}, 0)
    t.close()
