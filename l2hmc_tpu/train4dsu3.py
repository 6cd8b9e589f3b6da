"""Standalone 4D SU(3) driver: HMC -> eval -> train with unitarity checks.

Counterpart of the reference's `train4dSU3.py`
(reference src/l2hmc/train4dSU3.py:196-303): a scripted sequence of
(1) HMC steps, (2) trained-sampler eval steps, (3) train steps at fixed
beta, with `checkSU` unitarity monitors after each phase.

Run:  python -m l2hmc_tpu.train4dsu3 [key=value overrides]

On TPU the SU(3) path runs complex64 (the chip has no C128); pass
precision=float64 on CPU for parity-grade numerics.
"""
from __future__ import annotations

import logging
import sys

import numpy as np

log = logging.getLogger(__name__)


_CHECK_SU_JIT = None


def check_su(tag: str, x) -> tuple[float, float]:
    """Jitted checkSU — eager complex ops poison the axon TPU session."""
    global _CHECK_SU_JIT
    import jax
    import jax.numpy as jnp
    from l2hmc_tpu.ops import su3 as g
    if _CHECK_SU_JIT is None:
        def _impl(x):
            a, b = g.checkSU(x.reshape(x.shape[0], -1, 3, 3))
            return jnp.max(a), jnp.max(b)
        _CHECK_SU_JIT = jax.jit(_impl)
    a, b = _CHECK_SU_JIT(x)
    amax, bmax = float(a), float(b)
    log.info(f"checkSU[{tag}]: mean={amax:.3e} max={bmax:.3e}")
    return amax, bmax


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    argv = list(argv if argv is not None else sys.argv[1:])
    # fail fast when the TPU tunnel is wedged (no-op on CPU runs)
    from l2hmc_tpu.utils.backend_guard import ensure_backend
    ensure_backend()

    overrides = [
        "dynamics.nchains=8",
        "dynamics.latvolume=[4, 4, 4, 4]",
        "dynamics.nleapfrog=2",
        "dynamics.eps=0.01",
        "steps.nera=1", "steps.nepoch=50", "steps.test=10", "steps.log=1",
        "annealing_schedule.beta_init=6.0",
        "annealing_schedule.beta_final=6.0",
    ] + argv

    import jax
    if jax.default_backend() in ("cpu",):
        jax.config.update("jax_enable_x64", True)
    else:
        overrides.append("precision=float32")   # TPU: complex64

    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer

    cfg = get_config(overrides, group="SU3")
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    key, k = jax.random.split(key)
    ts, x = trainer.init_state(k)
    beta = cfg.annealing_schedule.beta_init

    # phase 1: HMC (train4dSU3.py: 10 hmc steps, eps=0.1, nlf=1)
    for step in range(10):
        key, k = jax.random.split(key)
        x, m = trainer.hmc_step(x, beta, k, 0.1)
        log.info(f"hmc step {step}: acc={float(np.mean(m['acc'])):.3f} "
                 f"plaqs={float(np.mean(m['plaqs'])):.4f}")
    check_su("post-hmc", x)

    # phase 2: eval with the (untrained) sampler
    for step in range(10):
        key, k = jax.random.split(key)
        x, m = trainer.eval_step(ts, x, beta, k)
        log.info(f"eval step {step}: acc={float(np.mean(m['acc'])):.3f}")
    check_su("post-eval", x)

    # phase 3: training
    for step in range(cfg.steps.nepoch):
        key, k = jax.random.split(key)
        ts, x, m = trainer.train_step(ts, x, beta, k)
        if step % 10 == 0:
            log.info(f"train step {step}: loss={float(m['loss']):.4f} "
                     f"acc={float(np.mean(m['acc'])):.3f}")
    _, bmax = check_su("post-train", x)
    assert np.isfinite(bmax)
    log.info("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
