"""Headline benchmark: 2D U(1) L2HMC training throughput on one chip.

Matches the reference's only published perf record (BASELINE.md):
2D U(1), 16x16 lattice, 2048 chains, nleapfrog=4 with merge_directions
(8 leapfrog evals per step), fp32 — reference: ~0.093 s/train-step on an
A100-80GB => ~1.8e5 chain-leapfrog-evals/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

A100_BASELINE_EVALS_PER_SEC = 2048 * 8 / 0.093  # ~1.76e5


def main():
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer

    nchains, nlf = 2048, 4
    cfg = get_config([
        f"dynamics.nchains={nchains}",
        "dynamics.latvolume=[16, 16]",
        f"dynamics.nleapfrog={nlf}",
        "dynamics.eps=0.05",
        "annealing_schedule.beta_init=4.0",
        "annealing_schedule.beta_final=4.0",
        "precision=float32",
    ])
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    beta = 4.0

    # compile + warm
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, x, m = trainer.train_step(ts, x, beta, k)
    jax.block_until_ready(x)

    nsteps = 50
    t0 = time.perf_counter()
    for _ in range(nsteps):
        key, k = jax.random.split(key)
        ts, x, m = trainer.train_step(ts, x, beta, k)
    jax.block_until_ready(x)
    elapsed = time.perf_counter() - t0

    evals_per_step = nlf * 2  # merge_directions
    rate = nchains * evals_per_step * nsteps / elapsed
    result = {
        "metric": "u1_16x16_train_chain_lf_evals_per_sec",
        "value": round(rate, 1),
        "unit": "chain*leapfrog-evals/s (2048 chains, nlf=4 merged, fp32)",
        "vs_baseline": round(rate / A100_BASELINE_EVALS_PER_SEC, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
