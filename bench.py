"""Headline benchmark (one JSON line).

Primary (default): 4D SU(3) leapfrog MD steps/sec/chip — the BASELINE.json
metric — measured on the HMC kernel (autodiff-free staple force +
Taylor expm drift, complex64; TPU hardware has no complex128) at the
BASELINE.json config #3 scale: 4^4 lattice, 8 chains, cold start.
vs_baseline is the ratio to the PyTorch-CPU reference-math baseline
measured by benchmarks/torch_su3_baseline.py on this machine
(14.85 MD steps/s, 8 chains, 4^4, complex128 — the reference's dtype;
north-star target is >=10x).

`python bench.py --u1` instead reports the 2D U(1) *training* throughput
against the reference's published A100 number (BASELINE.md: ~0.093 s/step
at 2048 chains, 16x16, nlf=4 merged => ~1.76e5 chain-lf-evals/s).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

TORCH_CPU_SU3_MD_STEPS_PER_SEC = 14.853   # benchmarks/torch_su3_baseline.py
A100_U1_EVALS_PER_SEC = 2048 * 8 / 0.093  # BASELINE.md ~1.76e5


def bench_su3():
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer

    nchains, L, nlf_half = 8, 4, 5
    nlf = 2 * nlf_half  # merge_directions
    cfg = get_config([
        f"dynamics.nchains={nchains}",
        f"dynamics.latvolume=[{L}, {L}, {L}, {L}]",
        f"dynamics.nleapfrog={nlf_half}",
        "precision=float32",
        "network.units=[8]",
        "steps.nera=1", "steps.nepoch=1", "steps.test=1",
    ], group="SU3")
    trainer = Trainer(cfg)
    ts, _ = trainer.init_state(jax.random.PRNGKey(0))
    # cold start: identity links -> immediate high acceptance
    shape = (nchains, 4, L, L, L, L, 3, 3)
    x = jnp.broadcast_to(jnp.eye(3, dtype=jnp.complex64), shape)
    key = jax.random.PRNGKey(1)
    for _ in range(20):  # thermalize + compile
        key, k = jax.random.split(key)
        x, m = trainer.hmc_step(x, 6.0, k, 0.05)
    jax.block_until_ready(x)
    nsteps = 100
    t0 = time.perf_counter()
    for _ in range(nsteps):
        key, k = jax.random.split(key)
        x, m = trainer.hmc_step(x, 6.0, k, 0.05)
    jax.block_until_ready(x)
    elapsed = time.perf_counter() - t0
    rate = nsteps * nlf / elapsed
    acc = float(jnp.mean(m["acc"]))
    return {
        "metric": "su3_4x4x4x4_leapfrog_md_steps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": (f"leapfrog MD steps/s (8 chains, 4^4, complex64, "
                 f"acc={acc:.2f})"),
        "vs_baseline": round(rate / TORCH_CPU_SU3_MD_STEPS_PER_SEC, 1),
    }


def bench_u1():
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
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, x, m = trainer.train_step(ts, x, 4.0, k)
    jax.block_until_ready(x)
    nsteps = 50
    t0 = time.perf_counter()
    for _ in range(nsteps):
        key, k = jax.random.split(key)
        ts, x, m = trainer.train_step(ts, x, 4.0, k)
    jax.block_until_ready(x)
    elapsed = time.perf_counter() - t0
    rate = nchains * (nlf * 2) * nsteps / elapsed
    return {
        "metric": "u1_16x16_train_chain_lf_evals_per_sec",
        "value": round(rate, 1),
        "unit": "chain*leapfrog-evals/s (2048 chains, nlf=4 merged, fp32)",
        "vs_baseline": round(rate / A100_U1_EVALS_PER_SEC, 3),
    }


def main():
    if "--u1" in sys.argv:
        result = bench_u1()
    else:
        result = bench_su3()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
