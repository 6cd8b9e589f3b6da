"""Headline benchmark (one JSON line).

Methodology note: on the axon TPU backend `jax.block_until_ready` does NOT
block (it returns before execution finishes), so naive timing measures
dispatch only. This benchmark therefore (a) folds K steps into one jitted
`lax.scan` so per-step cost is amortized on-device, and (b) synchronizes
with an actual device->host scalar readback (l2hmc_tpu.utils.sync), and
(c) subtracts the measured readback round trip.

Primary metric: 4D SU(3) leapfrog MD steps/sec/chip (BASELINE.json) on
the HMC kernel (staple force + Taylor expm drift, complex64 — TPU has no
complex128) at 4^4 x 8 chains, cold start. vs_baseline = ratio to the
PyTorch-CPU reference-math baseline measured on this machine by
benchmarks/torch_su3_baseline.py (14.85 MD steps/s at the same config in
the reference's complex128; north-star target >= 10x).

`python bench.py --u1` reports 2D U(1) *training* throughput against the
reference's published A100 number (BASELINE.md: ~0.093 s/step at 2048
chains, 16x16, nlf=4 merged => ~1.76e5 chain-lf-evals/s).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

TORCH_CPU_SU3_MD_STEPS_PER_SEC = 14.853   # benchmarks/torch_su3_baseline.py
A100_U1_EVALS_PER_SEC = 2048 * 8 / 0.093  # BASELINE.md ~1.76e5


def _roundtrip():
    from l2hmc_tpu.utils.sync import sync
    z = jax.jit(lambda: jnp.zeros((2, 2)))()
    sync(z)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(z)
    return (time.perf_counter() - t0) / 5


def bench_su3():
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer
    from l2hmc_tpu.utils.sync import sync

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
    shape = (nchains, 4, L, L, L, L, 3, 3)
    x = jnp.broadcast_to(jnp.eye(3, dtype=jnp.complex64), shape)
    beta = jnp.float32(6.0)
    eps = jnp.float32(0.01)
    K = 50

    @jax.jit
    def multi(x, key):
        def body(carry, k):
            x, _ = carry
            x2, m = trainer._hmc_step_impl(x, beta, k, eps)
            return (x2, jnp.mean(m["acc"])), None
        keys = jax.random.split(key, K)
        (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), keys)
        return x, acc

    x, acc = multi(x, jax.random.PRNGKey(1))   # thermalize + compile
    sync(x)
    rt = _roundtrip()
    t0 = time.perf_counter()
    x, acc = multi(x, jax.random.PRNGKey(2))
    sync(x)
    elapsed = time.perf_counter() - t0 - rt
    rate = K * nlf / elapsed
    return {
        "metric": "su3_4x4x4x4_leapfrog_md_steps_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": (f"leapfrog MD steps/s (8 chains, 4^4, complex64, "
                 f"acc={float(acc):.2f})"),
        "vs_baseline": round(rate / TORCH_CPU_SU3_MD_STEPS_PER_SEC, 1),
    }


def bench_u1():
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer
    from l2hmc_tpu.utils.sync import sync

    nchains, nlf = 2048, 4
    cfg = get_config([
        f"dynamics.nchains={nchains}",
        "dynamics.latvolume=[16, 16]",
        f"dynamics.nleapfrog={nlf}",
        "dynamics.eps=0.05",
        "precision=float32",
    ])
    trainer = Trainer(cfg)
    ts, x = trainer.init_state(jax.random.PRNGKey(0))
    beta = jnp.float32(4.0)
    K = 50

    @jax.jit
    def multi(c, key):
        def body(c, k):
            ts, x = c
            ts2, x2, m = trainer._train_step_impl(ts, x, beta, k)
            return (ts2, x2), None
        keys = jax.random.split(key, K)
        return jax.lax.scan(body, c, keys)[0]

    c = multi((ts, x), jax.random.PRNGKey(1))
    sync(c[1])
    rt = _roundtrip()
    t0 = time.perf_counter()
    c = multi(c, jax.random.PRNGKey(2))
    sync(c[1])
    elapsed = time.perf_counter() - t0 - rt
    rate = nchains * (nlf * 2) * K / elapsed
    return {
        "metric": "u1_16x16_train_chain_lf_evals_per_sec",
        "value": round(rate, 1),
        "unit": "chain*leapfrog-evals/s (2048 chains, nlf=4 merged, fp32)",
        "vs_baseline": round(rate / A100_U1_EVALS_PER_SEC, 3),
    }


def main():
    result = bench_u1() if "--u1" in sys.argv else bench_su3()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
