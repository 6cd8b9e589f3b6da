"""U(1) 16x16 flagship quality run with BOTH HMC-baseline protocols.

VERDICT r4 #4: the committed flagship record's HMC denominator used
dynamic_step_size=True (eps tuned to ~0.65 acceptance) while the
pipeline default — and the reference protocol
(/root/reference/src/l2hmc/configs.py:485-487, eps_hmc = 1/nleapfrog) —
is a FIXED matched-cost step size. Both ratios belong in the committed
summary. This driver runs the BASELINE config #1 experiment once
(train -> eval -> reference-protocol HMC), then re-evaluates HMC with
the tuned baseline into a fresh history, and writes a single summary
carrying both improvement rows.

Usage (real TPU, ~10 min):
    python records/run_u1_flagship.py [outdir]
"""
import json
import os
import sys

import jax
import numpy as np


def main(outdir="records/_u1_flagship_run"):
    from l2hmc_tpu.experiment import build_experiment
    from l2hmc_tpu.utils.backend_guard import ensure_backend
    from l2hmc_tpu.utils.history import History
    ensure_backend()  # fail fast on a wedged tunnel/compile service

    overrides = [
        # the published-report configuration (BASELINE config #1;
        # /root/reference/reports/l2hmc-2dU1/README.md:953-1186)
        "dynamics.nchains=2048", "dynamics.latvolume=[16, 16]",
        "dynamics.nleapfrog=4", "dynamics.eps=0.05",
        "dynamics.merge_directions=true",
        "steps.nera=1", "steps.nepoch=5000", "steps.test=2000",
        "annealing_schedule.beta_init=4.0",
        "annealing_schedule.beta_final=4.0",
        "nchains=512", "precision=float32", "save=false",
        f"outdir={outdir}",
    ]
    ex = build_experiment(overrides, group="U1")

    # reference protocol end-to-end: eps_hmc = 1/nleapfrog, fixed
    summary = ex.run()
    ref_protocol = {
        "improvement": summary["improvement"],
        "hmc_stats": summary["hmc_stats"],
        "protocol": "reference: fixed eps_hmc = 1/nleapfrog "
                    "(reference configs.py:485-487)",
    }

    # tuned baseline: the same trained sampler against HMC whose step
    # size self-tunes to ~0.65 acceptance (the stronger denominator the
    # r4 record used)
    ex.trainer.histories["hmc"] = History()
    ex.trainer.timers["hmc"].data = []
    ex.evaluate("hmc", dynamic_step_size=True)
    tuned_imp = ex.measure_improvement()
    tuned = {
        "improvement": tuned_imp,
        "hmc_stats": ex.sampler_stats("hmc"),
        "protocol": "tuned: dynamic_step_size=True (eps adapted to ~0.65 "
                    "acceptance)",
    }

    # literal reference protocol: the reference computes
    # eps_hmc = 1/nleapfrog from the CONFIG nleapfrog (=4 -> eps 0.25,
    # reference configs.py:484-486 "trajectory length of 1") but then
    # doubles the HMC step count for merge_directions (reference
    # trainers/pytorch/trainer.py:1018-1022), so its published HMC rows
    # integrate trajectory length 2.0 — which is why they sit at
    # acc 0.04-0.06 (reports/l2hmc-2dU1/README.md:1183-1186). Our
    # eps_hmc default folds the doubling in (1/(2*nlf), trajectory
    # length 1.0) and is therefore a STRICTLY STRONGER baseline than
    # the reference ever compared against; this row measures the
    # apples-to-apples ratio under the reference's own protocol.
    nlf_cfg = int(ex.cfg.dynamics.nleapfrog)
    ex.trainer.histories["hmc"] = History()
    ex.trainer.timers["hmc"].data = []
    ts, x = ex.setup()
    ex.key, k = jax.random.split(ex.key)
    ex.trainer.evaluate(ts, k, job_type="hmc", x=x,
                        eps=1.0 / nlf_cfg, dynamic_step_size=False)
    literal_imp = ex.measure_improvement()
    literal = {
        "improvement": literal_imp,
        "hmc_stats": ex.sampler_stats("hmc"),
        "protocol": "reference-literal: eps_hmc = 1/nleapfrog_config "
                    f"= {1.0 / nlf_cfg} over 2*nleapfrog steps "
                    "(trajectory length 2.0 — the protocol behind the "
                    "reference's published acc~0.05 HMC rows)",
    }

    out = {
        "eval_stats": summary["eval_stats"],
        "train": summary["train"],
        "eval": summary["eval"],
        "hmc_reference_protocol": ref_protocol,
        "hmc_tuned_baseline": tuned,
        "hmc_reference_literal": literal,
        "config": {
            "nchains_train": 2048, "nchains_eval": 512,
            "latvolume": [16, 16], "nleapfrog": 4, "eps": 0.05,
            "beta": 4.0, "train_steps": 5000, "eval_steps": 2000,
        },
    }
    path = "records/u1_16x16_quality_summary.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps({k: out[k] for k in
                      ("hmc_reference_protocol", "hmc_tuned_baseline",
                       "hmc_reference_literal")},
                     indent=1, default=float))
    print("wrote", path)


if __name__ == "__main__":
    main(*sys.argv[1:])
