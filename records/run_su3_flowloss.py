"""SU(3) 8^4 beta=5.7 training run with the Wilson-FLOWED charge loss.

The committed record records/su3_8x8_b57_quality.md established (a) the
first regime where topology actually moves (flowed sector <Q^2> ~ 1.35,
~250 integer tunnelings/chain/2000 draws) and (b) the diagnosis that the
reference's unflowed sinQ charge loss
(/root/reference/src/l2hmc/loss/pytorch/loss.py:72-92) is ~1000x weaker
at 4D SU(3) than at its design point (2D U(1)): dQsin ~ 2.6e-4/draw is
UV noise while the flowed sector charge moves 0.126 units/draw
underneath it. This driver runs the designed fix — the charge loss on
the DIFFERENTIABLY Wilson-flowed clover charge (loss.charge_flow_nsteps,
models/loss.py:_flowed_charge_loss; per-step remat so 12 flow steps fit
one chip's HBM at 8^4) — under the otherwise-identical protocol, and
compares the trained sampler against the committed matched-cost HMC
baseline (identical volume/beta/eps/lf-evals/draw count, measured on the
same TPU: records/su3_8x8_b57_quality_summary.json "hmc_stats").

Usage (real TPU, ~30 min full protocol):
    python records/run_su3_flowloss.py [outdir] [nera] [nepoch] [warmup] [test]
e.g. the tightened ~15-min-device-time variant used when the tunnel's
remote-compile service ate half the session:
    python records/run_su3_flowloss.py records/_su3_flowloss_run 2 150 300 1000
"""
import json
import logging
import sys

import numpy as np

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(levelname)s %(name)s: %(message)s")


def main(outdir="records/_su3_flowloss_run", nera="4", nepoch="150",
         warmup="1000", test="2000"):
    from l2hmc_tpu.experiment import build_experiment
    from l2hmc_tpu.utils.backend_guard import ensure_backend
    ensure_backend()  # fail fast on a wedged tunnel/compile service

    overrides = [
        # identical to the committed 8^4 record's command
        # (records/su3_8x8_b57_quality.md) except the loss
        "dynamics.latvolume=[8, 8, 8, 8]", "dynamics.nchains=8",
        "nchains=8", "dynamics.nleapfrog=4", "dynamics.eps=0.02",
        "dynamics.eps_hmc=0.02", "dynamics.cold_start=true",
        "network.units=[32, 32]", "network.zero_init_heads=true",
        "network.use_batch_norm=false", "network.dropout_prob=0.0",
        "learning_rate.lr_init=1e-4", "learning_rate.clip_norm=1.0",
        "annealing_schedule.beta_init=5.2",
        "annealing_schedule.beta_final=5.7",
        f"steps.nera={int(nera)}", f"steps.nepoch={int(nepoch)}",
        f"steps.test={int(test)}", f"steps.warmup={int(warmup)}",
        "flow_nsteps=12", "flow_eps=0.1",
        "precision=float32", "save=false",
        # THE experiment: charge loss on the flowed clover charge
        "loss.use_mixed_loss=true", "loss.charge_weight=0.01",
        "loss.charge_flow_nsteps=12", "loss.charge_flow_eps=0.1",
        f"outdir={outdir}",
    ]
    ex = build_experiment(overrides, group="SU3")

    ex.train()
    # durable train-phase artifact: if the session dies mid-eval, the
    # training evidence (loss/grad_norm/acc series) survives
    ht = ex.trainer.histories["train"].get_dataset()
    partial = {k: np.asarray(ht[k]).ravel().tolist()
               for k in ("loss", "grad_norm", "grad_nonfinite", "acc",
                         "plaqs") if k in ht}
    with open("records/_su3_flowloss_train_partial.json", "w") as f:
        json.dump(partial, f, default=float)

    ex.evaluate("eval")
    eval_stats = ex.sampler_stats("eval")

    # matched-cost HMC baseline: the committed record's, measured on the
    # same TPU under the identical protocol (8 chains x 2000 draws,
    # eps=0.02, 8 lf-evals/draw, 12x0.1 flow on every draw)
    with open("records/su3_8x8_b57_quality_summary.json") as f:
        baseline = json.load(f)
    hmc_stats = baseline["hmc_stats"]
    prev_eval = baseline["eval_stats"]

    he = ex.trainer.histories["eval"].get_dataset()
    improvement = float(np.mean(he["dQint"])) / max(
        hmc_stats["dQint"], 1e-16)

    out = {
        "improvement_vs_committed_hmc": improvement,
        "dQint_flow_ratio": eval_stats.get("dQint_flow", float("nan"))
        / max(hmc_stats["dQint_flow"], 1e-16),
        "flowQ_tau_ratio_hmc_over_trained":
            hmc_stats["flowQ_tau_int"]
            / max(eval_stats.get("flowQ_tau_int", float("nan")), 1e-16),
        "train": ex.trainer.timers["train"].get_eval_rate(),
        "eval": ex.trainer.timers["eval"].get_eval_rate(),
        "eval_stats": eval_stats,
        "hmc_stats_committed_baseline": hmc_stats,
        "unflowed_loss_eval_stats_committed": prev_eval,
        "loss": {"charge_weight": 0.01, "charge_flow_nsteps": 12,
                 "charge_flow_eps": 0.1, "use_mixed_loss": True},
        "protocol": {"nera": int(nera), "nepoch": int(nepoch),
                     "warmup": int(warmup), "eval_steps": int(test)},
    }
    path = "records/su3_8x8_b57_flowloss_summary.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out, indent=1, default=float))
    print("wrote", path)


if __name__ == "__main__":
    main(*sys.argv[1:])
