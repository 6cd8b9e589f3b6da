"""Checkpoint save/restore via Orbax.

Counterpart of the reference's tar-file checkpoints
(reference trainers/pytorch/trainer.py:573-701: {era, epoch, xeps, veps,
gstep, model_state_dict, optimizer_state_dict} + restore-latest-by-mtime).
Here the whole sampler is one pytree — {params, masks, opt_state, step} —
saved atomically per step with restore-latest semantics.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(outdir: str) -> str:
    return os.path.join(os.path.abspath(outdir), "checkpoints")


def save_checkpoint(outdir: str, step: int, tree: Any) -> str:
    import orbax.checkpoint as ocp
    path = os.path.join(_ckpt_dir(outdir), f"ckpt_{int(step):08d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    return path


def latest_checkpoint(outdir: str) -> Optional[str]:
    d = _ckpt_dir(outdir)
    if not os.path.isdir(d):
        return None
    cands = sorted(
        p for p in os.listdir(d) if p.startswith("ckpt_")
    )
    return os.path.join(d, cands[-1]) if cands else None


def restore_checkpoint(outdir: str, example: Any) -> Optional[Any]:
    """Restore the latest checkpoint, shaped like `example` (the
    reference's restore-latest-by-mtime, trainer.py:616-701). Returns
    None when no checkpoint exists or its tree does not match (e.g. a
    pre-resume-format checkpoint)."""
    import orbax.checkpoint as ocp
    path = latest_checkpoint(outdir)
    if path is None:
        return None
    ckptr = ocp.PyTreeCheckpointer()
    try:
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=example))
    except Exception as e:  # incompatible layout -> start fresh
        import logging
        logging.getLogger(__name__).warning(
            f"checkpoint at {path} not restorable ({e}); starting fresh")
        return None


def make_resume_tree(ts: Any, x: Any, key: Any, era: int = 0,
                     beta: float = 0.0) -> dict:
    """Full resumable training state: {era, beta ladder position, lattice,
    PRNG key, TrainState} — the reference's per-era tar checkpoint
    {era, epoch, xeps, veps, gstep, model, optimizer}
    (trainers/pytorch/trainer.py:573-614) plus x/key, which it omits
    (its resumed runs restart the lattice and RNG)."""
    return {
        "ts": ts,
        "x": x,
        "key": key,
        "era": np.int64(era),
        "beta": np.float64(beta),
    }


def save_eps_txt(outdir: str, params) -> None:
    """Also dump xeps/veps as plain text/npy like the reference
    (dynamics/pytorch/dynamics.py:544-557)."""
    import jax.nn as jnn
    os.makedirs(outdir, exist_ok=True)
    for name in ("xeps", "veps"):
        arr = np.asarray(jnn.sigmoid(getattr(params, name)))
        np.save(os.path.join(outdir, f"{name}.npy"), arr)
        np.savetxt(os.path.join(outdir, f"{name}.txt"), arr)
