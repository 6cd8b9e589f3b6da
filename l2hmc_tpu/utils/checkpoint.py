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


def _complex_to_host(tree: Any) -> Any:
    """Device->host transfer for complex leaves BEFORE orbax sees them.

    The axon TPU runtime cannot DMA complex arrays to the host: orbax's
    save path (`np.asarray(device_array)` in replica_slices.py) raises
    `UNIMPLEMENTED: TPU backend error` on the complex64 SU(3) lattice,
    killing the whole run at the first era checkpoint. Real scalars and
    float tensors transfer fine, so the fix is local: split each complex
    leaf into re/im float transfers (two on-device projections) and
    recombine on host into the identical numpy complex array. Restore is
    untouched — it reads from disk, no device transfer involved.

    Only fully-addressable arrays are split: gathering a leaf that spans
    non-addressable devices (multi-host mesh-sharded lattice) would raise,
    and even on one host it would destroy the sharding orbax's native
    handler preserves — those leaves pass straight through to orbax,
    whose TensorStore path does per-shard device->host transfers itself
    (the axon complex-DMA bug is a single-chip-tunnel quirk; mesh-sharded
    runs are CPU/pod runs where complex DMA works)."""
    import jax.numpy as jnp

    def leaf(a):
        if (isinstance(a, jax.Array) and jnp.iscomplexobj(a)
                and a.is_fully_addressable
                and len(a.sharding.device_set) == 1):
            re = np.asarray(jnp.real(a))
            im = np.asarray(jnp.imag(a))
            cplx = np.complex64 if re.dtype == np.float32 else np.complex128
            return (re + 1j * im).astype(cplx)
        return a

    return jax.tree_util.tree_map(leaf, tree)


def save_checkpoint(outdir: str, step: int, tree: Any) -> str:
    import orbax.checkpoint as ocp
    path = os.path.join(_ckpt_dir(outdir), f"ckpt_{int(step):08d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _complex_to_host(tree), force=True)
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
