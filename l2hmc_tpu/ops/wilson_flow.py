"""Wilson (gradient) flow for SU(3) gauge fields — TPU-native.

Integrates the gradient flow  dV/dt = Z(V) V  with Z(V) the negative
Wilson-action gradient in the Lie algebra, using Luscher's 3-stage
Runge-Kutta (arXiv:1006.4518, appendix C):

    W0 = V_t
    W1 = exp(1/4 Z0) W0
    W2 = exp(8/9 Z1 - 17/36 Z0) W1
    V_{t+eps} = exp(3/4 Z2 - 8/9 Z1 + 17/36 Z0) W2,   Zi = eps * Z(Wi)

Normalization: the flow generator is beta-independent. With the comp
engine's convention (su3_comp.force_and_traces returns F = dS/dU
projected to the traceless anti-hermitian algebra, for
S = -(beta/3) sum_p Re tr P), the canonical flow S_w = 2 sum_p
Re tr(1 - P/3) equals S at beta=2 up to a constant, so Z = -F(beta=2).
Gradient-flow invariant: dS_w/dt = -|F|^2 <= 0 (asserted in tests).

Flowed observables (the reason to flow at all): the smoothed plaquette
and the energy density E(t) = (2/V) sum_p Re tr(1 - P/3) whose
dimensionless combination t^2 <E(t)> sets the t0 reference scale
(t^2 E |_{t0} = 0.3). BASELINE config #5 names "Wilson-flowed
observables" as the 16^4 eval metric; the reference repo has no flow
implementation at all — this is a capability the rebuild adds.

Everything is expressed over the stacked-component engine
(ops/su3_comp.py) with an injectable `roll`, so the SAME code runs
single-device (comp.make_roll) and lattice-sharded (the halo-exchange
roll from parallel/sharded_train.make_sharded_comp_roll): flow of a
16^4 field decomposed over a pod needs no new communication pattern —
every roll is a +-1 slab exchange the halo already provides.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.ops import su3_comp as comp

__all__ = ["flow_step", "flow", "flow_observables", "energy_density",
           "flow_complex_lattice", "FlowResult"]

#: RK3 coefficients (Luscher 1006.4518 App. C)
_C0 = 0.25
_C1A, _C1B = 8.0 / 9.0, -17.0 / 36.0
_C2A, _C2B, _C2C = 0.75, -8.0 / 9.0, 17.0 / 36.0


class FlowResult(NamedTuple):
    """Flowed field + per-step observable series.

    t: (nsteps,) flow times; tr: (nsteps, nb) per-chain plaquette
    Re-trace sums measured at the start of each step (LOCAL sums when
    flowing a shard — psum over 'lattice' before flow_observables)."""
    x: comp.F3
    t: jax.Array
    tr: jax.Array


def _z_and_traces(x: comp.F3, lat, nb: int, roll):
    """(flow generator Z = -F(beta=2), per-chain plaquette Re-trace sum).

    The staple force and the trace sum share their plaquette products
    (su3_comp.force_and_traces), so each RK stage's observable is free.
    """
    beta2 = jnp.asarray(2.0, x.re.dtype)
    f, tr = comp.force_and_traces(x, beta2, lat, nb, roll)
    return comp.scale(f, -1.0), tr


def flow_step(x: comp.F3, eps, lat, nb: int, roll=None):
    """One RK3 Wilson-flow step; returns (x', plaquette-trace sum at x).

    The exponentials reuse the HMC drift budget (order-8 scaled-squared
    Taylor expm — su3_comp.expm); a final reunit keeps the
    integration drift-free over thousands of steps (same policy as the
    leapfrog x-update, models/dynamics.py _update_x_su3).
    """
    if roll is None:
        roll = comp.make_roll(lat, nb)
    eps = jnp.asarray(eps, x.re.dtype)

    z0, tr0 = _z_and_traces(x, lat, nb, roll)
    z0 = comp.scale(z0, eps)
    w1 = comp.mm(comp.expm(comp.scale(z0, _C0), order=8, s=2), x)

    z1, _ = _z_and_traces(w1, lat, nb, roll)
    z1 = comp.scale(z1, eps)
    c1 = comp.add(comp.scale(z1, _C1A), comp.scale(z0, _C1B))
    w2 = comp.mm(comp.expm(c1, order=8, s=2), w1)

    z2, _ = _z_and_traces(w2, lat, nb, roll)
    z2 = comp.scale(z2, eps)
    c2 = comp.add(comp.add(comp.scale(z2, _C2A), comp.scale(z1, _C2B)),
                  comp.scale(z0, _C2C))
    out = comp.mm(comp.expm(c2, order=8, s=2), w2)
    # reunit, not projectSU: the flowed-charge loss differentiates
    # through every flow step, and projectSU's backward is NaN at the
    # near-unitary inputs this site always sees (su3_comp.reunit)
    return comp.reunit(out), tr0


def energy_density(tr_sum: jax.Array, volume: int) -> jax.Array:
    """E = (2/V) sum_p Re tr(1 - P/3) from the plaquette-trace sum
    (per chain). 6V plaquettes at 4D; E -> 0 as the field smooths."""
    return (2.0 / volume) * (6.0 * volume * 3.0 - tr_sum) / 3.0


def flow_observables(t: jax.Array, tr: jax.Array, volume: int) -> dict:
    """{'t', 'plaq', 't2E'} from GLOBAL trace sums (psum'd if sharded)."""
    plaq = tr / (6.0 * 3.0 * volume)
    t2e = (t[:, None] ** 2) * energy_density(tr, volume)
    return {"t": t, "plaq": plaq, "t2E": t2e}


def flow(x: comp.F3, eps: float, nsteps: int, lat, nb: int,
         roll=None) -> FlowResult:
    """Integrate nsteps RK3 flow steps as one lax.scan; per-step
    observables (smoothed plaquette, t^2 E) ride along.

    NOTE (sharded use): tr sums are LOCAL to the shard — psum over the
    'lattice' axis before interpreting plaq/t2E (ShardedLatticeSU3.flow
    does this); single-device values are global already.
    """
    if roll is None:
        roll = comp.make_roll(lat, nb)
    eps_a = jnp.asarray(eps, x.re.dtype)

    # remat each step: differentiating the scan then stores ONLY the
    # per-step carry (one lattice, ~9 MB at 8 chains x 8^4) and
    # recomputes the step's internals (3 force evals + 3 expm's, ~80
    # residual arrays) in the backward. Without this the flowed-charge
    # loss OOMs a 16 GB chip at 8^4 x 12 steps (measured: 17.24 G of
    # 15.75 G HBM, ~950 stacked 18 MB residual buffers).
    @jax.checkpoint
    def body(carry, i):
        xc = carry
        x2, tr = flow_step(xc, eps_a, lat, nb, roll)
        return x2, tr

    x_out, trs = jax.lax.scan(body, x, jnp.arange(nsteps))
    # trs[i] is measured at the START of step i => time i*eps
    t = jnp.arange(nsteps, dtype=x.re.dtype) * eps_a
    return FlowResult(x_out, t, trs)


def flow_complex_lattice(x: jax.Array, eps: float, nsteps: int,
                         lat=None) -> tuple[jax.Array, dict]:
    """User-surface wrapper on (nb, 4, *lat, 3, 3) complex fields:
    returns (flowed field, {'t', 'plaq', 't2E'} series). jit-compatible."""
    if lat is None:
        lat = tuple(x.shape[2:-2])
    nb = x.shape[0]
    xf = comp.from_complex_lattice(x)
    res = flow(xf, eps, nsteps, lat, nb)
    out = comp.to_complex_lattice(res.x, lat, nb, x.dtype)
    return out, flow_observables(res.t, res.tr, int(np.prod(lat)))
