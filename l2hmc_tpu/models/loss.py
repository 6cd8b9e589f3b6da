"""L2HMC training loss.

Functional counterpart of the reference's `LatticeLoss`
(reference src/l2hmc/loss/pytorch/loss.py:21-210). The loss rewards
proposals that move observables, weighted by the acceptance probability:

  charge term (:72-92):  qloss = E[acc (sinQ(x2) - sinQ(x1))^2]
  plaq term   (:57-70):  ploss = E[acc (P(x2) - P(x1))^2]
  rmse term  (:128-148):  rloss = E[acc mean|x2 - x1|^2]

Each term enters either as -term/weight or, with use_mixed_loss, as
mixed(term + 1e-4, w) = w/term - term/w (:53-55) — both are *minimized*,
i.e. the optimizer maximizes the expected observable change.

NOTE: the reference's `_plaq_loss` sums U(1) Wilson loops over axes 2+
of a (nb, nt, nx) array, producing a (nb, nt) tensor that cannot broadcast
against acc (nb,) — the U(1)+plaq_weight path crashes there (it is dead
code because plaq_weight defaults to 0). Here the plaquette sum runs over
all non-chain axes for U(1) and per-plane for SU(3), so the term is usable
for both groups.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from l2hmc_tpu.configs import LossConfig
from l2hmc_tpu.ops.lattice_u1 import LatticeU1
from l2hmc_tpu.ops.lattice_su3 import LatticeSU3

Lattice = Union[LatticeU1, LatticeSU3]


def mixed_loss(loss: jax.Array, weight: float) -> jax.Array:
    return weight / loss - loss / weight


def _finite_or_zero(term: jax.Array) -> jax.Array:
    """Zero out per-chain loss entries from blown-up proposals.

    A chain whose leapfrog diverged has NaN in x_prop; the NaN-robust MH
    (utils/mh.py) already gives it acceptance 0, but `0 * (q2-q1)^2` is
    0*NaN = NaN, which poisons the batch mean and then — via the
    reference-parity nan_to_num on gradients (trainer.py:249-251,
    reference experiment/pytorch/experiment.py:55) — silently zeroes the
    ENTIRE gradient: training becomes a no-op while a single chain is
    divergent (observed: 8^4 hot-start run, loss=nan every step, zero
    learning). Zeroing just the divergent chain keeps the other chains'
    signal; the where() has zero gradient into the dead branch."""
    return jnp.where(jnp.isfinite(term), term, jnp.zeros_like(term))


class LatticeLoss:
    def __init__(self, lattice: Lattice, config: LossConfig):
        self.lattice = lattice
        self.config = config
        self.is_u1 = isinstance(lattice, LatticeU1)

    def __call__(self, x_init, x_prop, acc):
        return self.calc_loss(x_init, x_prop, acc)

    # -- terms ----------------------------------------------------------
    def _plaq_sums(self, wl: jax.Array) -> jax.Array:
        if self.is_u1:
            return jnp.sum(jnp.cos(wl), axis=(1, 2))        # (nb,)
        return wl.real.sum(axis=tuple(range(2, wl.ndim)))    # (6, nb)

    def _plaq_loss(self, w1, w2, acc):
        p1 = self._plaq_sums(w1)
        p2 = self._plaq_sums(w2)
        ploss = acc * (p2 - p1) ** 2
        ploss = _finite_or_zero(ploss)
        if self.config.use_mixed_loss:
            return jnp.mean(mixed_loss(ploss + 1e-4, self.config.plaq_weight))
        return jnp.mean(-ploss / self.config.plaq_weight)

    def _charge_loss(self, w1, w2, acc):
        q1 = self.lattice.sin_charges(wloops=w1)
        q2 = self.lattice.sin_charges(wloops=w2)
        qloss = acc * (q2 - q1) ** 2
        qloss = _finite_or_zero(qloss)
        if self.config.use_mixed_loss:
            return jnp.mean(mixed_loss(qloss + 1e-4, self.config.charge_weight))
        return jnp.mean(-qloss / self.config.charge_weight)

    def _rmse_loss(self, x_init, x_prop, acc):
        dx = x_prop - x_init
        if jnp.issubdtype(dx.dtype, jnp.complexfloating):
            dx2 = dx.real**2 + dx.imag**2
        else:
            dx2 = dx**2
        dx2 = dx2.reshape(dx2.shape[0], -1).mean(axis=1)
        rloss = acc * dx2
        rloss = _finite_or_zero(rloss)
        if self.config.use_mixed_loss:
            return jnp.mean(mixed_loss(rloss + 1e-4, self.config.rmse_weight))
        return jnp.mean(-rloss / self.config.rmse_weight)

    # -- flowed charge term (SU(3) only; no reference counterpart) ------
    def _flowed_clover_charge(self, x: jax.Array) -> jax.Array:
        """Wilson-flow x (charge_flow_nsteps x charge_flow_eps, RK3) and
        return the clover topological charge, differentiably. The whole
        flow is remat'd (jax.checkpoint): backward recomputes the flow
        instead of storing nsteps intermediate lattices."""
        from l2hmc_tpu.ops import su3_comp as comp
        from l2hmc_tpu.ops import wilson_flow as wf
        lat = tuple(x.shape[2:-2])
        nb = x.shape[0]
        eps = float(self.config.charge_flow_eps)
        ns = int(self.config.charge_flow_nsteps)

        def flow_q(y):
            yf, _obs = wf.flow_complex_lattice(y, eps, ns, lat=lat)
            return comp.topo_charge_clover(
                comp.from_complex_lattice(yf), lat, nb)

        return jax.checkpoint(flow_q)(x)

    def _flowed_charge_loss(self, x_init, x_prop, acc):
        # x_init carries no parameter dependence — cut its (recomputed)
        # backward pass explicitly
        q1 = jax.lax.stop_gradient(self._flowed_clover_charge(x_init))
        q2 = self._flowed_clover_charge(x_prop)
        qloss = acc * (q2 - q1) ** 2
        qloss = _finite_or_zero(qloss)
        if self.config.use_mixed_loss:
            return jnp.mean(mixed_loss(qloss + 1e-4,
                                       self.config.charge_weight))
        return jnp.mean(-qloss / self.config.charge_weight)

    # -- total ----------------------------------------------------------
    def calc_loss(self, x_init, x_prop, acc) -> jax.Array:
        """Weighted sum of the active terms (loss.py:194-210)."""
        w1 = self.lattice.wilson_loops(x_init)
        w2 = self.lattice.wilson_loops(x_prop)
        total = jnp.zeros((), dtype=acc.dtype)
        if self.config.plaq_weight > 0:
            total = total + self._plaq_loss(w1, w2, acc)
        if self.config.charge_weight > 0:
            flow_ns = int(getattr(self.config, "charge_flow_nsteps", 0))
            if flow_ns > 0 and not self.is_u1:
                total = total + self._flowed_charge_loss(x_init, x_prop,
                                                         acc)
            else:
                total = total + self._charge_loss(w1, w2, acc)
        if self.config.rmse_weight > 0:
            total = total + self._rmse_loss(x_init, x_prop, acc)
        return total

    # -- metrics --------------------------------------------------------
    def lattice_metrics(self, xinit, xout=None) -> dict:
        """plaqs/intQ/sinQ (+ dQint/dQsin vs xinit) (loss.py:94-110)."""
        metrics = self.lattice.calc_metrics(xinit)
        if xout is not None:
            wl = self.lattice.wilson_loops(xout)
            qint = self.lattice.int_charges(wloops=wl)
            qsin = self.lattice.sin_charges(wloops=wl)
            metrics.update({
                "dQint": jnp.abs(qint - metrics["intQ"]),
                "dQsin": jnp.abs(qsin - metrics["sinQ"]),
            })
        return metrics
