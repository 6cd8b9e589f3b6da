"""Lattice-sharded L2HMC *training* for SU(3): the full trainable kernel
(vnet calls, masked gauge updates, loss, grads, Adam) under a 2-D
(data x lattice) mesh.

Extends parallel/lattice_sharded.py (action/force/plain HMC) to the
trainable generalized-leapfrog kernel, enabling BASELINE.json configs
#4/#5 (8^4 over 8 chips, 16^4 pod) where a replicated lattice would not
fit one chip. The reference has no counterpart — it replicates the
lattice per rank (reference configs.py:496-518) and data-parallelizes
only (SURVEY.md §5).

Parallelization of the network (the only part that couples lattice
sites non-locally):

  * input layer — ROW-sharded over 'lattice': each shard contracts its
    local 8-coordinate block with the matching rows of the (replicated)
    weight, then one psum('lattice') reassembles the (nb_local, units)
    activation. This is standard tensor parallelism riding the same ICI
    as the halo exchange.
  * hidden stack — replicated compute (units are tiny; cheaper than any
    communication).
  * output heads — COLUMN-sharded: each shard computes only its local
    4*vol_local*9 slice of (s, t, q). No communication.
  * logdet — local feature sum + psum('lattice').

Everything else is local (SU(3) x-update is per-link) or already
halo-based (force/action via parallel/halo.py rolls). Gradients: the
per-shard grad w.r.t. the replicated params pytree is a partial
contribution (zero outside a shard's row/column slices by construction),
so psum over BOTH mesh axes reassembles the exact global gradient and
Adam runs replicated — bit-identical trajectories to the single-device
Dynamics for the same initial params (tested on the 8-device CPU mesh).

Randomness (momenta, MH draws) is generated OUTSIDE shard_map at the jit
level with sharded output layouts, so the drawn values are bit-identical
to a single-device run (JAX RNG is value-semantic under partitioning).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from l2hmc_tpu.configs import ExperimentConfig
from l2hmc_tpu.models import networks as net
from l2hmc_tpu.models.dynamics import Dynamics, DynamicsParams
from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.ops import su3_soa as soa
from l2hmc_tpu.parallel.halo import make_sharded_roll
from l2hmc_tpu.parallel.lattice_sharded import X_SPEC, make_mesh_2d

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class ShardedTrainState(NamedTuple):
    params: Any            # DynamicsParams, replicated
    masks: jax.Array       # (nlf, 4*vol) global per-link masks, replicated
    opt_state: Any
    step: jax.Array


def _slice_t(a: jax.Array, axis: int, t_global: int, n_shards: int,
             idx) -> jax.Array:
    """dynamic_slice a global-t axis down to this shard's block."""
    t_local = t_global // n_shards
    zero = jnp.zeros((), jnp.asarray(idx).dtype)
    starts = [zero] * a.ndim
    sizes = list(a.shape)
    starts[axis] = idx * t_local
    sizes[axis] = t_local
    return jax.lax.dynamic_slice(a, starts, sizes)


class ShardedTrainerSU3:
    """Jitted sharded train/eval steps over a ('data', 'lattice') mesh.

    Owns a Dynamics built at the GLOBAL volume (so params/masks are
    interchangeable with the single-device trainer) and re-implements its
    SU(3) leapfrog kernel per-shard.
    """

    def __init__(self, cfg: ExperimentConfig, mesh: Mesh):
        assert cfg.dynamics.group == "SU3"
        assert not cfg.network.use_batch_norm, (
            "BN under the 2-D mesh is not wired yet (needs pmean over "
            "'data'); disable use_batch_norm")
        assert cfg.network.dropout_prob == 0, (
            "dropout under the 2-D mesh is not wired yet (needs per-shard "
            "feature-aligned masks); set dropout_prob=0")
        self.cfg = cfg
        self.mesh = mesh
        self.n_lat = mesh.shape["lattice"]
        self.n_data = mesh.shape["data"]
        self.lat = tuple(cfg.dynamics.latvolume)
        self.T = self.lat[0]
        assert self.T % self.n_lat == 0
        assert cfg.dynamics.nchains % self.n_data == 0
        self.vol = int(np.prod(self.lat))
        self.xyz = self.vol // self.T
        self.nlf = cfg.dynamics.nleapfrog

        from l2hmc_tpu.train.trainer import _dtype_for
        self.dtype = _dtype_for(cfg)
        self.rdt = jnp.finfo(self.dtype).dtype
        self.dynamics = Dynamics(cfg.dynamics, cfg.network, cfg.net_weights,
                                 cfg.conv, dtype=self.dtype)
        from l2hmc_tpu.models.loss import LatticeLoss
        self.loss_cfg = cfg.loss
        lr = cfg.learning_rate
        chain = []
        if lr.clip_norm and lr.clip_norm > 0:
            chain.append(optax.clip_by_global_norm(lr.clip_norm))
        chain.append(optax.adam(lr.lr_init))
        self.tx = optax.chain(*chain)

        self.x_sharding = NamedSharding(mesh, X_SPEC)
        self._soa_roll = make_sharded_roll("lattice", 2)  # (3,3,t,...) t=2
        self._jit = {}

    # ------------------------------------------------------------------
    # Init
    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array):
        k_p, k_x = jax.random.split(key)
        params, masks = jax.jit(self.dynamics.init_params)(k_p)
        opt_state = self.tx.init(params)
        ts = ShardedTrainState(params, masks, opt_state,
                               jnp.zeros((), jnp.int32))
        rep = NamedSharding(self.mesh, P())
        ts = jax.device_put(ts, rep)
        x = jax.jit(
            self.dynamics.random_x,
            out_shardings=self.x_sharding)(k_x)
        return ts, x

    def shard(self, x: jax.Array) -> jax.Array:
        return jax.device_put(x, self.x_sharding)

    # ------------------------------------------------------------------
    # Per-shard network application (tensor-parallel LeapfrogLayer)
    # ------------------------------------------------------------------
    def _apply_vnet_sharded(self, layer: dict, xin, fin, li):
        """(nb_local, F_local) x2 -> (s, t, q) each (nb_local, out_local).

        Row-shards the two input embeddings (psum over 'lattice'),
        replicates the hidden stack, column-shards the three heads.
        Feature ordering note: the global vnet input is flattened from
        (8, d, t, x, y, z) and the output from (d, t, xyz, 3, 3) — the
        sharded t axis sits mid-shape, so weight slicing reshapes the
        feature axis to expose t before dynamic_slice."""
        cfg = self.cfg.network
        nw = self.cfg.net_weights.v
        act = net.ACTIVATIONS[cfg.activation_fn]
        T, nl, xyz = self.T, self.n_lat, self.xyz

        def slice_in_rows(w):
            # (F_in = 8*4*T*xyz, units) -> local rows (8*4*T/nl*xyz, units)
            wr = w.reshape(8 * 4, T, xyz * w.shape[-1])
            wr = _slice_t(wr, 1, T, nl, li)
            return wr.reshape(-1, w.shape[-1])

        def slice_out_cols(w):
            # (units, F_out = 4*T*xyz*9) -> local cols (units, 4*T/nl*xyz*9)
            wc = w.reshape(w.shape[0] * 4, T, xyz * 9)
            wc = _slice_t(wc, 1, T, nl, li)
            return wc.reshape(w.shape[0], -1)

        def slice_out_vec(b):
            br = b.reshape(4, T, xyz * 9)
            return _slice_t(br, 1, T, nl, li).reshape(-1)

        zx = xin @ slice_in_rows(layer["xlayer"]["w"])
        zv = fin @ slice_in_rows(layer["vlayer"]["w"])
        z = jax.lax.psum(zx + zv, "lattice")
        z = act(z + layer["xlayer"]["b"] + layer["vlayer"]["b"])
        for h in layer["hidden"]:
            z = act(z @ h["w"] + h["b"])

        def head_lin(p):
            return z @ slice_out_cols(p["w"]) + slice_out_vec(p["b"])

        def head_scaled(p):
            coeff = slice_out_vec(p["coeff"].reshape(-1))
            return jnp.exp(coeff) * jnp.tanh(head_lin(p))

        s = nw.s * head_scaled(layer["scale"])
        t = nw.t * head_lin(layer["transl"])
        q = nw.q * head_scaled(layer["transf"])
        return s, t, q

    # ------------------------------------------------------------------
    # Per-shard kernel pieces (SoA fields with local t extent)
    # ------------------------------------------------------------------
    def _x_to_soa(self, x):
        return soa.from_complex(jnp.moveaxis(x, 0, -3))

    def _x_from_soa(self, m):
        return jnp.moveaxis(soa.to_complex(m), -3, 0)

    def _vec_flat(self, vec):
        # (8, d, t_l, x, y, z, nb_l) -> (nb_l, 8*4*t_l*xyz)
        return jnp.moveaxis(vec, -1, 0).reshape(vec.shape[-1], -1)

    def _stq_to_soa(self, a, t_local):
        nb = a.shape[0]
        r = a.reshape(nb, 4, t_local, *self.lat[1:], 3, 3)
        return jnp.transpose(r, (6, 7, 1, 2, 3, 4, 5, 0))

    def _update_v(self, layer, x, v, force, eps, direction, li):
        """Same equations/conventions as Dynamics._update_v_su3 (single
        count per complex entry), with the feature sums psum'd."""
        xin = self._vec_flat(soa.su3_to_vec(x)).astype(self.rdt)
        fin = self._vec_flat(soa.su3_to_vec(force)).astype(self.rdt)
        s, t, q = self._apply_vnet_sharded(layer, xin, fin, li)
        jac = 0.5 * eps * s
        logjac = jac if direction > 0 else -jac
        logdet = jax.lax.psum(jnp.sum(logjac, axis=1), "lattice")
        t_local = self.T // self.n_lat
        exp_s = self._stq_to_soa(jnp.exp(logjac), t_local)
        exp_q = self._stq_to_soa(jnp.exp(eps * q), t_local)
        t_ = self._stq_to_soa(t, t_local)
        fn_re = force.re * exp_q + t_
        fn_im = force.im * exp_q
        if direction > 0:
            vf = soa.M3(exp_s * v.re - 0.5 * eps * fn_re,
                        exp_s * v.im - 0.5 * eps * fn_im)
        else:
            vf = soa.M3(exp_s * (v.re + 0.5 * eps * fn_re),
                        exp_s * (v.im + 0.5 * eps * fn_im))
        return vf, logdet

    def _update_x(self, x, v, m_local, eps, direction):
        mm_ = m_local  # (1, 1, 4, t_local, x, y, z, 1)
        mb = 1.0 - mm_
        sign = eps if direction > 0 else -eps
        mbx = soa.M3(mb * x.re, mb * x.im)
        upd = soa.mm(soa.expm(soa.scale(v, sign), order=8, s=2), mbx)
        return soa.M3(mm_ * x.re + upd.re, mm_ * x.im + upd.im)

    def _hamiltonian(self, x, v, beta):
        ke = jax.lax.psum(soa.kinetic_energy(v), "lattice")
        act = jax.lax.psum(
            soa.action(x, beta, roll=self._soa_roll), "lattice")
        return ke + act

    def _lf_step(self, carry, step_inputs, direction):
        x, v, force, sld, beta = carry
        li = jax.lax.axis_index("lattice")
        eps_x = jax.nn.sigmoid(step_inputs["xeps"])
        eps_v = jax.nn.sigmoid(step_inputs["veps"])
        layer = step_inputs["vnet"]
        m = step_inputs["mask"]  # (4*vol,) global
        t_local = self.T // self.n_lat
        m_l = m.reshape(4, self.T, *self.lat[1:])
        m_l = _slice_t(m_l, 1, self.T, self.n_lat, li)
        m_l = m_l.reshape(1, 1, 4, t_local, *self.lat[1:], 1).astype(self.rdt)
        mb_l = 1.0 - m_l

        v1, ld = self._update_v(layer, x, v, force, eps_v, direction, li)
        sld = sld + ld
        if direction > 0:
            x1 = self._update_x(x, v1, m_l, eps_x, direction)
            x2 = self._update_x(x1, v1, mb_l, eps_x, direction)
        else:
            x1 = self._update_x(x, v1, mb_l, eps_x, direction)
            x2 = self._update_x(x1, v1, m_l, eps_x, direction)
        force2 = soa.grad_action(x2, beta, roll=self._soa_roll)
        v2, ld = self._update_v(layer, x2, v1, force2, eps_v, direction, li)
        sld = sld + ld
        return (x2, v2, force2, sld, beta)

    def _scan_direction(self, params, masks, x, v, beta, direction, sld):
        xs = {
            "xeps": params.xeps,
            "veps": params.veps,
            "mask": masks,
        }
        if self.cfg.dynamics.use_separate_networks:
            xs["vnet"] = params.vnets
        else:
            xs["vnet"] = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (self.nlf,) + a.shape),
                params.vnets)
        if direction < 0:
            xs = jax.tree_util.tree_map(lambda a: a[::-1], xs)
        force = soa.grad_action(x, beta, roll=self._soa_roll)

        def body(carry, si):
            return self._lf_step(carry, si, direction), None

        carry = (x, v, force, sld, beta)
        carry, _ = jax.lax.scan(body, carry, xs)
        x, v, _, sld, _ = carry
        return x, v, sld

    # ------------------------------------------------------------------
    # Per-shard transition + loss (runs inside shard_map)
    # ------------------------------------------------------------------
    def _kernel_fb(self, params, masks, x_aos, v_aos, beta):
        """Merged fwd+bwd trajectory on local shards. Returns
        (x_prop_aos, sumlogdet, h_init, h_prop)."""
        x = self._x_to_soa(x_aos)
        v = self._x_to_soa(v_aos)
        nb_local = x_aos.shape[0]
        # mark the per-chain accumulator 'data'-varying so the scan carry
        # type matches the data-sharded logdet contributions
        sld = jax.lax.pcast(jnp.zeros((nb_local,), self.rdt), ("data",),
                            to="varying")
        h0 = self._hamiltonian(x, v, beta)
        xf, vf, sld = self._scan_direction(params, masks, x, v, beta, +1, sld)
        vf = soa.scale(vf, -1.0)
        xb, vb, sld = self._scan_direction(params, masks, xf, vf, beta, -1,
                                           sld)
        h1 = self._hamiltonian(xb, vb, beta)
        return self._x_from_soa(xb), self._x_from_soa(vb), sld, h0, h1

    def _observables(self, x_aos, beta):
        """(per_plane_plaq_sums (6, nb), qsin, qint) with lattice psums."""
        xs = self._x_to_soa(x_aos)
        re_pp, im_pp = soa.plaq_traces(xs, roll=self._soa_roll,
                                       per_plane=True)
        axes = tuple(range(1, re_pp.ndim - 1))
        p = jax.lax.psum(jnp.sum(re_pp, axis=axes), "lattice")   # (6, nb)
        qs = jax.lax.psum(jnp.sum(im_pp, axis=axes).sum(0), "lattice")
        return p, qs / (6 * 3 * self.vol), qs / (32 * np.pi**2)

    def _loss_terms(self, x1, x2, acc, beta):
        """Identical math to models/loss.LatticeLoss.calc_loss, with the
        site sums psum'd over 'lattice' and the chain means over 'data'."""
        lc = self.loss_cfg
        p1, qs1, _ = self._observables(x1, beta)
        p2, qs2, _ = self._observables(x2, beta)
        total = jnp.zeros((), self.rdt)
        nch = self.cfg.dynamics.nchains

        def term(v, weight, n_elems):
            if lc.use_mixed_loss:
                v = weight / (v + 1e-4) - (v + 1e-4) / weight
            else:
                v = -v / weight
            return jax.lax.psum(jnp.sum(v), "data") / n_elems

        if lc.plaq_weight > 0:
            # per-plane differences (6, nb), mean over 6 * nchains
            total = total + term(acc * (p2 - p1) ** 2, lc.plaq_weight,
                                 6 * nch)
        if lc.charge_weight > 0:
            total = total + term(acc * (qs2 - qs1) ** 2, lc.charge_weight,
                                 nch)
        if lc.rmse_weight > 0:
            dx = x2 - x1
            dx2 = (dx.real**2 + dx.imag**2).reshape(dx.shape[0], -1)
            # mean over each chain's GLOBAL 4*vol*9 complex entries
            d = jax.lax.psum(dx2.sum(axis=1), "lattice") / (self.vol * 4 * 9)
            total = total + term(acc * d, lc.rmse_weight, nch)
        return total

    # ------------------------------------------------------------------
    # Public jitted steps
    # ------------------------------------------------------------------
    def _train_step_impl(self, ts: ShardedTrainState, x, beta, key):
        # key consumption mirrors train.trainer._train_step_impl +
        # Dynamics.apply_transition_fb exactly, so the drawn momenta and
        # MH uniforms are bit-identical to a single-device run
        k_main, _k_aux, _k_y = jax.random.split(key, 3)
        k_v, k_acc, _k_drop = jax.random.split(k_main, 3)
        beta = jnp.asarray(beta)
        # global-layout randoms (bit-identical to single-device)
        v = g.random_momentum(k_v, x.shape, dtype=x.dtype)
        v = jax.lax.with_sharding_constraint(v, self.x_sharding)
        u = jax.random.uniform(k_acc, (x.shape[0],), dtype=self.rdt)
        u = jax.lax.with_sharding_constraint(
            u, NamedSharding(self.mesh, P("data")))

        x_spec = X_SPEC
        u_spec = P("data")

        def shard_body(params, masks, x, v, u):
            def loss_of(p):
                xp, vp, sld, h0, h1 = self._kernel_fb(p, masks, x, v, beta)
                dh = h0 - h1 + sld
                acc = jnp.exp(jnp.minimum(dh, 0.0))
                loss = self._loss_terms(x, xp, acc, beta)
                return loss, (xp, acc)

            (loss, (xp, acc)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(params)
            grads = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(a, ("data", "lattice")), grads)
            grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
            acc_mask = (acc > u).astype(self.rdt)
            mb = acc_mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
            x_out = mb * xp + (1.0 - mb) * x
            # per-chain observables for metrics
            p_pp, qsin, qint = self._observables(x_out, beta)
            metrics = {
                "acc": acc,
                "acc_mask": acc_mask,
                "plaqs": p_pp.sum(0) / (6 * 3 * self.vol),
                "sinQ": qsin,
                "intQ": qint,
            }
            return loss, grads, x_out, metrics

        smapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(), P(), x_spec, x_spec, u_spec),
            out_specs=(P(), P(), x_spec,
                       {"acc": u_spec, "acc_mask": u_spec,
                        "plaqs": u_spec, "sinQ": u_spec, "intQ": u_spec}),
        )
        loss, grads, x_out, metrics = smapped(ts.params, ts.masks, x, v, u)
        if self.cfg.dynamics.eps_fixed:
            grads = grads._replace(xeps=jnp.zeros_like(grads.xeps),
                                   veps=jnp.zeros_like(grads.veps))
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        new_ts = ShardedTrainState(params, ts.masks, opt_state, ts.step + 1)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["xeps"] = jax.nn.sigmoid(params.xeps)
        metrics["veps"] = jax.nn.sigmoid(params.veps)
        return new_ts, x_out, metrics

    def train_step(self, ts, x, beta, key):
        if "train" not in self._jit:
            self._jit["train"] = jax.jit(self._train_step_impl)
        return self._jit["train"](ts, x, beta, key)

    def _eval_step_impl(self, ts, x, beta, key):
        # mirrors Dynamics.apply_transition_fb key splits
        k_v, k_acc, _k_drop = jax.random.split(key, 3)
        beta = jnp.asarray(beta)
        v = g.random_momentum(k_v, x.shape, dtype=x.dtype)
        v = jax.lax.with_sharding_constraint(v, self.x_sharding)
        u = jax.random.uniform(k_acc, (x.shape[0],), dtype=self.rdt)
        u = jax.lax.with_sharding_constraint(
            u, NamedSharding(self.mesh, P("data")))

        def shard_body(params, masks, x, v, u):
            xp, vp, sld, h0, h1 = self._kernel_fb(params, masks, x, v, beta)
            dh = h0 - h1 + sld
            acc = jnp.exp(jnp.minimum(dh, 0.0))
            acc_mask = (acc > u).astype(self.rdt)
            mb = acc_mask.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
            x_out = mb * xp + (1.0 - mb) * x
            p_pp, qsin, qint = self._observables(x_out, beta)
            return x_out, {
                "acc": acc, "acc_mask": acc_mask,
                "plaqs": p_pp.sum(0) / (6 * 3 * self.vol),
                "sinQ": qsin, "intQ": qint, "sumlogdet": acc_mask * sld,
            }

        u_spec = P("data")
        smapped = shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(), P(), X_SPEC, X_SPEC, u_spec),
            out_specs=(X_SPEC,
                       {k: u_spec for k in
                        ("acc", "acc_mask", "plaqs", "sinQ", "intQ",
                         "sumlogdet")}),
        )
        return smapped(ts.params, ts.masks, x, v, u)

    def eval_step(self, ts, x, beta, key):
        if "eval" not in self._jit:
            self._jit["eval"] = jax.jit(self._eval_step_impl)
        return self._jit["eval"](ts, x, beta, key)
