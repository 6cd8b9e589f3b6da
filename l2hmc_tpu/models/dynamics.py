"""Generalized-leapfrog (L2HMC) dynamics as jit-compiled lax.scan kernels.

TPU-native counterpart of the reference's `Dynamics` module
(reference src/l2hmc/dynamics/pytorch/dynamics.py). The reference runs a
Python loop of 4 network calls + 2 autograd force evaluations per leapfrog
step, eagerly per training step (dynamics.py:980-1022); here the whole
merged forward+backward trajectory is ONE `lax.scan` pair over stacked
per-step parameters — XLA compiles it once and fuses the elementwise
update math into the network GEMMs.

Update equations (identical to the reference):
  v-update fwd (dynamics.py:1266-1280):
      eps = sigmoid(raw_veps[k])
      (s,t,q) = vnet(x, F),   F = dS/dx
      logjac = eps*s/2;  v' = exp(logjac)*v - eps/2*(F*exp(eps*q) + t)
      logdet += sum(logjac)
  x-update fwd, U(1) NCP (dynamics.py:1386-1419):
      (s,t,q) = xnet([cos,sin](m*x), v);  s,q *= eps
      x' = 2 atan(tan(x/2) exp(s)) + eps*(v exp(q) + t)
      xf = m*x + (1-m)*x';  logdet += sum((1-m)*log(exp(s)/(cos^2(x/2)
            + exp(2s) sin^2(x/2))))
  x-update fwd, SU(3) (dynamics.py:1420-1425):
      xf = m*x + exp(eps*v) @ ((1-m)*x);  logdet += 0
  backward updates invert these exactly (dynamics.py:1282-1297,1430-1477).

Step sizes: the reference stores a raw parameter consumed as
`sigmoid(log(eps_raw))` (dynamics.py:1270); we store `raw = log(eps0)` and
consume `sigmoid(raw)`, which reproduces the reference's effective initial
step size and gradient flow while staying (0, 1)-bounded.

Force caching: within the merged trajectory the force needed by the first
v-half-kick of step k+1 equals the force computed for the second
v-half-kick of step k (x unchanged in between), so the scan carries the
force and does nlf+1 force evaluations per direction instead of the
reference's 2*nlf — bitwise-identical trajectories, ~2x fewer force evals.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.configs import (
    ConvolutionConfig, DynamicsConfig, NetWeights, NetworkConfig,
)
from l2hmc_tpu.models import networks as net
from l2hmc_tpu.ops import u1 as u1g
from l2hmc_tpu.ops import su3 as su3g
from l2hmc_tpu.ops import su3_comp as comp
from l2hmc_tpu.ops import lattice_u1, lattice_su3
from l2hmc_tpu.utils import mh


class State(NamedTuple):
    x: jax.Array
    v: jax.Array
    beta: jax.Array


class MonteCarloStates(NamedTuple):
    init: State
    proposed: State
    out: State


class DynamicsParams(NamedTuple):
    """Trainable parameters. Networks are stacked over the leapfrog axis
    when use_separate_networks (the default), else a single pytree."""
    xeps: jax.Array                 # (nlf,) raw; eps = sigmoid(raw)
    veps: jax.Array                 # (nlf,) raw
    vnets: Any
    xnets_first: Any                # None for SU(3) (x-update uses no net)
    xnets_second: Any               # None when not use_split_xnets


def _sigmoid(x):
    return jax.nn.sigmoid(x)


class Dynamics:
    """Static configuration + pure methods over (params, masks, state).

    The instance holds only Python-level config (safe to close over in
    jit); all array state lives in the arguments.
    """

    def __init__(
        self,
        config: DynamicsConfig,
        network: NetworkConfig,
        net_weights: Optional[NetWeights] = None,
        conv: Optional[ConvolutionConfig] = None,
        dtype=jnp.float32,
        net_compute_dtype=None,
        c1: float = 0.0,
    ):
        self.config = config
        self.c1 = float(c1)
        self.network_config = network
        self.net_weights = net_weights or NetWeights()
        # mixed precision for the (s,t,q) GEMM stacks (e.g. bfloat16)
        self.net_compute_dtype = net_compute_dtype
        self.conv = conv if (conv and conv.filters) else None
        self.group = config.group
        self.nlf = config.nleapfrog
        self.dtype = dtype
        if self.group == "U1":
            use_pallas = bool(getattr(config, "use_pallas", False)) and (
                jax.default_backend() not in ("cpu",))
            self.lattice = lattice_u1.LatticeU1(
                config.nchains, list(config.latvolume),
                use_pallas=use_pallas)
            self.g = u1g
            self.xdim = config.xdim
            self.x_in_dim = 2 * self.xdim   # [cos, sin]
            self.v_in_dim = self.xdim
            self.out_dim = self.xdim
            self.mask_dim = self.xdim
            self.conv_channels = 2 * config.dim
            self.conv_hw = (config.nt, config.nx)
        else:
            assert jnp.issubdtype(dtype, jnp.complexfloating)
            self.lattice = lattice_su3.LatticeSU3(
                config.nchains, list(config.latvolume), c1=self.c1)
            self.g = su3g
            vol = self.lattice.volume
            self.xdim = 4 * vol * 9          # complex entries per config
            self.x_in_dim = 4 * vol * 8      # group_to_vec coords
            self.v_in_dim = 4 * vol * 8
            self.out_dim = 4 * vol * 9       # real (s,t,q) entries
            # per-LINK masks (constant over each 3x3 block): the reference
            # masks individual matrix entries (dynamics.py:1101-1110 with
            # xdim counting entries), which makes its SU(3) x-update
            # non-invertible since the matmul mixes entries within a link;
            # per-link masks restore exact reversibility (tested).
            self.mask_dim = 4 * vol
            self.conv_channels = 0
            self.conv_hw = None
        # metadata-only real dtype (finfo(c64).dtype == f32); never create
        # an eager complex array on the host path — see ops/su3._real_dtype
        self.real_dtype = jnp.finfo(dtype).dtype

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> tuple[DynamicsParams, jax.Array]:
        """Returns (trainable params, fixed per-step binary masks)."""
        cfg = self.config
        k_eps, k_mask, k_v, k_x0, k_x1 = jax.random.split(key, 5)
        raw = float(np.log(cfg.eps))
        xeps = jnp.full((self.nlf,), raw, dtype=self.real_dtype)
        veps = jnp.full((self.nlf,), raw, dtype=self.real_dtype)

        def make_net(k, x_dim, with_conv):
            return net.init_leapfrog_layer(
                k,
                x_dim=x_dim,
                v_dim=self.v_in_dim,
                out_dim=self.out_dim,
                cfg=self.network_config,
                conv=self.conv if with_conv else None,
                conv_channels=self.conv_channels,
                conv_hw=self.conv_hw,
                dtype=self.real_dtype,
            )

        n_copies = self.nlf if cfg.use_separate_networks else 1

        def make_stack(k, x_dim, with_conv):
            ks = jax.random.split(k, n_copies)
            layers = [make_net(ks[i], x_dim, with_conv) for i in range(n_copies)]
            if cfg.use_separate_networks:
                return net.stack_layers(layers)
            return layers[0]

        vnets = make_stack(k_v, self.v_in_dim if self.group == "SU3"
                           else self.xdim, False)
        if self.group == "U1":
            xnets_first = make_stack(k_x0, self.x_in_dim, self.conv is not None)
            xnets_second = (
                make_stack(k_x1, self.x_in_dim, self.conv is not None)
                if cfg.use_split_xnets else None
            )
        else:
            # the reference's SU(3) x-update never calls its xnets
            # (dynamics.py:1420-1425); we don't build them
            xnets_first = None
            xnets_second = None

        masks = self._build_masks(k_mask)
        params = DynamicsParams(xeps, veps, vnets, xnets_first, xnets_second)
        return params, masks

    def _build_masks(self, key: jax.Array) -> jax.Array:
        """Per-step random binary masks, half the dof active
        (dynamics.py:1101-1110). Shape (nlf, mask_dim) — mask_dim is per
        U(1) link / per SU(3) link (see __init__)."""
        keys = jax.random.split(key, self.nlf)
        rows = []
        for k in keys:
            perm = jax.random.permutation(k, self.mask_dim)
            mask = jnp.zeros((self.mask_dim,), dtype=self.real_dtype)
            mask = mask.at[perm[: self.mask_dim // 2]].set(1.0)
            rows.append(mask)
        return jnp.stack(rows)

    # ------------------------------------------------------------------
    # Internal representation: SU(3) runs the whole trajectory in the
    # stacked-component engine (ops/su3_comp — re/im (3, 3, *batch)
    # arrays with the flat link batch folded to full vector tiles; the
    # complex (...,3,3) AoS layout wastes ~99% of each TPU vector tile).
    # U(1) stays flat. Conversions happen once per kernel invocation.
    # ------------------------------------------------------------------
    def _x_to_comp(self, x: jax.Array) -> "comp.F3":
        return comp.from_complex_lattice(x)

    def _comp_nb(self, f: "comp.F3") -> int:
        """Chain count from the flat component length (eval runs with
        fewer chains than config.nchains)."""
        return comp.batch_size(f) // (4 * self.lattice.volume)

    def _x_from_comp(self, f: "comp.F3") -> jax.Array:
        return comp.to_complex_lattice(
            f, tuple(self.config.latvolume), self._comp_nb(f), self.dtype)

    def _to_internal(self, state: State):
        if self.group == "SU3":
            return (self._x_to_comp(state.x), self._x_to_comp(state.v),
                    state.beta)
        return (state.x, state.v, state.beta)

    def _from_internal(self, i) -> State:
        if self.group == "SU3":
            return State(self._x_from_comp(i[0]), self._x_from_comp(i[1]),
                         i[2])
        return State(i[0], i[1], i[2])

    def _flip_v_internal(self, i):
        if self.group == "SU3":
            return (i[0], comp.scale(i[1], -1.0), i[2])
        return (i[0], -i[1], i[2])

    def _grad_internal(self, ix, beta):
        if self.group == "SU3":
            return comp.grad_action(ix, beta, tuple(self.config.latvolume),
                                    self._comp_nb(ix), c1=self.c1)
        return self.lattice.grad_action(ix, beta)

    def _force_traces_internal(self, ix, beta):
        """(force, plaq_re_sum or None): the Wilson force computation
        yields the action trace for free (comp.force_and_traces), so the
        kernels reuse it for the MH Hamiltonians instead of re-walking
        the plaquettes. c1 != 0 falls back to (autodiff force, None)."""
        if self.c1 != 0.0:
            return self._grad_internal(ix, beta), None
        return comp.force_and_traces(ix, beta,
                                     tuple(self.config.latvolume),
                                     self._comp_nb(ix))

    def _h_from_traces(self, iv, beta, tr):
        nb = self._comp_nb(iv)
        return comp.kinetic_energy(iv, nb) + (-beta / 3.0) * tr

    def _hamiltonian_internal(self, ix, iv, beta) -> jax.Array:
        if self.group == "SU3":
            nb = self._comp_nb(ix)
            return (comp.kinetic_energy(iv, nb)
                    + comp.action(ix, beta, tuple(self.config.latvolume),
                                  nb, c1=self.c1))
        return (self.lattice.kinetic_energy(iv)
                + self.lattice.action(ix, beta))

    def _vec_flatten(self, coords: jax.Array) -> jax.Array:
        """(8, *batch) coord array (batch flat = 4*V*nb in (d, lat, nb)
        order) -> (nb, 8*4*V) in the (8, d, t, x, y, z) feature order the
        vnet was initialized with."""
        c = coords.reshape(8, -1)
        nb = c.shape[1] // (4 * self.lattice.volume)
        c = c.reshape(8, -1, nb)               # (8, 4V, nb)
        return jnp.transpose(c, (2, 0, 1)).reshape(nb, -1)

    def _stq_to_comp(self, a: jax.Array) -> jax.Array:
        """Real head output (nb, 4*vol*9) -> stacked (3, 3, *batch)
        per-entry field (one transpose; batch ordered (d, lat, nb))."""
        nb = a.shape[0]
        at = jnp.transpose(a.reshape(nb, -1, 3, 3), (2, 3, 1, 0))
        return at.reshape(3, 3, *comp.fold_shape(at.shape[2] * nb))

    # ------------------------------------------------------------------
    # Physics helpers
    # ------------------------------------------------------------------
    def potential(self, x: jax.Array, beta) -> jax.Array:
        return self.lattice.action(x, beta)

    def grad_potential(self, x: jax.Array, beta) -> jax.Array:
        return self.lattice.grad_action(x, beta)

    def kinetic_energy(self, v: jax.Array) -> jax.Array:
        return self.lattice.kinetic_energy(v)

    def hamiltonian(self, state: State) -> jax.Array:
        """Total energy; SU(3) computes through the component engine."""
        if self.group == "SU3":
            return self._hamiltonian_internal(
                self._x_to_comp(state.x), self._x_to_comp(state.v),
                state.beta)
        return self.kinetic_energy(state.v) + self.potential(state.x, state.beta)

    def random_x(self, key: jax.Array, nchains: Optional[int] = None) -> jax.Array:
        n = nchains or self.config.nchains
        if getattr(self.config, "cold_start", False):
            # ordered ("cold") start: identity links / zero phases. The
            # standard lattice choice in the ordered phase — a HOT start
            # at 8^4 beta=5.7 left half the chains permanently frozen
            # (acc exactly 0 for 2000 draws: every proposal from the
            # maximally rough config is rejected, and the mean-acc stuck
            # redraw never fires because the other half is healthy).
            if self.group == "U1":
                return jnp.zeros((n, self.xdim), dtype=self.dtype)
            eye = jnp.eye(3, dtype=self.dtype)
            return jnp.broadcast_to(
                eye, (n, *self.config.xshape[1:])).copy()
        if self.group == "U1":
            return u1g.random(key, (n, self.xdim), dtype=self.dtype)
        return su3g.random(key, (n, *self.config.xshape[1:]), dtype=self.dtype)

    def random_v(self, key: jax.Array, x: jax.Array) -> jax.Array:
        if self.group == "U1":
            return u1g.random_momentum(key, x.shape, dtype=x.dtype)
        return su3g.random_momentum(key, x.shape, dtype=x.dtype)

    # ------------------------------------------------------------------
    # Network calls
    # ------------------------------------------------------------------
    def _flatten(self, x):
        return x.reshape(x.shape[0], -1)

    def _call_vnet(self, vnet, x, force, training, dkey):
        """(x, F) -> (s, t, q) (dynamics.py:1142-1159).

        SU(3) inputs arrive as SoA M3 fields and are mapped to 8
        Gell-Mann coordinates per link. NOTE: the reference's group_to_vec
        applies projectSU before extracting coords
        (group/su3/pytorch/group.py:138-147); here the coords are read
        directly — for x (kept exactly on the group by the per-link masked
        update) the projection is a numerical no-op, and for the force
        (already TAH, which su3_to_vec is defined for) the projection is
        an ill-conditioned renormalization. Dropping it also cuts ~40% of
        the unrolled-SoA graph (compile time)."""
        if self.group == "U1":
            xin = self._flatten(x)
            fin = self._flatten(force)
        else:
            xin = self._vec_flatten(comp.su3_to_vec(x))
            fin = self._vec_flatten(comp.su3_to_vec(force))
        return net.apply_leapfrog_layer(
            vnet, xin.astype(self.real_dtype), fin.astype(self.real_dtype),
            cfg=self.network_config, net_weight=self.net_weights.v,
            training=training, dropout_key=dkey,
            compute_dtype=self.net_compute_dtype,
            collect_bn=self._collect_bn(training),
        )

    def _call_xnet(self, xnet, xm, v, training, dkey):
        """(m*x, v) -> (s, t, q); U(1) x rep is [cos, sin]
        (dynamics.py:1161-1185)."""
        nb = xm.shape[0]
        xin = jnp.concatenate(
            [jnp.cos(xm), jnp.sin(xm)], axis=-1
        ).astype(self.real_dtype)
        return net.apply_leapfrog_layer(
            xnet, xin, self._flatten(v).astype(self.real_dtype),
            cfg=self.network_config, net_weight=self.net_weights.x,
            training=training, dropout_key=dkey,
            conv=self.conv, conv_channels=self.conv_channels,
            conv_hw=self.conv_hw,
            compute_dtype=self.net_compute_dtype,
            collect_bn=self._collect_bn(training),
        )

    def _collect_bn(self, training) -> bool:
        """STATIC decision: collect per-call BN batch stats so the
        Trainer can maintain torch-style running statistics (reference
        network.py:507). training is always a python bool here."""
        return bool(training) and self.network_config.use_batch_norm \
            and self.network_config.bn_track_running_stats

    def _reshape_as_v(self, a: jax.Array, v: jax.Array) -> jax.Array:
        """Real (nb, out_dim) head output -> broadcastable against v."""
        if self.group == "U1":
            return a
        return a.reshape(v.shape[0], *self.config.xshape[1:-2], 3, 3)

    # ------------------------------------------------------------------
    # Single updates
    # ------------------------------------------------------------------
    def _update_v(self, vnet, state: State, force, eps, direction: int,
                  training, dkey):
        """Forward (direction=+1, dynamics.py:1266-1280) or backward
        (direction=-1, :1282-1297) v update. Returns (v', logdet, bn)."""
        out = self._call_vnet(vnet, state.x, force, training, dkey)
        s, t, q = out[:3]
        bn = out[3] if len(out) == 4 else None
        jac = 0.5 * eps * s
        if direction > 0:
            logjac = jac
        else:
            logjac = -jac
        logdet = jnp.sum(logjac, axis=1)
        exp_s = self._reshape_as_v(jnp.exp(logjac), state.v)
        exp_q = self._reshape_as_v(jnp.exp(eps * q), state.v)
        t_ = self._reshape_as_v(t, state.v)
        force_new = force * exp_q + t_
        if direction > 0:
            vf = exp_s * state.v - 0.5 * eps * force_new
        else:
            vf = exp_s * (state.v + 0.5 * eps * force_new)
        return vf, logdet, bn

    def _update_x_u1(self, xnet, state: State, m, eps, direction: int,
                     training, dkey):
        """U(1) x update (fwd: dynamics.py:1386-1419).

        Forward (NCP): x' = 2 atan(tan(x/2) e^s) + eps (v e^q + t), with
        exact Jacobian log e^s/(cos^2(x/2) + e^{2s} sin^2(x/2)) on the
        (1-m) entries.

        Backward: the EXACT inverse, x = 2 atan(e^{-s} tan((x'-B)/2)) with
        B = eps (v e^q + t). NOTE: the reference's backward update
        (dynamics.py:1452-1462) instead computes
        2 atan(e^{-s} tan(x'/2)) - e^{-s} B, which is *not* the inverse of
        its forward map (its `test_reversibility` only logs the residual);
        we use the true inverse so fwd∘bwd = id to machine precision and
        the merged kernel satisfies detailed balance exactly (tested via a
        numerical Jacobian and a reversibility roundtrip).

        tan() is wrap-safe: compat_proj shifts by multiples of 2pi, and
        tan(z/2) has period pi in z/2.
        """
        mb = 1.0 - m
        xm = m * state.x
        out = self._call_xnet(xnet, xm, state.v, training, dkey)
        s, t, q = out[:3]
        bn = out[3] if len(out) == 4 else None
        s = eps * s
        q = eps * q
        exp_q = jnp.exp(q)
        b = eps * (state.v * exp_q + t)
        if self.config.use_ncp:
            if direction > 0:
                exp_s = jnp.exp(s)
                half = 0.5 * state.x
                xp = 2.0 * jnp.arctan(jnp.tan(half) * exp_s) + b
            else:
                exp_s = jnp.exp(-s)
                half = 0.5 * (state.x - b)
                xp = 2.0 * jnp.arctan(jnp.tan(half) * exp_s)
            cterm = jnp.square(jnp.cos(half))
            sterm = jnp.square(exp_s * jnp.sin(half))
            logdet_ = jnp.log(exp_s / (cterm + sterm))
            logdet = jnp.sum(mb * logdet_, axis=1)
        else:
            if direction > 0:
                exp_s = jnp.exp(s)
                xp = state.x * exp_s + b
                logdet = jnp.sum(mb * s, axis=1)
            else:
                exp_s = jnp.exp(-s)
                xp = exp_s * (state.x - b)
                logdet = jnp.sum(mb * (-s), axis=1)
        xf = xm + mb * xp
        xf = u1g.compat_proj(xf)
        return xf, logdet, bn

    def _update_v_su3(self, vnet, x: "comp.F3", v: "comp.F3",
                      force: "comp.F3", eps, direction: int, training, dkey):
        """SoA SU(3) v update — same equations as _update_v
        (dynamics.py:1266-1297): s, t, q are real per-entry fields.

        Jacobian convention (ADVICE r1): sumlogdet counts eps*s/2 ONCE per
        complex matrix entry (9 per link), exactly reproducing the
        reference's convention (dynamics.py:1278 sums the s tensor, one
        element per complex entry) even though exp_s scales both the real
        and imaginary parts — the true Jacobian over the 18 real dof per
        link would count 2x (and the entrywise scaling does not preserve
        the TAH constraint either). This is a deliberate parity choice
        with the reference, not an independent derivation; switching to
        the 2x count would change trained-sampler behavior vs the
        reference. Documented by
        tests/test_dynamics.py::test_su3_sumlogdet_convention."""
        out = self._call_vnet(vnet, x, force, training, dkey)
        s, t, q = out[:3]
        bn = out[3] if len(out) == 4 else None
        # direction may be a python +-1 OR a traced per-step scalar (the
        # unified fb scan): fwd  v' = e^{jac} v - eps/2 G,
        #                   bwd  v' = e^{-jac} (v + eps/2 G)
        # unify as v' = exp_s * v + w * G with w = -eps/2 (fwd) or
        # +eps/2 * exp_s (bwd); exp_s = e^{direction*jac} either way.
        jac = 0.5 * eps * s
        logjac = direction * jac
        logdet = jnp.sum(logjac, axis=1)
        exp_s = self._stq_to_comp(jnp.exp(logjac))
        exp_q = self._stq_to_comp(jnp.exp(eps * q))
        t_ = self._stq_to_comp(t)
        fn_re = force.re * exp_q + t_
        fn_im = force.im * exp_q
        half = 0.5 * eps
        fwd = direction > 0
        w = jnp.where(fwd, -half, half * exp_s)
        vf = comp.F3(exp_s * v.re + w * fn_re, exp_s * v.im + w * fn_im)
        return vf, logdet, bn

    def _update_x_su3(self, x: "comp.F3", v: "comp.F3", m, eps,
                      direction, drift: "comp.F3" = None):
        """SU(3) x update (component engine): masked gauge drift, zero
        logdet (dynamics.py:1420-1425, :1468-1475; the punt is exact —
        left translation, proven in tests/test_su3_algebra.py). The
        per-link mask broadcasts over the 3x3 block, so
        exp(eps v) @ ((1-m) x) touches exactly the (1-m) links and the
        update inverts exactly."""
        nb = self._comp_nb(x)
        # m: (4*vol,) per-link -> flat (4*vol*nb,) in (link, nb) order,
        # reshaped to x's batch so it broadcasts against (3, 3, *batch)
        mflat = jnp.broadcast_to(
            m[:, None].astype(self.real_dtype), (m.shape[0], nb)
        ).reshape(x.batch)
        mb = 1.0 - mflat
        sign = direction * eps   # works for python and traced +-1
        mbx = comp.F3(mb * x.re, mb * x.im)
        # eps is trainable (sigmoid-bounded < 1) and |v|_F ~ 2.8 for
        # thermal TAH momenta, so |eps*v|_F can reach ~2.8 if training
        # drives eps up; two scaling-squaring halvings keep the order-8
        # Taylor unitary to ~4e-8 over the whole reachable range
        # (ADVICE r1: s=0 lost unitarity above |m|_F ~ 1)
        if drift is None:
            drift = comp.expm(comp.scale(v, sign), order=8, s=2)
        upd = comp.mm(drift, mbx)
        xf = comp.F3(mflat * x.re + upd.re, mflat * x.im + upd.im)
        # reunitarize (reference dynamics.py:1419, :1467 compat_proj =
        # projectSU after EVERY x sub-update): the v-update's entrywise
        # exp_s scaling leaves v slightly off the algebra once training
        # turns s on, so exp(eps v) is only near-unitary; without this
        # the deviation compounds ~|s| per accepted trajectory (measured
        # 0.02/step at 4^4, saturating checkSU_max ~0.8 and killing
        # acceptance). reunit is an exact fixed point on unitary links,
        # so m-masked (untouched) links are preserved exactly — and
        # unlike projectSU its backward is finite at the (always
        # near-degenerate) x†x ~ I this site lives at: projectSU here
        # NaN'd the whole training gradient on production batches
        # (su3_comp.reunit docstring).
        xf = comp.reunit(xf)
        logdet = jnp.zeros((nb,), dtype=self.real_dtype)
        return xf, logdet, drift

    # ------------------------------------------------------------------
    # Leapfrog steps (with force carried across the step boundary)
    # ------------------------------------------------------------------
    def _lf_step(self, carry, step_inputs, direction: int, training: bool,
                 base_key, shared_nets=(None, None, None)):
        """One generalized leapfrog step (fwd: dynamics.py:1187-1206,
        bwd: :1208-1228). carry = (x, v, force, sumlogdet).

        shared_nets = (vnet, xnet0, xnet1) params closed over by the
        caller when use_separate_networks is off (per-step params ride
        the scan's xs otherwise) — VERDICT r2 #10: threading them as
        arguments keeps the kernel pure (no instance-state smuggling
        through traced code)."""
        x, v, force, sumlogdet, beta = carry
        eps_x = _sigmoid(step_inputs["xeps"])
        eps_v = _sigmoid(step_inputs["veps"])
        m = step_inputs["mask"]
        idx = step_inputs["idx"]
        vnet = step_inputs.get("vnet", shared_nets[0])
        xnet0 = step_inputs.get("xnet0", shared_nets[1])
        xnet1 = step_inputs.get("xnet1", shared_nets[2])

        def dkey(j):
            if not training or self.network_config.dropout_prob <= 0:
                return None
            k = jax.random.fold_in(base_key, idx * 8 + j + (4 if direction < 0 else 0))
            return k

        mb = 1.0 - m
        if True:   # U(1)-only body (SU(3) runs _su3_scan's unified body)
            state = State(x, v, beta)
            v1, ld, bn_v0 = self._update_v(vnet, state, force, eps_v,
                                           direction, training, dkey(0))
            sumlogdet = sumlogdet + ld
            state = State(x, v1, beta)
            if direction > 0:
                x1, ld, bn_x0 = self._update_x_u1(
                    xnet0, state, m, eps_x, direction, training, dkey(1))
                sumlogdet = sumlogdet + ld
                state = State(x1, v1, beta)
                xn = xnet1 if self.config.use_split_xnets else xnet0
                x2, ld, bn_x1 = self._update_x_u1(
                    xn, state, mb, eps_x, direction, training, dkey(2))
            else:
                # backward order: (1-m) side first (dynamics.py:1222-1225)
                xn = xnet1 if self.config.use_split_xnets else xnet0
                x1, ld, bn_x1 = self._update_x_u1(
                    xn, state, mb, eps_x, direction, training, dkey(1))
                sumlogdet = sumlogdet + ld
                state = State(x1, v1, beta)
                x2, ld, bn_x0 = self._update_x_u1(
                    xnet0, state, m, eps_x, direction, training, dkey(2))
            sumlogdet = sumlogdet + ld
            force2 = self.grad_potential(x2, beta)
            state = State(x2, v1, beta)
            v2, ld, bn_v1 = self._update_v(vnet, state, force2, eps_v,
                                           direction, training, dkey(3))
        sumlogdet = sumlogdet + ld
        if self._collect_bn(training):
            # per-call batch stats labeled by NET (x0/x1 = first/second
            # xnet regardless of call order) + the param-step index so
            # the Trainer's EMA scatters onto the stacked per-step BN
            bn = {"v": (bn_v0, bn_v1), "x0": bn_x0, "x1": bn_x1,
                  "idx": idx}
        else:
            bn = None
        return (x2, v2, force2, sumlogdet, beta), bn

    def _su3_lf_step(self, carry, si, training, base_key,
                     shared_vnet=None):
        """One SU(3) generalized leapfrog step with the direction as a
        TRACED per-step input: the merged fwd+bwd trajectory becomes a
        single scan whose body is traced (and differentiated) once —
        halving the graph vs separate fwd/bwd scans. si carries
        direction-adjusted masks (m1 = m fwd / 1-m bwd), a midpoint
        momentum-flip flag, and the per-step eps/net params already
        gathered in trajectory order."""
        x, v, force, tr, sumlogdet, beta = carry
        d = si["dir"]
        # momentum flip at the fb midpoint (dynamics.py:1001)
        v = comp.scale(v, 1.0 - 2.0 * si["flip"])
        eps_x = _sigmoid(si["xeps"])
        eps_v = _sigmoid(si["veps"])
        m1 = si["mask"]
        vnet = si.get("vnet", shared_vnet)

        def dkey(j):
            if not training or self.network_config.dropout_prob <= 0:
                return None
            off = jnp.where(d > 0, 0, 4).astype(si["idx"].dtype)
            return jax.random.fold_in(base_key, si["idx"] * 8 + j + off)

        v1, ld, bn_v0 = self._update_v_su3(vnet, x, v, force, eps_v, d,
                                           training, dkey(0))
        sumlogdet = sumlogdet + ld
        # both masked half-updates share the same exp(d*eps*v1): build it
        # once (saves a full order-8 expm per leapfrog step)
        x1, _, drift = self._update_x_su3(x, v1, m1, eps_x, d)
        x2, _, _ = self._update_x_su3(x1, v1, 1.0 - m1, eps_x, d,
                                      drift=drift)
        force2, tr2 = self._force_traces_internal(x2, beta)
        if tr2 is None:
            tr2 = tr
        v2, ld, bn_v1 = self._update_v_su3(vnet, x2, v1, force2, eps_v, d,
                                           training, dkey(3))
        sumlogdet = sumlogdet + ld
        if self._collect_bn(training):
            bn = {"v": (bn_v0, bn_v1), "idx": si["idx"]}
        else:
            bn = None
        return (x2, v2, force2, tr2, sumlogdet, beta), bn

    def _su3_scan(self, params, masks, ix, iv, beta, sld, idx_order, dirs,
                  flips, training, base_key):
        """Unified SU(3) trajectory scan over an arbitrary step schedule
        (idx_order into the per-step params, dirs = +-1, flips marks the
        momentum reversal)."""
        shared_vnet = (
            None if self.config.use_separate_networks else params.vnets)
        io = jnp.asarray(idx_order)
        dirs_a = jnp.asarray(dirs, self.real_dtype)
        flips_a = jnp.asarray(flips, self.real_dtype)
        m_base = masks[io].astype(self.real_dtype)
        # bwd steps act on the complement side first: fold the order swap
        # into the mask itself
        m_eff = jnp.where(dirs_a[:, None] > 0, m_base, 1.0 - m_base)
        xs = {
            "xeps": params.xeps[io],
            "veps": params.veps[io],
            "mask": m_eff,
            "dir": dirs_a,
            "flip": flips_a,
            "idx": io,
        }
        if self.config.use_separate_networks:
            xs["vnet"] = jax.tree_util.tree_map(lambda a: a[io],
                                                params.vnets)
        force, tr0 = self._force_traces_internal(ix, beta)
        if tr0 is None:   # c1 != 0: no trace sharing
            tr0 = jnp.zeros((self._comp_nb(ix),), self.real_dtype)

        def body(carry, si):
            new_carry, bn = self._su3_lf_step(carry, si, training, base_key,
                                              shared_vnet=shared_vnet)
            ys = {}
            if self.config.verbose:
                x_, v_, tr_, s_, beta_ = (new_carry[0], new_carry[1],
                                          new_carry[3], new_carry[4],
                                          new_carry[5])
                if self.c1 == 0.0:
                    h = self._h_from_traces(v_, beta_, tr_)
                else:
                    h = self._hamiltonian_internal(x_, v_, beta_)
                ys.update({"energy": h, "logdet": s_, "logprob": h - s_})
            if bn is not None:
                ys["bn"] = bn
            return new_carry, (ys or None)

        carry = (ix, iv, force, tr0, sld, beta)
        carry, ys = jax.lax.scan(body, carry, xs)
        x, v, _, tr_last, sld, _ = carry
        return x, v, sld, ys, tr0, tr_last

    def _make_xs(self, params: DynamicsParams, masks: jax.Array,
                 reverse: bool) -> dict:
        idx = jnp.arange(self.nlf)
        xs = {
            "xeps": params.xeps,
            "veps": params.veps,
            "mask": masks,
            "idx": idx,
        }
        if self.config.use_separate_networks:
            xs["vnet"] = params.vnets
            if self.group == "U1":
                xs["xnet0"] = params.xnets_first
                if self.config.use_split_xnets:
                    xs["xnet1"] = params.xnets_second
        if reverse:
            xs = jax.tree_util.tree_map(lambda a: a[::-1], xs)
        return xs

    def _scan_direction(self, params, masks, istate, direction: int,
                        training, base_key, sumlogdet):
        """Scan nlf leapfrog steps in one direction over the INTERNAL
        representation (SoA for SU(3), flat arrays for U(1))."""
        # shared (non-separate) nets ride the step closure, not the
        # scan's xs (they are step-invariant) — VERDICT r2 #10
        if self.config.use_separate_networks:
            shared_nets = (None, None, None)
        else:
            shared_nets = (params.vnets, params.xnets_first,
                           params.xnets_second)

        xs = self._make_xs(params, masks, reverse=(direction < 0))
        ix, iv, beta = istate
        force = self._grad_internal(ix, beta)

        # rematerialize each leapfrog step in the backward pass: storing
        # the 4-net-call residuals for 2*nlf steps costs ~5x the forward
        # in HBM traffic on the U(1) workload; SU(3) at these volumes is
        # not memory-bound and remat would double its (already large)
        # unrolled-SoA compile, so only U(1) remats
        step_fn = lambda carry, si: self._lf_step(carry, si, direction,
                                                  training, base_key,
                                                  shared_nets)
        lf_step = jax.checkpoint(step_fn) if self.group == "U1" else step_fn

        def body(carry, step_inputs):
            new_carry, bn = lf_step(carry, step_inputs)
            ys = {}
            if self.config.verbose:
                x_, v_, _, sld, beta_ = new_carry
                h = self._hamiltonian_internal(x_, v_, beta_)
                ys.update({"energy": h, "logdet": sld, "logprob": h - sld})
            if bn is not None:
                ys["bn"] = bn
            return new_carry, (ys or None)

        carry = (ix, iv, force, sumlogdet, beta)
        carry, ys = jax.lax.scan(body, carry, xs)
        x, v, _, sumlogdet, beta = carry
        return (x, v, beta), sumlogdet, ys

    # ------------------------------------------------------------------
    # Transition kernels
    # ------------------------------------------------------------------
    def transition_kernel_fb(self, params, masks, state: State,
                             training=False, key: Optional[jax.Array] = None):
        """Merged-direction kernel: nlf forward steps, momentum flip, nlf
        backward steps (dynamics.py:956-1029)."""
        base_key = key if key is not None else jax.random.PRNGKey(0)
        sld = jnp.zeros(state.x.shape[0], dtype=self.real_dtype)
        if self.group == "SU3":
            # one scan over 2*nlf steps with traced direction: the body
            # (and its AD transpose) is built once instead of twice
            nlf = self.nlf
            ix, iv, beta = self._to_internal(state)
            idx_order = list(range(nlf)) + list(reversed(range(nlf)))
            dirs = [1.0] * nlf + [-1.0] * nlf
            flips = [0.0] * nlf + [1.0] + [0.0] * (nlf - 1)
            x, v, sld, ys, tr0, tr1 = self._su3_scan(
                params, masks, ix, iv, beta, sld, idx_order, dirs, flips,
                training, base_key)
            s_b = self._from_internal((x, v, beta))
            metrics = {"sumlogdet": sld}
            if self.c1 == 0.0:
                # the force evaluations at the trajectory endpoints carry
                # the action traces: the MH Hamiltonians are free
                metrics["h_init_partial"] = (-beta / 3.0) * tr0
                metrics["h_prop"] = self._h_from_traces(v, beta, tr1)
            self._split_ys(metrics, ys)
            return s_b, sld, metrics
        i0 = self._to_internal(state)
        i_f, sld, ys_f = self._scan_direction(
            params, masks, i0, +1, training, base_key, sld)
        i_flip = self._flip_v_internal(i_f)
        i_b, sld, ys_b = self._scan_direction(
            params, masks, i_flip, -1, training, base_key, sld)
        s_b = self._from_internal(i_b)
        metrics = {"sumlogdet": sld}
        ys = None
        if ys_f is not None:
            ys = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), ys_f, ys_b)
        self._split_ys(metrics, ys)
        return s_b, sld, metrics

    def _split_ys(self, metrics: dict, ys) -> None:
        """Route scan outputs: per-leapfrog verbose series to
        metrics['per_step'], collected BN batch stats to
        metrics['bn_stats'] (consumed by the Trainer's running-stat
        EMA, torch BatchNorm semantics)."""
        if ys is None:
            return
        ys = dict(ys)
        bn = ys.pop("bn", None)
        if self.config.verbose and ys:
            metrics["per_step"] = ys
        if bn is not None:
            metrics["bn_stats"] = bn

    def transition_kernel(self, params, masks, state: State, forward: bool,
                          training=False, key=None, with_metrics=False):
        """Single-direction kernel (dynamics.py:1031-1063)."""
        base_key = key if key is not None else jax.random.PRNGKey(0)
        sld = jnp.zeros(state.x.shape[0], dtype=self.real_dtype)
        direction = +1 if forward else -1
        if self.group == "SU3":
            nlf = self.nlf
            ix, iv, beta = self._to_internal(state)
            idx_order = (list(range(nlf)) if forward
                         else list(reversed(range(nlf))))
            dirs = [float(direction)] * nlf
            flips = [0.0] * nlf
            x, v, sld, ys, _, _ = self._su3_scan(
                params, masks, ix, iv, beta, sld, idx_order, dirs, flips,
                training, base_key)
            st = self._from_internal((x, v, beta))
            if with_metrics:
                return st, sld, ys
            return st, sld
        i, sld, ys = self._scan_direction(
            params, masks, self._to_internal(state), direction, training,
            base_key, sld)
        if with_metrics:
            return self._from_internal(i), sld, ys
        return self._from_internal(i), sld

    def compute_accept_prob(self, state_init: State, state_prop: State,
                            sumlogdet) -> jax.Array:
        """acc = exp(min(0, H(init) - H(prop) + sumlogdet))
        (dynamics.py:1065-1079)."""
        h_init = self.hamiltonian(state_init)
        h_prop = self.hamiltonian(state_prop)
        dh = h_init - h_prop + sumlogdet
        return mh.accept_prob(dh)

    def _blend(self, acc_mask, prop, init):
        """Per-chain accept select (utils/mh.select: where, not an
        arithmetic blend — 0 * NaN from a rejected diverged proposal
        must not leak into the kept state)."""
        return mh.select(acc_mask, prop, init)

    def apply_transition_fb(self, params, masks, x, beta, key,
                            training=False):
        """Full MH transition with the merged kernel
        (dynamics.py:660-702). Returns (x_out, metrics)."""
        k_v, k_acc, k_drop = jax.random.split(key, 3)
        v = self.random_v(k_v, x)
        init = State(x, v, jnp.asarray(beta))
        prop, sld, kmetrics = self.transition_kernel_fb(
            params, masks, init, training=training, key=k_drop)
        if "h_prop" in kmetrics:
            # traces carried out of the scan: only the initial kinetic
            # energy remains to compute
            iv0 = self._x_to_comp(v)
            h_init = (comp.kinetic_energy(iv0, self._comp_nb(iv0))
                      + kmetrics.pop("h_init_partial"))
            dh = h_init - kmetrics.pop("h_prop") + sld
            acc = mh.accept_prob(dh)
        else:
            acc = self.compute_accept_prob(init, prop, sld)
        u = jax.random.uniform(k_acc, acc.shape, dtype=acc.dtype)
        acc_mask = (acc > u).astype(self.real_dtype)
        x_out = self._blend(acc_mask, prop.x, init.x)
        v_out = self._blend(acc_mask, prop.v, init.v)
        out = State(x_out, v_out, init.beta)
        metrics = {
            "acc": acc,
            "acc_mask": acc_mask,
            "sumlogdet": acc_mask * sld,
            "beta": init.beta,
            "mc_states": MonteCarloStates(init=init, proposed=prop, out=out),
        }
        metrics.update({k: v for k, v in kmetrics.items()
                        if k != "sumlogdet"})
        return x_out, metrics

    def apply_transition(self, params, masks, x, beta, key, training=False):
        """Random single-direction transition (dynamics.py:704-742); one
        direction draw for the whole batch like the reference (:709)."""
        k_dir, k_v, k_acc, k_drop = jax.random.split(key, 4)
        v = self.random_v(k_v, x)
        init = State(x, v, jnp.asarray(beta))
        fwd = jax.random.bernoulli(k_dir)

        def run(forward):
            return self.transition_kernel(params, masks, init, forward,
                                          training=training, key=k_drop,
                                          with_metrics=True)

        prop, sld, ys = jax.lax.cond(fwd, lambda: run(True),
                                     lambda: run(False))
        acc = self.compute_accept_prob(init, prop, sld)
        u = jax.random.uniform(k_acc, acc.shape, dtype=acc.dtype)
        acc_mask = (acc > u).astype(self.real_dtype)
        x_out = self._blend(acc_mask, prop.x, init.x)
        v_out = self._blend(acc_mask, prop.v, init.v)
        out = State(x_out, v_out, init.beta)
        metrics = {
            "acc": acc,
            "acc_mask": acc_mask,
            "sumlogdet": acc_mask * sld,
            "beta": init.beta,
            "mc_states": MonteCarloStates(init=init, proposed=prop, out=out),
        }
        self._split_ys(metrics, ys)   # per_step: (nlf, nb) per series
        return x_out, metrics

    # ------------------------------------------------------------------
    # Plain HMC (network-free baseline; dynamics.py:632-658, 900-954)
    # ------------------------------------------------------------------
    def transition_kernel_hmc(self, state: State, eps, nleapfrog: int):
        """nleapfrog standard leapfrog steps with force caching: the
        trailing half-kick's force is reused by the next step's leading
        half-kick (identical trajectory to dynamics.py:900-913 at nlf+1
        instead of 2*nlf force evals).

        SU(3) runs in the component engine (ops/su3_comp): the complex
        (..., 3, 3) layout wastes ~99% of each TPU vector register and
        even the color-stacked SoA layout idles most of the 128-lane
        minor dim for small chain counts; flat components keep every
        vector op full (measured 26 -> 945 GFLOP/s on v5e)."""
        if self.group == "SU3":
            lat = tuple(self.config.latvolume)
            nb = state.x.shape[0]
            xs = comp.from_complex_lattice(state.x)
            vs = comp.from_complex_lattice(state.v)
            xp, vp, dh, (tr0, tr1) = comp.hmc_trajectory(
                xs, vs, state.beta, eps, nleapfrog, lat, nb, c1=self.c1,
                with_traces=True)
            x = comp.to_complex_lattice(xp, lat, nb, state.x.dtype)
            v = comp.to_complex_lattice(vp, lat, nb, state.v.dtype)
            # free engine plaquettes (avg Re tr P / 3 per chain): the AoS
            # observable path costs ~40 ms/step at 128 chains on v5e —
            # ~7x the MD step itself — so HMC consumers read these
            vol = float(np.prod(lat))
            plaqs = (tr0 / (6.0 * 3.0 * vol), tr1 / (6.0 * 3.0 * vol))
            return State(x, v, state.beta), dh, plaqs

        def body(carry, _):
            x, v, force = carry
            v1 = v - 0.5 * eps * force
            xp = u1g.update_gauge(x, eps * v1)
            force2 = self.grad_potential(xp, state.beta)
            v2 = v1 - 0.5 * eps * force2
            return (xp, v2, force2), None

        force = self.grad_potential(state.x, state.beta)
        (x, v, _), _ = jax.lax.scan(
            body, (state.x, state.v, force), None, length=nleapfrog)
        prop = State(x, v, state.beta)
        dh = self.hamiltonian(state) - self.hamiltonian(prop)
        return prop, dh, None

    def apply_transition_hmc(self, x, beta, key, eps=None,
                             nleapfrog: Optional[int] = None):
        """HMC MH transition (dynamics.py:632-658)."""
        cfg = self.config
        if eps is None:
            eps = cfg.eps_hmc
        if nleapfrog is None:
            nleapfrog = cfg.nleapfrog * (2 if cfg.merge_directions else 1)
        k_v, k_acc = jax.random.split(key)
        v = self.random_v(k_v, x)
        init = State(x, v, jnp.asarray(beta))
        prop, dh, plaqs = self.transition_kernel_hmc(init, eps, nleapfrog)
        sld = jnp.zeros(x.shape[0], dtype=self.real_dtype)
        # dh comes out of the trajectory itself (the SU(3) path gets the
        # action traces free with every force evaluation)
        acc = mh.accept_prob(dh).astype(self.real_dtype)
        u = jax.random.uniform(k_acc, acc.shape, dtype=acc.dtype)
        acc_mask = (acc > u).astype(self.real_dtype)
        x_out = self._blend(acc_mask, prop.x, init.x)
        v_out = self._blend(acc_mask, prop.v, init.v)
        out = State(x_out, v_out, init.beta)
        metrics = {
            "acc": acc,
            "acc_mask": acc_mask,
            "sumlogdet": sld,
            "beta": init.beta,
            "mc_states": MonteCarloStates(init=init, proposed=prop, out=out),
        }
        if plaqs is not None:
            # engine-free plaquettes of the init and OUT (MH-blended)
            # states (SU(3) only; see transition_kernel_hmc)
            metrics["plaqs"] = plaqs[0]
            metrics["plaqs_out"] = (acc_mask * plaqs[1]
                                    + (1.0 - acc_mask) * plaqs[0])
        return x_out, metrics
