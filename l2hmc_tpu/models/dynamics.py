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
from l2hmc_tpu.ops import su3_soa as soa
from l2hmc_tpu.ops import lattice_u1, lattice_su3


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
    ):
        self.config = config
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
                config.nchains, list(config.latvolume))
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
    # Internal representation: SU(3) runs the whole trajectory in the SoA
    # engine (ops/su3_soa — the complex (...,3,3) AoS layout wastes ~99%
    # of each TPU vector tile); U(1) stays flat. Conversions happen once
    # per kernel invocation.
    # ------------------------------------------------------------------
    def _x_to_soa(self, x: jax.Array) -> "soa.M3":
        """(nb, d, t, x, y, z, 3, 3) complex -> M3 batch (d,t,x,y,z,nb)."""
        return soa.from_complex(jnp.moveaxis(x, 0, -3))

    def _x_from_soa(self, m: "soa.M3") -> jax.Array:
        return jnp.moveaxis(soa.to_complex(m), -3, 0)

    def _to_internal(self, state: State):
        if self.group == "SU3":
            return (self._x_to_soa(state.x), self._x_to_soa(state.v),
                    state.beta)
        return (state.x, state.v, state.beta)

    def _from_internal(self, i) -> State:
        if self.group == "SU3":
            return State(self._x_from_soa(i[0]), self._x_from_soa(i[1]), i[2])
        return State(i[0], i[1], i[2])

    def _flip_v_internal(self, i):
        if self.group == "SU3":
            return (i[0], soa.scale(i[1], -1.0), i[2])
        return (i[0], -i[1], i[2])

    def _grad_internal(self, ix, beta):
        if self.group == "SU3":
            return soa.grad_action(ix, beta)
        return self.lattice.grad_action(ix, beta)

    def _hamiltonian_internal(self, ix, iv, beta) -> jax.Array:
        if self.group == "SU3":
            return soa.kinetic_energy(iv) + soa.action(ix, beta)
        return (self.lattice.kinetic_energy(iv)
                + self.lattice.action(ix, beta))

    def _vec_flatten(self, vec: jax.Array) -> jax.Array:
        """SoA coord field (8, d, t, x, y, z, nb) -> (nb, features)."""
        return jnp.moveaxis(vec, -1, 0).reshape(vec.shape[-1], -1)

    def _stq_to_soa(self, a: jax.Array) -> jax.Array:
        """Real head output (nb, 4*vol*9) -> SoA broadcast layout
        (3, 3, d, t, x, y, z, nb)."""
        lat = self.config.latvolume
        r = a.reshape(a.shape[0], 4, *lat, 3, 3)
        return jnp.transpose(r, (6, 7, 1, 2, 3, 4, 5, 0))

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
        """Total energy; SU(3) computes through the SoA engine."""
        if self.group == "SU3":
            return self._hamiltonian_internal(
                self._x_to_soa(state.x), self._x_to_soa(state.v), state.beta)
        return self.kinetic_energy(state.v) + self.potential(state.x, state.beta)

    def random_x(self, key: jax.Array, nchains: Optional[int] = None) -> jax.Array:
        n = nchains or self.config.nchains
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
            xin = self._vec_flatten(soa.su3_to_vec(x))
            fin = self._vec_flatten(soa.su3_to_vec(force))
        return net.apply_leapfrog_layer(
            vnet, xin.astype(self.real_dtype), fin.astype(self.real_dtype),
            cfg=self.network_config, net_weight=self.net_weights.v,
            training=training, dropout_key=dkey,
            compute_dtype=self.net_compute_dtype,
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
        )

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
        (direction=-1, :1282-1297) v update. Returns (v', logdet)."""
        s, t, q = self._call_vnet(vnet, state.x, force, training, dkey)
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
        return vf, logdet

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
        s, t, q = self._call_xnet(xnet, xm, state.v, training, dkey)
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
        return xf, logdet

    def _update_v_su3(self, vnet, x: "soa.M3", v: "soa.M3",
                      force: "soa.M3", eps, direction: int, training, dkey):
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
        s, t, q = self._call_vnet(vnet, x, force, training, dkey)
        jac = 0.5 * eps * s
        logjac = jac if direction > 0 else -jac
        logdet = jnp.sum(logjac, axis=1)
        exp_s = self._stq_to_soa(jnp.exp(logjac))
        exp_q = self._stq_to_soa(jnp.exp(eps * q))
        t_ = self._stq_to_soa(t)
        fn_re = force.re * exp_q + t_
        fn_im = force.im * exp_q
        if direction > 0:
            vf = soa.M3(exp_s * v.re - 0.5 * eps * fn_re,
                        exp_s * v.im - 0.5 * eps * fn_im)
        else:
            vf = soa.M3(exp_s * (v.re + 0.5 * eps * fn_re),
                        exp_s * (v.im + 0.5 * eps * fn_im))
        return vf, logdet

    def _update_x_su3(self, x: "soa.M3", v: "soa.M3", m, eps,
                      direction: int):
        """SU(3) x update in SoA: masked gauge drift, zero logdet
        (dynamics.py:1420-1425, :1468-1475). The per-link mask broadcasts
        over the 3x3 block, so exp(eps v) @ (mb * x) touches exactly the
        (1-m) links and the update inverts exactly."""
        lat = self.config.latvolume
        mm_ = m.reshape(1, 1, 4, *lat, 1)
        mb = 1.0 - mm_
        sign = eps if direction > 0 else -eps
        mbx = soa.M3(mb * x.re, mb * x.im)
        # eps is trainable (sigmoid-bounded < 1) and |v|_F ~ 2.8 for
        # thermal TAH momenta, so |eps*v|_F can reach ~2.8 if training
        # drives eps up; two scaling-squaring halvings keep the order-8
        # Taylor unitary to ~4e-8 over the whole reachable range
        # (ADVICE r1: s=0 lost unitarity above |m|_F ~ 1)
        upd = soa.mm(soa.expm(soa.scale(v, sign), order=8, s=2), mbx)
        xf = soa.M3(mm_ * x.re + upd.re, mm_ * x.im + upd.im)
        logdet = jnp.zeros(x.re.shape[-1], dtype=self.real_dtype)
        return xf, logdet

    # ------------------------------------------------------------------
    # Leapfrog steps (with force carried across the step boundary)
    # ------------------------------------------------------------------
    def _lf_step(self, carry, step_inputs, direction: int, training: bool,
                 base_key):
        """One generalized leapfrog step (fwd: dynamics.py:1187-1206,
        bwd: :1208-1228). carry = (x, v, force, sumlogdet)."""
        x, v, force, sumlogdet, beta = carry
        eps_x = _sigmoid(step_inputs["xeps"])
        eps_v = _sigmoid(step_inputs["veps"])
        m = step_inputs["mask"]
        idx = step_inputs["idx"]
        vnet = step_inputs.get("vnet", None)
        if vnet is None:
            vnet = self._params_vnets
        xnet0 = step_inputs.get("xnet0", None)
        xnet1 = step_inputs.get("xnet1", None)
        if xnet0 is None:
            xnet0 = self._params_xnets_first
        if xnet1 is None:
            xnet1 = self._params_xnets_second

        def dkey(j):
            if not training or self.network_config.dropout_prob <= 0:
                return None
            k = jax.random.fold_in(base_key, idx * 8 + j + (4 if direction < 0 else 0))
            return k

        mb = 1.0 - m
        if self.group == "U1":
            state = State(x, v, beta)
            v1, ld = self._update_v(vnet, state, force, eps_v, direction,
                                    training, dkey(0))
            sumlogdet = sumlogdet + ld
            state = State(x, v1, beta)
            if direction > 0:
                x1, ld = self._update_x_u1(xnet0, state, m, eps_x, direction,
                                           training, dkey(1))
                sumlogdet = sumlogdet + ld
                state = State(x1, v1, beta)
                xn = xnet1 if self.config.use_split_xnets else xnet0
                x2, ld = self._update_x_u1(xn, state, mb, eps_x, direction,
                                           training, dkey(2))
            else:
                # backward order: (1-m) side first (dynamics.py:1222-1225)
                xn = xnet1 if self.config.use_split_xnets else xnet0
                x1, ld = self._update_x_u1(xn, state, mb, eps_x, direction,
                                           training, dkey(1))
                sumlogdet = sumlogdet + ld
                state = State(x1, v1, beta)
                x2, ld = self._update_x_u1(xnet0, state, m, eps_x, direction,
                                           training, dkey(2))
            sumlogdet = sumlogdet + ld
            force2 = self.grad_potential(x2, beta)
            state = State(x2, v1, beta)
            v2, ld = self._update_v(vnet, state, force2, eps_v, direction,
                                    training, dkey(3))
        else:
            # SU(3): x, v, force are SoA M3 fields
            v1, ld = self._update_v_su3(vnet, x, v, force, eps_v, direction,
                                        training, dkey(0))
            sumlogdet = sumlogdet + ld
            if direction > 0:
                x1, ld = self._update_x_su3(x, v1, m, eps_x, direction)
                sumlogdet = sumlogdet + ld
                x2, ld = self._update_x_su3(x1, v1, mb, eps_x, direction)
            else:
                x1, ld = self._update_x_su3(x, v1, mb, eps_x, direction)
                sumlogdet = sumlogdet + ld
                x2, ld = self._update_x_su3(x1, v1, m, eps_x, direction)
            sumlogdet = sumlogdet + ld
            force2 = self._grad_internal(x2, beta)
            v2, ld = self._update_v_su3(vnet, x2, v1, force2, eps_v,
                                        direction, training, dkey(3))
        sumlogdet = sumlogdet + ld
        return (x2, v2, force2, sumlogdet, beta)

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
        # stash shared nets for closure fallback (not traced through xs)
        self._params_vnets = (
            None if self.config.use_separate_networks else params.vnets)
        self._params_xnets_first = (
            None if self.config.use_separate_networks else params.xnets_first)
        self._params_xnets_second = (
            None if self.config.use_separate_networks else params.xnets_second)

        xs = self._make_xs(params, masks, reverse=(direction < 0))
        ix, iv, beta = istate
        force = self._grad_internal(ix, beta)

        # rematerialize each leapfrog step in the backward pass: storing
        # the 4-net-call residuals for 2*nlf steps costs ~5x the forward
        # in HBM traffic on the U(1) workload; SU(3) at these volumes is
        # not memory-bound and remat would double its (already large)
        # unrolled-SoA compile, so only U(1) remats
        step_fn = lambda carry, si: self._lf_step(carry, si, direction,
                                                  training, base_key)
        lf_step = jax.checkpoint(step_fn) if self.group == "U1" else step_fn

        def body(carry, step_inputs):
            new_carry = lf_step(carry, step_inputs)
            if self.config.verbose:
                x_, v_, _, sld, beta_ = new_carry
                h = self._hamiltonian_internal(x_, v_, beta_)
                ys = {"energy": h, "logdet": sld, "logprob": h - sld}
            else:
                ys = None
            return new_carry, ys

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
        i0 = self._to_internal(state)
        i_f, sld, ys_f = self._scan_direction(
            params, masks, i0, +1, training, base_key, sld)
        i_flip = self._flip_v_internal(i_f)
        i_b, sld, ys_b = self._scan_direction(
            params, masks, i_flip, -1, training, base_key, sld)
        s_b = self._from_internal(i_b)
        metrics = {"sumlogdet": sld}
        if self.config.verbose and ys_f is not None:
            metrics["per_step"] = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), ys_f, ys_b)
        return s_b, sld, metrics

    def transition_kernel(self, params, masks, state: State, forward: bool,
                          training=False, key=None, with_metrics=False):
        """Single-direction kernel (dynamics.py:1031-1063)."""
        base_key = key if key is not None else jax.random.PRNGKey(0)
        sld = jnp.zeros(state.x.shape[0], dtype=self.real_dtype)
        direction = +1 if forward else -1
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
        return jnp.exp(jnp.minimum(dh, 0.0))

    def _blend(self, acc_mask, prop, init):
        """out = acc * proposed + (1 - acc) * init, broadcast over dof."""
        shape = (-1,) + (1,) * (prop.ndim - 1)
        m = acc_mask.reshape(shape)
        if jnp.issubdtype(prop.dtype, jnp.complexfloating):
            m = m.astype(prop.dtype)
        return m * prop + (1.0 - m) * init

    def apply_transition_fb(self, params, masks, x, beta, key,
                            training=False):
        """Full MH transition with the merged kernel
        (dynamics.py:660-702). Returns (x_out, metrics)."""
        k_v, k_acc, k_drop = jax.random.split(key, 3)
        v = self.random_v(k_v, x)
        init = State(x, v, jnp.asarray(beta))
        prop, sld, kmetrics = self.transition_kernel_fb(
            params, masks, init, training=training, key=k_drop)
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
        if self.config.verbose and ys is not None:
            metrics["per_step"] = ys   # (nlf, nb) per series
        return x_out, metrics

    # ------------------------------------------------------------------
    # Plain HMC (network-free baseline; dynamics.py:632-658, 900-954)
    # ------------------------------------------------------------------
    def transition_kernel_hmc(self, state: State, eps, nleapfrog: int):
        """nleapfrog standard leapfrog steps with force caching: the
        trailing half-kick's force is reused by the next step's leading
        half-kick (identical trajectory to dynamics.py:900-913 at nlf+1
        instead of 2*nlf force evals).

        SU(3) runs in the SoA engine (ops/su3_soa): the complex
        (..., 3, 3) layout wastes ~99% of each TPU vector register, so the
        trajectory converts once at entry/exit and runs ~5x faster."""
        if self.group == "SU3":
            from l2hmc_tpu.ops import su3_soa as soa
            xs = soa.from_complex(jnp.moveaxis(state.x, 0, -3))
            vs = soa.from_complex(jnp.moveaxis(state.v, 0, -3))
            xp, vp, _ = soa.hmc_trajectory(
                xs, vs, state.beta, eps, nleapfrog)
            x = jnp.moveaxis(soa.to_complex(xp), -3, 0)
            v = jnp.moveaxis(soa.to_complex(vp), -3, 0)
            return State(x, v, state.beta)

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
        return State(x, v, state.beta)

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
        prop = self.transition_kernel_hmc(init, eps, nleapfrog)
        sld = jnp.zeros(x.shape[0], dtype=self.real_dtype)
        acc = self.compute_accept_prob(init, prop, sld)
        u = jax.random.uniform(k_acc, acc.shape, dtype=acc.dtype)
        acc_mask = (acc > u).astype(self.real_dtype)
        x_out = self._blend(acc_mask, prop.x, init.x)
        v_out = self._blend(acc_mask, prop.v, init.v)
        out = State(x_out, v_out, init.beta)
        return x_out, {
            "acc": acc,
            "acc_mask": acc_mask,
            "sumlogdet": sld,
            "beta": init.beta,
            "mc_states": MonteCarloStates(init=init, proposed=prop, out=out),
        }
