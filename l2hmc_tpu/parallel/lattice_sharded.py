"""Lattice-domain-decomposed SU(3): action/force/HMC over a 2-D mesh.

Scales 4D SU(3) beyond one chip's HBM (BASELINE.json configs #4/#5: 8^4
sharded over 8 chips, 16^4 on a v5e-256 pod): chains shard over the
'data' mesh axis AND the lattice t-axis shards over a 'lattice' mesh
axis. All plaquette/staple neighbor access goes through the halo roll
(parallel/halo.py — one-slab ppermute over ICI); scalar reductions
(action, kinetic energy) psum over 'lattice'.

The reference has no counterpart — it replicates the full lattice per
rank (reference configs.py:496-518) — so this module is the genuine
"context parallel" extension of its data-parallel-only design
(SURVEY.md §5).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from l2hmc_tpu.ops import lattice_su3, su3 as g
from l2hmc_tpu.parallel.halo import make_sharded_roll
from l2hmc_tpu.utils import mh

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# x layout: (nb, 4, nt, nx, ny, nz, 3, 3); t is the sharded lattice axis.
X_SPEC = P("data", None, "lattice", None, None, None, None, None)
# per-direction field (nb, nt, nx, ny, nz, 3, 3): t axis is 1 -> the
# sharded_axis for halo rolls inside the plane/staple helpers is 1+... the
# helpers roll arrays shaped (nb, nt, ...), so sharded_axis = 1.
_T_AXIS_IN_FIELD = 1


def make_mesh_2d(n_data: int, n_lattice: int,
                 devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_data * n_lattice, (
        f"mesh_shape=({n_data}, {n_lattice}) needs "
        f"{n_data * n_lattice} devices but only {len(devices)} are "
        f"visible; on a dev box run with JAX_PLATFORMS=cpu "
        f"XLA_FLAGS=--xla_force_host_platform_device_count=N")
    arr = np.asarray(devices[: n_data * n_lattice]).reshape(
        n_data, n_lattice)
    return Mesh(arr, axis_names=("data", "lattice"))


class ShardedLatticeSU3:
    """Sharded counterpart of ops.lattice_su3.LatticeSU3.

    All public methods take/return GLOBAL arrays laid out with
    NamedSharding(mesh, X_SPEC); compiled bodies run per-shard via
    shard_map with halo exchange.
    """

    def __init__(self, mesh: Mesh, nchains: int, shape, c1: float = 0.0):
        assert len(shape) == 4
        self.mesh = mesh
        self.latvolume = tuple(shape)
        self.volume = int(np.prod(shape))
        self.c1 = c1
        self.nchains = nchains
        self.n_lattice = mesh.shape["lattice"]
        self.n_data = mesh.shape["data"]
        assert shape[0] % self.n_lattice == 0, (
            "t extent must divide the lattice mesh axis")
        assert nchains % self.n_data == 0
        self.local_volume = (shape[0] // self.n_lattice, *shape[1:])
        self.xshape = (nchains, 4, *shape, 3, 3)
        self._roll = make_sharded_roll("lattice", _T_AXIS_IN_FIELD)

        spec = lambda *s: NamedSharding(mesh, P(*s))
        self.x_sharding = NamedSharding(mesh, X_SPEC)

        lv = self.local_volume
        use_soa = (c1 == 0.0)   # SoA engine covers the plaquette action
        self.use_soa = use_soa
        if use_soa:
            from l2hmc_tpu.ops import su3_soa as soa
            # SoA per-direction fields are (3, 3, t, x, y, z, nb): the
            # sharded t axis is index 2
            soa_roll = make_sharded_roll("lattice", 2)

            def _to_soa(x):
                return soa.from_complex(jnp.moveaxis(x, 0, -3))

            def _from_soa(m):
                return jnp.moveaxis(soa.to_complex(m), -3, 0)

        def _action(x, beta):
            if use_soa:
                s = soa.action(_to_soa(x), beta, roll=soa_roll)
            else:
                s = lattice_su3.action(x, beta, lv, self.c1, roll=self._roll)
            return jax.lax.psum(s, "lattice")

        def _force(x, beta):
            if use_soa:
                return _from_soa(soa.grad_action(_to_soa(x), beta,
                                                 roll=soa_roll))
            return lattice_su3.grad_action(x, beta, lv, self.c1,
                                           roll=self._roll)

        def _kinetic(v):
            return jax.lax.psum(g.kinetic_energy(v), "lattice")

        def _plaqs(x):
            if use_soa:
                re_tot, _ = soa.plaq_traces(_to_soa(x), roll=soa_roll)
                local = jnp.sum(re_tot, axis=tuple(range(re_tot.ndim - 1)))
            else:
                ps, _ = lattice_su3.wilson_loops(x, lv, roll=self._roll)
                local = ps.real.sum(axis=tuple(range(2, ps.ndim))).sum(0)
            tot = jax.lax.psum(local, "lattice")
            return tot / (6 * 3 * self.volume)

        smap = partial(shard_map, mesh=mesh)
        self._action_sh = jax.jit(smap(
            _action, in_specs=(X_SPEC, P()), out_specs=P("data")))
        self._force_sh = jax.jit(smap(
            _force, in_specs=(X_SPEC, P()), out_specs=X_SPEC))
        self._kinetic_sh = jax.jit(smap(
            _kinetic, in_specs=(X_SPEC,), out_specs=P("data")))
        self._plaqs_sh = jax.jit(smap(
            _plaqs, in_specs=(X_SPEC,), out_specs=P("data")))

        def _hmc_traj(x, v, beta, eps, nlf):
            if use_soa:
                # whole trajectory in the SoA engine: convert once per
                # trajectory, psum the Hamiltonian pieces over 'lattice'
                xs, vs = _to_soa(x), _to_soa(v)
                f0 = soa.grad_action(xs, beta, roll=soa_roll)

                def body(carry, _):
                    xs, vs, f = carry
                    return soa.leapfrog(xs, vs, beta, eps, f, soa_roll), None

                (xp_s, vp_s, _), _ = jax.lax.scan(
                    body, (xs, vs, f0), None, length=nlf)
                h0 = (jax.lax.psum(soa.kinetic_energy(vs), "lattice")
                      + _action(x, beta))
                xp = _from_soa(xp_s)
                vp = _from_soa(vp_s)
                h1 = (jax.lax.psum(soa.kinetic_energy(vp_s), "lattice")
                      + _action(xp, beta))
                return xp, vp, h0 - h1

            def body(carry, _):
                x, v, force = carry
                v1 = v - 0.5 * eps * force
                xp = g.update_gauge(x, eps * v1)
                f2 = _force(xp, beta)
                v2 = v1 - 0.5 * eps * f2
                return (xp, v2, f2), None

            f0 = _force(x, beta)
            (xp, vp, _), _ = jax.lax.scan(body, (x, v, f0), None, length=nlf)
            h0 = _kinetic(v) + _action(x, beta)
            h1 = _kinetic(vp) + _action(xp, beta)
            return xp, vp, h0 - h1

        self._traj_sh = {}
        self._hmc_traj = _hmc_traj

    # -- public API ----------------------------------------------------
    def shard(self, x: jax.Array) -> jax.Array:
        return jax.device_put(x, self.x_sharding)

    def action(self, x, beta):
        return self._action_sh(x, jnp.asarray(beta))

    def grad_action(self, x, beta):
        return self._force_sh(x, jnp.asarray(beta))

    def kinetic_energy(self, v):
        return self._kinetic_sh(v)

    def plaqs(self, x):
        return self._plaqs_sh(x)

    def flow(self, x, eps, nsteps: int):
        """Wilson-flow the mesh-laid-out field (ops/wilson_flow RK3 over
        the halo-exchange roll); returns (flowed x, {'t','plaq','t2E',
        'Qclover'}) with observables psum'd over 'lattice'. Same comms
        pattern as the force: every flow hop is a +-1 slab ppermute."""
        key = ("flow", int(nsteps), float(eps))
        if key not in self._traj_sh:
            from l2hmc_tpu.ops import su3_comp as comp
            from l2hmc_tpu.ops import wilson_flow as wf
            from l2hmc_tpu.parallel.sharded_train import (
                make_sharded_comp_roll)
            nb_l = self.nchains // self.n_data
            lat_l = self.local_volume
            roll = make_sharded_comp_roll(lat_l, nb_l)
            vol = self.volume

            def body(x_aos):
                xc = comp.from_complex_lattice(x_aos)
                res = wf.flow(xc, eps, nsteps, lat_l, nb_l, roll=roll)
                tr_g = jax.lax.psum(res.tr, "lattice")
                q_l = comp.topo_charge_clover(res.x, lat_l, nb_l,
                                              roll=roll)
                q = jax.lax.psum(q_l, "lattice")
                x_out = comp.to_complex_lattice(res.x, lat_l, nb_l,
                                                x_aos.dtype)
                return x_out, res.t, tr_g, q

            self._traj_sh[key] = jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=(X_SPEC,),
                out_specs=(X_SPEC, P(), P(None, "data"), P("data"))))
        from l2hmc_tpu.ops import wilson_flow as wf
        x2, t, tr, q = self._traj_sh[key](x)
        obs = wf.flow_observables(t, tr, self.volume)
        obs["Qclover"] = q
        return x2, obs

    def hmc_trajectory(self, x, v, beta, eps, nlf: int):
        """nlf leapfrog steps + dH; returns (x', v', dH = H0 - H1)."""
        if nlf not in self._traj_sh:
            fn = partial(self._hmc_traj, nlf=nlf)
            self._traj_sh[nlf] = jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(X_SPEC, X_SPEC, P(), P()),
                out_specs=(X_SPEC, X_SPEC, P("data")),
            ))
        return self._traj_sh[nlf](
            x, v, jnp.asarray(beta),
            jnp.asarray(eps, jnp.finfo(x.dtype).dtype))

    def hmc_step(self, x, beta, key, eps, nlf: int):
        """Full MH step with momentum refresh + accept across the mesh."""
        k_v, k_u = jax.random.split(key)
        v = g.random_momentum(k_v, self.xshape, dtype=x.dtype)
        v = self.shard(v)
        xp, vp, dh = self.hmc_trajectory(x, v, beta, eps, nlf)
        acc = mh.accept_prob(dh)
        u = jax.random.uniform(k_u, acc.shape, dtype=acc.dtype)
        mask = (acc > u).astype(x.real.dtype)
        x_out = mh.select(mask, xp, x)
        return x_out, {"acc": acc, "acc_mask": mask, "dh": dh}
