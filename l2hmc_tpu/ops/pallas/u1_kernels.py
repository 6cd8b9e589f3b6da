"""Fused U(1) Wilson-loop / action / force Pallas TPU kernel.

Computes, in one VMEM-resident pass per chain tile:
    W       = xu + xv(t+1) - xu(x+1) - xv          (plaquette angle)
    S       = beta * sum (1 - cos W)               (Wilson action)
    F       = beta * d S / d x                     (closed-form force)
replacing 3 rolls + trig + 2 rolls + reductions that XLA would otherwise
schedule from HBM-resident intermediates.

Layout: the chain axis rides the 128-lane dimension (x is processed as
(2, nt, nx, nb_tile)), so each (t, x) site is a full vector over chains —
the natural TPU layout for the batch-of-lattices workload. The wrapper
transposes in/out; use it when the surrounding computation doesn't already
keep chain-last layout.

Correctness oracle: l2hmc_tpu.ops.lattice_u1.{action, grad_action}
(tests run the kernel in interpret mode on CPU and on-device when TPU is
present).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, beta_ref, force_ref, act_ref):
    """x_ref: (2, nt, nx, NB) f32; beta in SMEM; outputs: force (2, nt,
    nx, NB), action (NB,)."""
    xu = x_ref[0]
    xv = x_ref[1]
    beta = beta_ref[0]
    nt = xu.shape[0]
    nx = xu.shape[1]
    # W[t, x] = xu[t,x] + xv[t+1,x] - xu[t,x+1] - xv[t,x]
    # (pltpu.roll wants non-negative shifts: roll by -1 == roll by n-1)
    w = (
        xu
        + pltpu.roll(xv, nt - 1, axis=0)
        - pltpu.roll(xu, nx - 1, axis=1)
        - xv
    )
    sw = jnp.sin(w)
    cw = jnp.cos(w)
    # dS/dxu[t,x] = beta (sinW[t,x] - sinW[t,x-1]);
    # dS/dxv[t,x] = beta (sinW[t-1,x] - sinW[t,x])
    force_ref[0] = beta * (sw - pltpu.roll(sw, 1, axis=1))
    force_ref[1] = beta * (pltpu.roll(sw, 1, axis=0) - sw)
    act_ref[0, :] = beta * jnp.sum(1.0 - cw, axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("nt", "nx", "interpret"))
def force_action_t(xt: jax.Array, beta, nt: int, nx: int,
                   interpret: bool = False):
    """Chain-last layout entry: xt (2, nt, nx, nb) -> (force_t, action).

    nb should be a multiple of 128 for clean lane tiling (any nb works,
    padded by Mosaic).
    """
    nb = xt.shape[-1]
    beta_arr = jnp.reshape(jnp.asarray(beta, xt.dtype), (1,))
    # tile the chain (lane) axis so each block + its trig intermediates
    # fits comfortably in the ~16MB of VMEM
    tile = nb
    while tile * nt * nx * 2 * 4 * 6 > 8 * 1024 * 1024 and tile % 2 == 0:
        tile //= 2
    grid = (nb // tile,)
    force, act = pl.pallas_call(
        _kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((2, nt, nx, nb), xt.dtype),
            jax.ShapeDtypeStruct((1, nb), xt.dtype),
        ),
        in_specs=[
            pl.BlockSpec((2, nt, nx, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, nt, nx, tile), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xt, beta_arr)
    return force, act[0]


def force_action(x: jax.Array, beta, nt: int, nx: int,
                 interpret: bool = False):
    """Chain-first convenience entry: x (nb, 2*nt*nx) or (nb, 2, nt, nx)
    -> (force like x, action (nb,))."""
    shape = x.shape
    xl = x.reshape(x.shape[0], 2, nt, nx)
    xt = jnp.transpose(xl, (1, 2, 3, 0))
    ft, act = force_action_t(xt, beta, nt, nx, interpret=interpret)
    force = jnp.transpose(ft, (3, 0, 1, 2)).reshape(shape)
    return force, act


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------
# The training loss differentiates THROUGH the force (d loss / d params
# flows through every leapfrog x-trajectory), so the kernel needs a VJP.
# With F = beta * A^T sin(A x) (A = the linear plaquette map), the exact
# reverse rule is
#     x_bar = beta * A^T( cos(W) * (A gF) ) + gS * F
#     beta_bar = <gF, F>/beta + <gS, S>/beta
# — one extra Wilson-loop pass and one adjoint pass, both fused by XLA.
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def force_action_ad(x, beta, nt: int, nx: int, interpret: bool = False):
    return force_action(x, beta, nt, nx, interpret=interpret)


def _fa_fwd(x, beta, nt, nx, interpret):
    force, act = force_action(x, beta, nt, nx, interpret=interpret)
    return (force, act), (x, beta, force, act)


def _fa_bwd(nt, nx, interpret, res, cot):
    from l2hmc_tpu.ops import lattice_u1 as lat
    x, beta, force, act = res
    g_force, g_act = cot
    w = lat.wilson_loops(x, nt, nx)
    h = lat.wilson_loops(g_force, nt, nx)      # A gF (same linear map)
    x_bar = beta * lat.plaq_adjoint(jnp.cos(w) * h, x.shape)
    x_bar = x_bar + g_act[:, None] * force.reshape(x.shape[0], -1) \
        .reshape(x.shape)
    beta_bar = (
        jnp.vdot(g_force, force) + jnp.vdot(g_act, act)
    ) / beta
    return x_bar, beta_bar.astype(jnp.asarray(beta).dtype)


force_action_ad.defvjp(_fa_fwd, _fa_bwd)
