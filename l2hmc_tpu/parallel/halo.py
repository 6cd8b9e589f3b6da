"""Halo exchange: ±1 rolls across a mesh-sharded lattice axis.

Lattice-domain decomposition is this rebuild's "context parallelism":
the reference never shards the lattice (a 4D SU(3) field lives whole on
each rank — reference configs.py:496-518; SURVEY.md §5), which caps the
volume at one device's memory. Here a lattice axis (conventionally t)
shards over a 'lattice' mesh axis, and the ±1 neighbor shifts that the
plaquette/staple sums need become a local roll + a one-slab
`jax.lax.ppermute` over ICI — the standard nearest-neighbor halo pattern.

Usage (inside shard_map over mesh axes ('data', 'lattice')):

    roll = make_sharded_roll('lattice', sharded_axis=1)
    ps, _ = lattice_su3.wilson_loops(x_local, local_vol, roll=roll)

All rolls the gauge action needs are shift = ±1 composed; larger shifts
compose (|shift| applications) but are not needed here.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _axis_size(axis_name: str) -> int:
    return jax.lax.axis_size(axis_name)


def roll_halo(x: jax.Array, shift: int, axis: int, axis_name: str) -> jax.Array:
    """Global circular roll by `shift` in {-1, +1} along a dimension whose
    global extent is sharded over mesh axis `axis_name`.

    Shard i holds slab [i*L, (i+1)*L). For shift = -1 (out[t] = x[t+1]):
    rows 0..L-2 shift locally; row L-1 comes from the NEXT shard's row 0,
    i.e. every shard sends its first row to its left neighbor.
    """
    n = _axis_size(axis_name)
    if shift == 0 or n == 1:
        return jnp.roll(x, shift, axis=axis)
    assert shift in (-1, 1), "halo roll supports +-1 shifts (compose for more)"
    local = jnp.roll(x, shift, axis=axis)
    L = x.shape[axis]
    idx_first = [slice(None)] * x.ndim
    if shift == -1:
        # send first row left: perm j -> j-1
        idx_first[axis] = slice(0, 1)
        slab = x[tuple(idx_first)]
        perm = [(j, (j - 1) % n) for j in range(n)]
        recv = jax.lax.ppermute(slab, axis_name, perm)
        dst = [slice(None)] * x.ndim
        dst[axis] = slice(L - 1, L)
        return local.at[tuple(dst)].set(recv)
    else:
        # send last row right: perm j -> j+1
        idx_first[axis] = slice(L - 1, L)
        slab = x[tuple(idx_first)]
        perm = [(j, (j + 1) % n) for j in range(n)]
        recv = jax.lax.ppermute(slab, axis_name, perm)
        dst = [slice(None)] * x.ndim
        dst[axis] = slice(0, 1)
        return local.at[tuple(dst)].set(recv)


def make_sharded_roll(axis_name: str, sharded_axis: int) -> Callable:
    """A jnp.roll-compatible roll that halo-exchanges on `sharded_axis`
    and falls back to jnp.roll on every other axis."""

    def roll(x, shift, axis):
        if axis == sharded_axis:
            return roll_halo(x, shift, axis, axis_name)
        return jnp.roll(x, shift, axis=axis)

    return roll
