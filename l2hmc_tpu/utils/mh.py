"""NaN-robust Metropolis-Hastings acceptance.

A diverged trajectory (e.g. f32 overflow in the order-8 Taylor expm at
too-large eps on rough configs) yields a non-finite dH. The naive
exp(min(dh, 0)) then produces acc = NaN, the arithmetic state blend
mb*xp + (1-mb)*x multiplies NaN into the KEPT state, and the whole
chain is destroyed. The correct MH semantics: a non-finite proposal has
H = +inf and is REJECTED with probability 1.

The reference hit the same failure class and patched it with external
nan_to_num autograd hooks (SURVEY hard-parts #1, reference dynamics
DDP found_unused_parameters notes); here rejection is built into the
kernel. Pair `accept_prob` with a `where`-based blend (select, not
multiply) so rejected NaN proposals cannot leak through 0 * NaN.
"""
import jax.numpy as jnp

__all__ = ["accept_prob", "select"]


def accept_prob(dh):
    """exp(min(dh, 0)) with non-finite dh treated as reject (acc = 0)."""
    neg_inf = jnp.asarray(-jnp.inf, dh.dtype)
    dh = jnp.where(jnp.isfinite(dh), dh, neg_inf)
    return jnp.exp(jnp.minimum(dh, 0.0))


def select(acc_mask, prop, init):
    """Per-chain state select: prop where accepted else init, broadcast
    over the non-chain dims. `where`, NOT an arithmetic blend — 0 * NaN
    would propagate a rejected diverged proposal into the kept state."""
    shape = (-1,) + (1,) * (prop.ndim - 1)
    return jnp.where(acc_mask.reshape(shape) > 0.5, prop, init)
