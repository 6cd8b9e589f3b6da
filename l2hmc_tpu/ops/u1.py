"""U(1) gauge group as phase angles.

Pure-function JAX counterpart of the reference's `U1Phase`
(reference src/l2hmc/group/u1/pytorch/group.py:60-165). Links are real
phase angles x with the group element exp(i x); the Lie algebra is R, so
`update_gauge` is addition and momenta are plain Gaussians.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PI = jnp.pi
TWO_PI = 2.0 * jnp.pi

NAME = "U1"
DIM = 2


def exp(x: jax.Array) -> jax.Array:
    """Group element exp(i x) as a complex number (group.py:99-100)."""
    return jax.lax.complex(jnp.cos(x), jnp.sin(x))


def update_gauge(x: jax.Array, p: jax.Array) -> jax.Array:
    """x <- x + p (group.py:102-103)."""
    return x + p


def adjoint(x: jax.Array) -> jax.Array:
    return -x


def mul(a, b, adjoint_a=False, adjoint_b=False):
    """Group multiply in phase representation (group.py:105-119)."""
    a = -a if adjoint_a else a
    b = -b if adjoint_b else b
    return a + b


def trace(x: jax.Array) -> jax.Array:
    return jnp.cos(x)


def diff_trace(x: jax.Array) -> jax.Array:
    return -jnp.sin(x)


def compat_proj(x: jax.Array) -> jax.Array:
    """Wrap angles into (-pi, pi] (group.py:137-138)."""
    return ((x + PI) % TWO_PI) - PI


# projectTAH is the identity for U(1) (group.py:140-153)
def projectTAH(x: jax.Array) -> jax.Array:
    return x


def group_to_vec(x: jax.Array) -> jax.Array:
    """exp(i x) -> [cos x, sin x] concatenated on axis 1 (group.py:86-89)."""
    return jnp.concatenate([jnp.cos(x), jnp.sin(x)], axis=1)


def vec_to_group(x: jax.Array) -> jax.Array:
    """[cos x | sin x] (concatenated halves, as produced by group_to_vec)
    -> phase angles (group.py:91-97)."""
    d = x.shape[-1] // 2
    return jnp.arctan2(x[..., d:], x[..., :d])


def random(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Uniform angles in (-pi, pi] (group.py:158-159)."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return compat_proj(TWO_PI * u)


def random_momentum(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """v ~ N(0, 1) per link (group.py:161-162)."""
    return jax.random.normal(key, shape, dtype=dtype)


def kinetic_energy(v: jax.Array) -> jax.Array:
    """KE = 0.5 * sum v^2 per chain (group.py:164-165)."""
    return 0.5 * jnp.sum(
        jnp.square(v.reshape(v.shape[0], -1)), axis=-1
    )
