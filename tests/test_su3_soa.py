"""SoA SU(3) engine vs the complex AoS implementation (exact oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.ops import su3 as g
from l2hmc_tpu.ops import lattice_su3 as lat
from l2hmc_tpu.ops import su3_soa as soa

VOL = (2, 2, 2, 4)
NB = 3
SHAPE = (NB, 4, *VOL, 3, 3)


@pytest.fixture(scope="module")
def xc():
    return g.random(jax.random.PRNGKey(0), SHAPE, dtype=jnp.complex128)


@pytest.fixture(scope="module")
def xs(xc):
    # complex AoS (nb, d, t, x, y, z, 3, 3) -> SoA batch (d, t, x, y, z, nb)
    xt = jnp.moveaxis(xc, 0, -3)  # (d,t,x,y,z, nb, 3,3)
    return soa.from_complex(xt)


def to_aos(m):
    """SoA lattice field -> complex (nb, d, t, x, y, z, 3, 3)."""
    c = soa.to_complex(m)          # (d,t,x,y,z,nb,3,3)
    return jnp.moveaxis(c, -3, 0)


def test_roundtrip(xc, xs):
    np.testing.assert_allclose(np.asarray(to_aos(xs)), np.asarray(xc))


def test_mm_variants(xc, xs):
    a = soa.M3(xs.re, xs.im)
    for adj_a in (False, True):
        for adj_b in (False, True):
            got = to_aos(soa.mm(a, a, adj_a, adj_b))
            aa = jnp.swapaxes(xc.conj(), -2, -1) if adj_a else xc
            bb = jnp.swapaxes(xc.conj(), -2, -1) if adj_b else xc
            np.testing.assert_allclose(np.asarray(got), np.asarray(aa @ bb),
                                       atol=1e-13)


def test_projectTAH(xc, xs):
    got = to_aos(soa.projectTAH(xs))
    want = g.projectTAH(xc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-13)


def test_expm(xs):
    v = soa.projectTAH(xs)
    got = to_aos(soa.expm(v))
    want = g.expm(to_aos(v), s=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_norm2_kinetic(xc, xs):
    np.testing.assert_allclose(
        np.asarray(soa.norm2(xs)),
        np.asarray(jnp.sum(jnp.abs(xc) ** 2, axis=(-2, -1))
                   .transpose(1, 2, 3, 4, 5, 0)),
        rtol=1e-13)
    vc = g.random_momentum(jax.random.PRNGKey(1), SHAPE, dtype=jnp.complex128)
    vs = soa.from_complex(jnp.moveaxis(vc, 0, -3))
    np.testing.assert_allclose(np.asarray(soa.kinetic_energy(vs)),
                               np.asarray(g.kinetic_energy(vc)), rtol=1e-12)


def test_action_matches(xc, xs):
    got = soa.action(xs, 2.0)
    want = lat.action(xc, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-13)


def test_force_matches(xc, xs):
    got = to_aos(soa.grad_action(xs, 1.7))
    want = lat.grad_action(xc, 1.7, VOL)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_det3x3(xc, xs):
    dre, dim = soa.det3x3(xs)
    want = np.linalg.det(np.asarray(xc)).transpose(1, 2, 3, 4, 5, 0)
    np.testing.assert_allclose(np.asarray(dre), want.real, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dim), want.imag, atol=1e-12)


def test_projectSU(xs):
    # perturb off the group, project back, compare with the AoS projector
    pert = soa.M3(xs.re + 0.05, xs.im - 0.03)
    got = to_aos(soa.projectSU(pert))
    want = g.projectSU(to_aos(pert))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_group_to_vec(xc, xs):
    got = soa.group_to_vec(xs)             # (8, d,t,x,y,z,nb)
    want = g.group_to_vec(xc)              # (nb, d,t,x,y,z, 8)
    want_t = np.moveaxis(np.moveaxis(np.asarray(want), -1, 0), 1, -1)
    np.testing.assert_allclose(np.asarray(got), want_t, atol=1e-11)


def test_random_momentum_soa():
    v = soa.random_momentum(jax.random.PRNGKey(5), (4, 2, 2, 2, 4, 3),
                            dtype=jnp.float64)
    # TAH: anti-hermitian + traceless
    re, im = np.asarray(v.re), np.asarray(v.im)
    np.testing.assert_allclose(re, -re.transpose(1, 0, *range(2, re.ndim)),
                               atol=1e-14)
    np.testing.assert_allclose(im, im.transpose(1, 0, *range(2, im.ndim)),
                               atol=1e-14)
    np.testing.assert_allclose(im[0, 0] + im[1, 1] + im[2, 2], 0, atol=1e-14)
    # normalization: E[norm2] = 8
    n2 = float(np.mean(np.asarray(soa.norm2(v))))
    assert abs(n2 - 8.0) < 0.2


def test_hmc_trajectory_matches(xc, xs):
    vc = g.random_momentum(jax.random.PRNGKey(2), SHAPE, dtype=jnp.complex128)
    vs = soa.from_complex(jnp.moveaxis(vc, 0, -3))
    xp_s, vp_s, dh_s = soa.hmc_trajectory(xs, vs, 2.0, 0.01, 3)

    def body(carry, _):
        x_, v_, f_ = carry
        v1 = v_ - 0.5 * 0.01 * f_
        xp = g.update_gauge(x_, 0.01 * v1)
        f2 = lat.grad_action(xp, 2.0, VOL)
        v2 = v1 - 0.5 * 0.01 * f2
        return (xp, v2, f2), None

    f0 = lat.grad_action(xc, 2.0, VOL)
    (xp_r, vp_r, _), _ = jax.lax.scan(body, (xc, vc, f0), None, length=3)
    h0 = g.kinetic_energy(vc) + lat.action(xc, 2.0, VOL)
    h1 = g.kinetic_energy(vp_r) + lat.action(xp_r, 2.0, VOL)
    np.testing.assert_allclose(np.asarray(to_aos(xp_s)), np.asarray(xp_r),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(dh_s), np.asarray(h0 - h1),
                               atol=1e-9)
