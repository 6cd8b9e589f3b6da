"""Torch-CPU SU(3) HMC average-plaquette oracle.

Measures <P> = <Re tr P / 3> with the reference's math (complex128,
autograd staple force, matrix_exp drift, MH accept — reference
dynamics/pytorch/dynamics.py:900-954) at a fixed (beta, L^4) so the JAX
rebuild has a committed physics number to assert against
(tests/test_physics.py::test_su3_plaquette_matches_reference_oracle).

Run once, record the printed value:
  python benchmarks/torch_su3_plaq_oracle.py [beta] [L] [ntherm] [nmeas]

Recorded value (2026-08-17, seed 0, defaults + ntherm=100 nmeas=80):
    plaq = 0.59623 +- 0.00038, acc = 0.965
History: the first recording (60 therm) gave 0.59155 — 1% BELOW the JAX
engine's converged 0.59707(17). Root cause (caught by the cross-check
test): torch.linalg.qr leaves det(Q) at a random phase, so the start was
U(3) rather than SU(3), and the TAH drift preserves each link's det —
the run sampled a different ensemble. The start is now det-corrected;
with it, both implementations agree within combined errors and sit
~0.003 above the infinite-volume literature value 0.59382 (4^4
finite-size shift).
"""
import json
import math
import sys
import time

import torch

from torch_su3_baseline import plaq_action, project_tah, force


def avg_plaq(x: torch.Tensor, nb: int) -> torch.Tensor:
    tot = None
    for u in range(1, 4):
        for v in range(u):
            xu, xv = x[:, u], x[:, v]
            yuv = xu @ torch.roll(xv, -1, dims=u + 1)
            yvu = xv @ torch.roll(xu, -1, dims=v + 1)
            p = (yuv @ yvu.conj().transpose(-2, -1)) \
                .diagonal(dim1=-2, dim2=-1).sum(-1)
            s = p.real.sum(dim=tuple(range(1, p.ndim)))
            tot = s if tot is None else tot + s
    vol = x.shape[2] * x.shape[3] * x.shape[4] * x.shape[5]
    return tot / (6 * 3 * vol)


def random_tah(shape):
    """Exactly the rebuild's ops/su3_soa.random_momentum construction
    (per-coordinate Gaussians on the TAH basis, E|p|^2_F = 8/link)."""
    nbatch = shape[:-2]
    s2 = math.sqrt(0.5)
    s23 = s2 * math.sqrt(1.0 / 3.0)
    n = lambda sc: sc * torch.randn(nbatch, dtype=torch.float64)
    r3, r8 = n(s2), n(s23)
    r01, r02, r12 = n(s2), n(s2), n(s2)
    i01, i02, i12 = n(s2), n(s2), n(s2)
    zero = torch.zeros_like(r3)
    re = torch.stack([
        torch.stack([zero, r01, r02], -1),
        torch.stack([-r01, zero, r12], -1),
        torch.stack([-r02, -r12, zero], -1)], -2)
    im = torch.stack([
        torch.stack([r8 + r3, i01, i02], -1),
        torch.stack([i01, r8 - r3, i12], -1),
        torch.stack([i02, i12, -2 * r8], -1)], -2)
    return torch.complex(re, im)


def kinetic(v):
    n = (v.conj() * v).real.sum(dim=tuple(range(1, v.ndim))) \
        - 8.0 * v.shape[1] * v.shape[2] * v.shape[3] * v.shape[4] * v.shape[5]
    return 0.5 * n


def hmc_step(x, beta, eps, nlf):
    v = random_tah(x.shape)
    h0 = kinetic(v) + plaq_action(x, beta)
    xp, vp = x, v
    for _ in range(nlf):
        vp = vp - 0.5 * eps * force(xp, beta)
        xp = torch.matrix_exp(eps * vp) @ xp
        vp = vp - 0.5 * eps * force(xp, beta)
    h1 = kinetic(vp) + plaq_action(xp, beta)
    acc = torch.exp(torch.clamp(h0 - h1, max=0.0))
    u = torch.rand(acc.shape, dtype=torch.float64)
    m = (acc > u).to(x.real.dtype)[..., None, None, None, None, None, None, None]
    return m * xp + (1.0 - m) * x, acc.mean().item()


def main():
    beta = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ntherm = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    nmeas = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    nb, nlf, eps = 4, 25, 0.02
    torch.manual_seed(0)
    shape = (nb, 4, L, L, L, L, 3, 3)
    a = torch.randn(shape, dtype=torch.complex128) * 0.1
    x, _ = torch.linalg.qr(a + torch.eye(3, dtype=torch.complex128))
    # QR leaves det(Q) at a random phase (U(3), not SU(3)) and the TAH
    # drift preserves det — fix the determinant so the ensemble is SU(3)
    x = x / torch.linalg.det(x)[..., None, None] ** (1.0 / 3.0)
    t0 = time.perf_counter()
    accs = []
    for i in range(ntherm):
        x, acc = hmc_step(x, beta, eps, nlf)
    plaqs = []
    for i in range(nmeas):
        x, acc = hmc_step(x, beta, eps, nlf)
        accs.append(acc)
        plaqs.append(avg_plaq(x, nb).mean().item())
    plaqs_t = torch.tensor(plaqs)
    print(json.dumps({
        "beta": beta, "L": L, "nb": nb, "nlf": nlf, "eps": eps,
        "ntherm": ntherm, "nmeas": nmeas,
        "plaq_mean": round(plaqs_t.mean().item(), 5),
        "plaq_err": round((plaqs_t.std() / math.sqrt(len(plaqs))).item(), 5),
        "acc": round(sum(accs) / len(accs), 3),
        "elapsed_s": round(time.perf_counter() - t0, 1),
    }))


if __name__ == "__main__":
    main()
