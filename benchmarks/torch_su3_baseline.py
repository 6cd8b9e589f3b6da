"""PyTorch-CPU 4D SU(3) leapfrog MD baseline.

The north-star target (BASELINE.json) is ">=10x leapfrog MD steps/sec/chip
over the PyTorch CPU baseline", but the reference repo cannot run here (it
hard-requires hydra/mpi4py). This is an independent torch implementation of
the same MD step the reference executes per leapfrog iteration
(reference dynamics/pytorch/dynamics.py:900-913 leapfrog_hmc:
autograd force through the Wilson plaquette action
(lattice/su3/pytorch/lattice.py:252-308) + torch.matrix_exp gauge drift
(group/su3/pytorch/group.py:45-50)), in the reference's complex128.

Usage: python benchmarks/torch_su3_baseline.py [nchains] [L] [nsteps]
Prints one JSON line with leapfrog MD steps/sec.
"""
import json
import sys
import time

import torch


def plaq_action(x: torch.Tensor, beta: float) -> torch.Tensor:
    """S = -(beta/3) sum Re tr P over the 6 planes."""
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
    return (-beta / 3.0) * tot


def project_tah(f: torch.Tensor) -> torch.Tensor:
    r = 0.5 * (f - f.conj().transpose(-2, -1))
    d = r.diagonal(dim1=-2, dim2=-1).sum(-1) / 3.0
    eye = torch.eye(3, dtype=f.dtype)
    return r - d[..., None, None] * eye


def force(x: torch.Tensor, beta: float) -> torch.Tensor:
    x = x.detach().requires_grad_(True)
    s = plaq_action(x, beta).sum()
    (g,) = torch.autograd.grad(s, x)
    return project_tah(g @ x.conj().transpose(-2, -1))


def leapfrog(x, v, beta, eps):
    v = v - 0.5 * eps * force(x, beta)
    x = torch.matrix_exp(eps * v) @ x
    v = v - 0.5 * eps * force(x, beta)
    return x, v


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    torch.manual_seed(0)
    shape = (nb, 4, L, L, L, L, 3, 3)
    a = torch.randn(shape, dtype=torch.complex128) * 0.1
    x, _ = torch.linalg.qr(a + torch.eye(3, dtype=torch.complex128))
    v = project_tah(torch.randn(shape, dtype=torch.complex128))
    # warm
    x_, v_ = leapfrog(x, v, 6.0, 0.01)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        x_, v_ = leapfrog(x_, v_, 6.0, 0.01)
    elapsed = time.perf_counter() - t0
    rate = nsteps / elapsed
    print(json.dumps({
        "metric": "torch_cpu_su3_leapfrog_md_steps_per_sec",
        "value": round(rate, 3),
        "unit": f"leapfrog MD steps/s ({nb} chains, {L}^4, complex128)",
        "chain_md_rate": round(rate * nb, 3),
    }))


if __name__ == "__main__":
    main()
