"""MXU-vs-VPU experiment for the batched 3x3 complex matmul (VERDICT r2 #7).

The SU(3) hot op is C[b] = A[b] @ B[b] over a huge batch b of 3x3 complex
matrices with BOTH operands per-element distinct (link products — there is
no shared operand to amortize). The production engine (ops/su3_comp.mm)
evaluates it on the VPU as 3 broadcast complex FMAs (k-contraction
unrolled, batch on the minor (8,128) tile dims). The README's roofline
argument says the MXU (197 TFLOP/s bf16 on v5e) cannot beat this without
an algorithm change, because a 3-sized contraction leaves a 128x128
systolic pass ~2.3% dense. This script turns that argument into a
measurement: every plausible MXU mapping of the SAME op, timed on the real
chip against the production form.

Mappings measured (K repeated mms back-to-back, like a staple chain):
  vpu_comp      ops/su3_comp.mm — production k-broadcast VPU form (f32)
  dot_batched   lax.dot_general with batch dims = b, contraction = k
                (f32 and bf16): XLA chooses the layout; contraction 3
  dot_packed    real 2x2-block complex packing: (b, 3, 6) x (b, 6, 6)
                real dot_general (bf16) — doubles the contraction to 6
                at 2x the FLOPs, still per-element batched
  mxu_blockdiag 21 links packed block-diagonally into one (126, 126)
                tile per group: dense MXU GEMM at 1/21 useful density
                (bf16) — the "make the matrices big" packing

Usage: python benchmarks/mxu_su3_mm.py [nlinks] [K]
Prints one JSON line per mapping: {name, gflops, ms, note}.
Useful-FLOP convention everywhere: one complex 3x3 mm = 216 real FLOPs.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.ops import su3_comp as comp


def _rand_f3(key, L):
    kr, ki = jax.random.split(key)
    shape = (3, 3, *comp.fold_shape(L))
    return comp.F3(jax.random.normal(kr, shape, jnp.float32),
                   jax.random.normal(ki, shape, jnp.float32))


def _roundtrip():
    from l2hmc_tpu.utils.sync import sync
    z = jax.jit(lambda: jnp.zeros((2, 2)))()
    sync(z)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(z)
    return (time.perf_counter() - t0) / 5


def _time(fn, *args, reps=5):
    # axon gotcha: block_until_ready doesn't block across the tunnel —
    # sync via a device->host readback and subtract the tunnel roundtrip
    from l2hmc_tpu.utils.sync import sync
    out = fn(*args)
    sync(out)
    rt = _roundtrip()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return max((time.perf_counter() - t0 - rt) / reps, 1e-9)


def bench_vpu_comp(L, K):
    a = _rand_f3(jax.random.PRNGKey(0), L)
    b = _rand_f3(jax.random.PRNGKey(1), L)

    @jax.jit
    def chain(a, b):
        def body(c, _):
            return comp.mm(c, b), None
        c, _ = jax.lax.scan(body, a, None, length=K)
        return c

    return _time(chain, a, b)


def _rand_c(key, L, dtype):
    kr, ki = jax.random.split(key)
    return (jax.random.normal(kr, (L, 3, 3), dtype)
            + 1j * jax.random.normal(ki, (L, 3, 3), dtype)
            ).astype(jnp.complex64)


def bench_dot_batched(L, K, dtype):
    # real-pair complex mm via 4 batched dot_generals (complex64 hangs the
    # axon TPU compiler — su3_comp.py module docstring)
    kr = jax.random.PRNGKey(0)
    ar = jax.random.normal(kr, (L, 3, 3), dtype)
    ai = jax.random.normal(jax.random.PRNGKey(1), (L, 3, 3), dtype)
    br = jax.random.normal(jax.random.PRNGKey(2), (L, 3, 3), dtype)
    bi = jax.random.normal(jax.random.PRNGKey(3), (L, 3, 3), dtype)

    dn = (((2,), (1,)), ((0,), (0,)))  # contract k; batch dim 0

    def cmm(ar, ai, br, bi):
        rr = jax.lax.dot_general(ar, br, dn)
        ii = jax.lax.dot_general(ai, bi, dn)
        ri = jax.lax.dot_general(ar, bi, dn)
        ir = jax.lax.dot_general(ai, br, dn)
        return rr - ii, ri + ir

    @jax.jit
    def chain(ar, ai, br, bi):
        def body(c, _):
            cr, ci = cmm(c[0], c[1], br, bi)
            return (cr, ci), None
        (cr, ci), _ = jax.lax.scan(body, (ar, ai), None, length=K)
        return cr, ci

    return _time(chain, ar, ai, br, bi)


def bench_dot_packed(L, K):
    """Complex mm as ONE real dot_general per step: A -> (L, 3, 6) with
    interleaved [re, -im] pairs, B -> (L, 6, 6) in the 2x2 rotation-block
    complex representation; contraction dim 6 (still tiny vs 128)."""
    f = jnp.float32
    ar = jax.random.normal(jax.random.PRNGKey(0), (L, 3, 3), f)
    ai = jax.random.normal(jax.random.PRNGKey(1), (L, 3, 3), f)
    br = jax.random.normal(jax.random.PRNGKey(2), (L, 3, 3), f)
    bi = jax.random.normal(jax.random.PRNGKey(3), (L, 3, 3), f)
    bf = jnp.bfloat16

    def pack_a(ar, ai):
        # (L, 3, 3, 2): [.., 0] = re, [.., 1] = im -> (L, 3, 6)
        return jnp.stack([ar, ai], axis=-1).reshape(L, 3, 6).astype(bf)

    def pack_b(br, bi):
        # k-major rows: row 2k = [re row interleaved], row 2k+1 = [-im ...]
        top = jnp.stack([br, bi], axis=-1).reshape(L, 3, 6)
        bot = jnp.stack([-bi, br], axis=-1).reshape(L, 3, 6)
        return jnp.stack([top, bot], axis=2).reshape(L, 6, 6).astype(bf)

    dn = (((2,), (1,)), ((0,), (0,)))

    @jax.jit
    def chain(ar, ai, br, bi):
        bpk = pack_b(br, bi)

        def body(c, _):
            cr, ci = c
            out = jax.lax.dot_general(pack_a(cr, ci), bpk, dn,
                                      preferred_element_type=jnp.float32)
            out = out.reshape(L, 3, 3, 2)
            return (out[..., 0], out[..., 1]), None

        (cr, ci), _ = jax.lax.scan(body, (ar, ai), None, length=K)
        return cr, ci

    return _time(chain, ar, ai, br, bi)


def bench_mxu_blockdiag(L, K, nblk=21):
    """Pack nblk links block-diagonally into (6*nblk, 6*nblk) real tiles
    (2x2 complex rep) and run dense GEMMs: the MXU runs at full clip but
    only the diagonal blocks are useful => 1/nblk useful density."""
    f = jnp.float32
    G = L // nblk
    D = 6 * nblk
    a = jax.random.normal(jax.random.PRNGKey(0), (G, D, D), f)
    b = jax.random.normal(jax.random.PRNGKey(1), (G, D, D), f)
    bf = jnp.bfloat16
    dn = (((2,), (1,)), ((0,), (0,)))

    @jax.jit
    def chain(a, b):
        bb = b.astype(bf)

        def body(c, _):
            out = jax.lax.dot_general(c.astype(bf), bb, dn,
                                      preferred_element_type=jnp.float32)
            return out, None

        c, _ = jax.lax.scan(body, a, None, length=K)
        return c

    return _time(chain, a, b)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128 * 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    useful = 216.0 * L * K  # real FLOPs of K batched complex 3x3 mms
    rows = []

    t = bench_vpu_comp(L, K)
    rows.append({"name": "vpu_comp_f32", "gflops": useful / t / 1e9,
                 "ms": t * 1e3, "note": "production ops/su3_comp.mm"})

    for dtype, nm in ((jnp.float32, "dot_batched_f32"),
                      (jnp.bfloat16, "dot_batched_bf16")):
        t = bench_dot_batched(L, K, dtype)
        rows.append({"name": nm, "gflops": useful / t / 1e9, "ms": t * 1e3,
                     "note": "lax.dot_general batch=L contract=3 (4 real)"})

    t = bench_dot_packed(L, K)
    rows.append({"name": "dot_packed_bf16", "gflops": useful / t / 1e9,
                 "ms": t * 1e3,
                 "note": "2x2-block real packing, contract=6, 2x FLOPs"})

    t = bench_mxu_blockdiag(L, K)
    rows.append({"name": "mxu_blockdiag_bf16",
                 "gflops": useful / t / 1e9, "ms": t * 1e3,
                 "note": "21 links/tile block-diag (126^2), 1/21 density"})

    for r in rows:
        print(json.dumps(r))
    best = max(rows, key=lambda r: r["gflops"])
    print(json.dumps({"winner": best["name"],
                      "gflops": round(best["gflops"], 1),
                      "devices": [str(d) for d in jax.devices()]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
