"""Primitive-op benchmark sweep — the poulpy-bench analogue.

The reference ships ~26 criterion benches under poulpy-bench/benches/
(vec_znx_*.rs, vec_znx_dft_*.rs, svp_*.rs, vmp_*.rs, convolution.rs)
sweeping log_n. This sweeps the same primitive surface on one TPU chip,
batched (the TPU throughput axis), and prints one JSON line per
(op, log_n) with ops/s (per single un-batched op).

Usage:  python bench_sweep.py [--logn 10 11 12] [--batch 64] [--iters 5]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

BASE2K = 17
SIZE = 3          # ct limbs (k = 51)
DNUM = 3
NPRIMES = 2


def _timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)        # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, nargs="+", default=[10, 11, 12, 13])
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", 64)))
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from poulpy_tpu.hal import dft, vec_znx
    from poulpy_tpu.hal.module import get_module
    from poulpy_tpu.hal.normalization import vec_znx_normalize

    B = args.batch
    rng = np.random.default_rng(0)
    results = []

    for logn in args.logn:
        n = 1 << logn
        module = get_module(n, NPRIMES)
        a = jnp.asarray(
            rng.integers(-(2**40), 2**40, size=(B, SIZE, n), dtype=np.int64)
        )
        b = jnp.asarray(
            rng.integers(-(2**40), 2**40, size=(B, SIZE, n), dtype=np.int64)
        )
        svp_poly = jnp.asarray(rng.integers(-(2**20), 2**20, size=(n,), dtype=np.int64))
        # MatZnx [rows, cols_in, cols_out, size, N] — the keyswitch-shaped VMP
        pmat_raw = jnp.asarray(
            rng.integers(-(2**40), 2**40, size=(DNUM, 1, 2, SIZE, n), dtype=np.int64)
        )

        # --- vec_znx elementwise ops (vec_znx_add.rs / _sub / _negate /
        #     _rotate / _normalize benches) ---
        ops = {
            "vec_znx_add": (jax.jit(lambda x, y: vec_znx.vec_znx_add(x, y)), (a, b)),
            "vec_znx_sub": (jax.jit(lambda x, y: vec_znx.vec_znx_sub(x, y)), (a, b)),
            "vec_znx_rotate": (
                jax.jit(lambda x: vec_znx.vec_znx_rotate(3, x)),
                (a,),
            ),
            "vec_znx_normalize": (
                jax.jit(lambda x: vec_znx_normalize(BASE2K, x)),
                (a,),
            ),
        }

        # --- DFT domain (vec_znx_dft.rs / _idft benches) ---
        xd = dft.dft_apply(module, a)
        ops["vec_znx_dft"] = (jax.jit(lambda x: dft.dft_apply(module, x)), (a,))
        ops["vec_znx_idft"] = (jax.jit(lambda x: dft.idft_apply(module, x)), (xd,))

        # --- SVP (svp_apply.rs) ---
        svp_prep = dft.svp_prepare(module, svp_poly)
        ops["svp_apply"] = (
            jax.jit(lambda xdft, s: dft.svp_apply(module, xdft, s)),
            (xd, svp_prep),
        )

        # --- VMP (vmp_apply.rs): keyswitch-shaped [dnum, 1, 2, size] matrix ---
        pmat = dft.vmp_prepare(module, pmat_raw)
        adft = dft.dft_apply(module, a[:, None, :DNUM, :])   # [B, ci=1, r, P, N]
        ops["vmp_apply"] = (
            jax.jit(lambda x, m: dft.vmp_apply(module, x, m)),
            (adft, pmat),
        )

        # --- negacyclic convolution (convolution.rs) ---
        cl = dft.cnv_prepare_left(module, a)
        cr = dft.cnv_prepare_right(module, b)
        ops["convolution"] = (
            jax.jit(lambda l, r: dft.cnv_apply(module, l, r, 2 * SIZE - 1)),
            (cl, cr),
        )

        for name, (fn, fargs) in ops.items():
            dt = _timeit(fn, fargs, args.iters)
            per_op = dt / B
            rec = {
                "op": name,
                "log_n": logn,
                "batch": B,
                "us_per_op": round(per_op * 1e6, 3),
                "ops_per_s": round(1.0 / per_op, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    return results


if __name__ == "__main__":
    main()
