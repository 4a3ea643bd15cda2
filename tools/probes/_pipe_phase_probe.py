"""On-chip phase timing of the VPU mega-kernel at the bench config.

Builds truncated variants of _kernel_pipe (residues+fwd NTT only; +VMP;
+iNTT; +Garner+normalize = full) and times each on the real chip; the
differences give per-phase device costs that the roofline (see
_roofline_probe.py / BENCH_NOTES) can be checked against.

Run on the TPU:  timeout 590 python _pipe_phase_probe.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends import pallas_fused as pf
from poulpy_tpu.backends.pallas_ntt import _stage_twiddles, lazy_ok
from poulpy_tpu.hal.primes import R, PrimeBasis, ntt_primes

N = 2048
P_BITS = 28
T_TILE = 8
B = int(os.environ.get("PROBE_BATCH", "4096"))
COLS, SIZE_A, RMAX, CO, PSIZE, RES_SIZE = 2, 3, 3, 2, 4, 3
KR = KA = 17


def _kernel_phase(phase, n, logn, primes, qinvs, ninvs, basis,
                  t_tile, cols, size_a, rmax, co, psize, res_size,
                  kr, ka, a_ref, wf_ref, wi_ref, pm_ref, o_ref):
    kk = cols * rmax
    mdim = co * psize
    lazy = lazy_ok(primes)
    i32_cap = 1 << 31
    x = a_ref[...]
    ys = []
    outs = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        if lazy:
            shift = 4 * p
            while shift < (1 << 29):
                shift *= 2
            r = pf._lazy_reduce(x + jnp.int32(shift), (1 << 29) + shift,
                                p, 2 * p)
        else:
            r = jnp.where(x < 0, x + jnp.int32(2 * p), x)
            r = jnp.where(r >= p, r - p, r)
        r = pf._ntt_rows_paired(r, wf_ref, n, logn, p, qinv, pi, lazy)
        if phase == "ntt":
            # consume EVERY row (a row-slice would let Mosaic dead-code
            # eliminate the untaken rows' transforms)
            outs.append(jnp.broadcast_to(
                r.sum(axis=0, keepdims=True), (t_tile * co * res_size, n)))
            continue
        r4 = r.reshape(t_tile, cols, size_a, n)[:, :, :rmax, :]
        r4 = r4.reshape(t_tile, kk, n)
        acc = None
        acc_b = 0
        if lazy:
            for k0 in range(0, kk, 16):
                ks = range(k0, min(k0 + 16, kk))
                hi = lo = None
                for k in ks:
                    ak = r4[:, k, :][:, None, :]
                    bk = pm_ref[pi, 0, k][None, :, :]
                    ph, plo = pf._mul_pair_30x28(ak, bk)
                    if hi is None:
                        hi, lo = ph, plo
                    else:
                        hi, lo = pf._add64(hi, lo, ph, plo)
                t = pf._redc64_pair(hi, lo, p, qinv)
                t_b = ((len(ks) * 2 * p * p) >> 30) + p + 1
                if acc is None:
                    acc, acc_b = t, t_b
                else:
                    acc = acc + t
                    acc_b += t_b
            acc = pf._lazy_reduce(acc, acc_b, p, 2 * p)
        else:
            from poulpy_tpu.backends.pallas_ntt import _add_mod, mont_mul_i32
            for k in range(kk):
                ak = r4[:, k, :][:, None, :]
                bk = pm_ref[pi, 0, k][None, :, :]
                term = mont_mul_i32(ak, bk, p, qinv)
                acc = term if acc is None else _add_mod(acc, term, p)
        y = acc.reshape(t_tile * mdim, n)
        if phase == "vmp":
            outs.append(jnp.broadcast_to(
                y.sum(axis=0, keepdims=True), (t_tile * co * res_size, n)))
            continue
        yi = pf._intt_rows_paired(y, wi_ref, n, logn, p, qinv,
                                  ninvs[pi], pi, lazy)
        if phase == "intt":
            outs.append(jnp.broadcast_to(
                yi.sum(axis=0, keepdims=True), (t_tile * co * res_size, n)))
            continue
        ys.append(yi)
    if phase in ("ntt", "vmp", "intt"):
        o_ref[...] = sum(outs)
        return
    hi, lo = pf.garner_center_pairs(ys, primes, qinvs, basis)
    hi = hi.reshape(t_tile, co, psize, n)
    lo = lo.reshape(t_tile, co, psize, n)
    his = [[hi[:, c, j, :] for j in range(psize)] for c in range(co)]
    los = [[lo[:, c, j, :] for j in range(psize)] for c in range(co)]
    out_rows = []
    for c in range(co):
        out_rows.extend(
            pf.normalize_windows(his[c], los[c], psize, res_size, kr, ka, 0)
        )
    o_ref[...] = jnp.stack(out_rows, axis=1).reshape(
        t_tile * co * res_size, n
    )


@functools.lru_cache(maxsize=None)
def phase_fn(phase):
    primes = ntt_primes(2, 1 << P_BITS)
    n, logn = N, N.bit_length() - 1
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(pow(n, -1, p) * R % p for p in primes)
    basis = PrimeBasis(primes)
    wf = jnp.asarray(_stage_twiddles(primes, n, False, P))
    wi = jnp.asarray(_stage_twiddles(primes, n, True, P))
    kk = COLS * RMAX
    mdim = CO * PSIZE
    rows_a = COLS * SIZE_A
    kernel = functools.partial(
        _kernel_phase, phase, n, logn, primes, qinvs, ninvs, basis,
        T_TILE, COLS, SIZE_A, RMAX, CO, PSIZE, RES_SIZE, KR, KA,
    )

    def fn(a, pm):
        bp = a.shape[0] // rows_a
        grid = (bp // T_TILE,)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((T_TILE * rows_a, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((logn, P, n), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((logn, P, n), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, 1, kk, mdim, n),
                                 lambda bi: (0, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (T_TILE * CO * RES_SIZE, n), lambda bi: (bi, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (bp * CO * RES_SIZE, n), jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(a, wf, wi, pm)

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    primes = ntt_primes(2, 1 << P_BITS)
    a = jnp.asarray(
        rng.integers(-(2**26), 2**26, size=(B * COLS * SIZE_A, N))
        .astype(np.int32)
    )
    pm = jnp.asarray(np.stack(
        [rng.integers(0, p, size=(1, COLS * RMAX, CO * PSIZE, N))
         for p in primes]
    ).astype(np.int32))
    prev = 0.0
    for phase in ("ntt", "vmp", "intt", "full"):
        f = phase_fn(phase)
        o = f(a, pm)
        jax.block_until_ready(o)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(f(a, pm))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        us = dt / B * 1e6
        print(f"{phase:5s}: {dt*1e3:8.2f} ms  {us:6.2f} us/prod  "
              f"(delta {us - prev:+6.2f})")
        prev = us


if __name__ == "__main__":
    main()
