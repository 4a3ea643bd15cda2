"""Isolate forward vs inverse paired-NTT cost on identical shapes.

The pipe phase probe showed fwd(48 rows) ~ 2.6x inv(64 rows) — this times
_ntt_rows_paired / _intt_rows_paired alone on the same [64, 2048] input,
plus the residues prep, to find the asymmetry.
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
from poulpy_tpu.backends.pallas_ntt import _stage_twiddles
from poulpy_tpu.hal.primes import R, ntt_primes

N = 2048
ROWS = 64
REPS = 4   # transforms per kernel invocation (amortizes load/store)


def make(kind):
    primes = ntt_primes(2, 1 << 28)
    n, logn = N, 11
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(pow(n, -1, p) * R % p for p in primes)
    wf = jnp.asarray(_stage_twiddles(primes, n, False, P))
    wi = jnp.asarray(_stage_twiddles(primes, n, True, P))

    def kernel(x_ref, wf_ref, wi_ref, o_ref):
        x = x_ref[...]
        for pi, p in enumerate(primes):
            for _ in range(REPS):
                if kind == "fwd":
                    x = pf._ntt_rows_paired(x, wf_ref, n, logn, p,
                                            qinvs[pi], pi, True)
                elif kind == "inv":
                    x = pf._intt_rows_paired(x, wi_ref, n, logn, p,
                                             qinvs[pi], pi, ninvs[pi], True)
                elif kind == "res":
                    shift = 4 * p
                    while shift < (1 << 29):
                        shift *= 2
                    x = pf._lazy_reduce(x + jnp.int32(shift),
                                        (1 << 29) + shift, p, 2 * p)
                    x = x - jnp.int32(p)
        o_ref[...] = x

    def fn(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=(x.shape[0] // ROWS,),
                in_specs=[
                    pl.BlockSpec((ROWS, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((logn, 2, n), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((logn, 2, n), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((ROWS, n), lambda bi: (bi, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(x, wf, wi)

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 28, size=(4096, N)).astype(np.int32)
    )
    n_tr = 4096 * 2 * REPS  # rows-blocks x primes x reps
    for kind in ("res", "fwd", "inv"):
        f = make(kind)
        jax.block_until_ready(f(x))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"{kind}: {dt*1e3:7.2f} ms -> {dt/ n_tr * 1e9:7.1f} ns "
              f"per row-transform (2048 lanes)")


if __name__ == "__main__":
    main()
