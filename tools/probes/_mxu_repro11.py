"""MXU mismatch bisect, stage 11: lane-slice vs pair-math, NUMPY oracles.

repro10: planes and the int8 dot are exact on device; the assemble/REDC^2
stage has sparse (0.77%) mismatches vs CPU.  Two candidate culprits, each
probed against an EXACT numpy oracle (no interpret mode involved):

  slice — pa[:, d*n2:(d+1)*n2].reshape(rows, n1, n2) for d=0..3: lane-axis
          slicing at 32-offsets inside a 128-lane register + leading
          reshape, no arithmetic.
  asm   — _assemble_redc on random int32 partials of the dot's range:
          (sum_d p_d 2^{8d}) * 2^{-60} mod p via Python big ints.

Run: timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro11.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split
from poulpy_tpu.backends.pallas_mxu import _assemble_redc
from poulpy_tpu.hal.primes import R, ntt_primes

N = 2048
N1, N2 = _split(N)
P0 = ntt_primes(2, 1 << 28)[0]
QINV = (-pow(P0, -1, R)) % R
ROWS = 48


def main():
    rng = np.random.default_rng(5)
    # ---- probe 1: slicing + reshape only -------------------------------
    pa = rng.integers(-(2**22), 2**22,
                      size=(ROWS * N1, NDIG * N2)).astype(np.int32)

    def slice_kernel(pa_ref, o_ref):
        x = pa_ref[...]
        outs = [x[:, d * N2: (d + 1) * N2].reshape(ROWS, N1, N2)
                for d in range(NDIG)]
        o_ref[...] = jnp.stack(outs, 0).reshape(NDIG * ROWS * N1, N2)

    want = np.stack(
        [pa[:, d * N2: (d + 1) * N2].reshape(ROWS, N1, N2)
         for d in range(NDIG)], 0).reshape(NDIG * ROWS * N1, N2)
    with jax.enable_x64(False):
        f = pl.pallas_call(
            slice_kernel,
            out_shape=jax.ShapeDtypeStruct((NDIG * ROWS * N1, N2),
                                           jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        dev = np.asarray(jax.block_until_ready(jax.jit(f)(jnp.asarray(pa))))
    bad = int((dev != want).sum())
    print(f"slice: exact={bad == 0} mismatches={bad}/{dev.size}", flush=True)

    # ---- probe 2: _assemble_redc on random in-range partials -----------
    ps = [rng.integers(-(2**22), 2**22,
                       size=(ROWS, N1, N2)).astype(np.int32)
          for _ in range(4)]

    def asm_kernel(p0_ref, p1_ref, p2_ref, p3_ref, o_ref):
        o_ref[...] = _assemble_redc(
            p0_ref[...], p1_ref[...], p2_ref[...], p3_ref[...], P0, QINV)

    val = sum(p.astype(object) * (1 << (8 * d)) for d, p in enumerate(ps))
    inv = pow(1 << 60, -1, P0)
    want2 = np.vectorize(lambda v: (int(v) * inv) % P0,
                         otypes=[np.int64])(val).astype(np.int32)
    with jax.enable_x64(False):
        g = pl.pallas_call(
            asm_kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, N1, N2), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        dev2 = np.asarray(jax.block_until_ready(
            jax.jit(g)(*[jnp.asarray(p) for p in ps])))
    bad2 = int((dev2 != want2).sum())
    print(f"asm: exact={bad2 == 0} mismatches={bad2}/{dev2.size}",
          flush=True)
    if bad2:
        idx = tuple(int(i) for i in np.argwhere(dev2 != want2)[0])
        print(f"  first diff at {idx}: dev={dev2[idx]} want={want2[idx]} "
              f"p0..3={[int(p[idx]) for p in ps]}", flush=True)


if __name__ == "__main__":
    main()
