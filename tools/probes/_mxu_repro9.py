"""MXU mismatch bisect, stage 9: jit-embedded table CONSTANTS vs runtime
buffers.

Every probe that fed the int8 twiddle tables as runtime pallas_call
arguments is exact on device; the real wrapper converts the host tables
inside the traced function, so under jax.jit they become XLA CONSTANTS.
Hypothesis: constant int8 operands reach the Mosaic kernel with a
different layout/packing than runtime buffers, corrupting everything.

Device check: run the real _pipe_mxu_fn EAGERLY (no outer jit — tables
become runtime device buffers) and compare to the same CPU truth file
repro7 uses.  Eager exact + jitted wrong == constants are the bug.

Run: (after _mxu_repro7.py cpu saved /tmp/mxu7_want.npy)
     timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro9.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split
from poulpy_tpu.backends.pallas_fused_mxu import _pipe_mxu_fn
from poulpy_tpu.hal.primes import ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)
T, CI, RMAX, CO, PSIZE = 8, 2, 3, 2, 4
KK, MDIM = CI * RMAX, CO * PSIZE
RES_SIZE, KR, KA = 3, 17, 17
P = len(PRIMES)
WANT = "/tmp/mxu7_want.npy"


def main():
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**16), 2**16,
                     size=(T * KK, N2, N1)).astype(np.int32)
    pm = np.zeros((P, KK, MDIM, N2, N1), np.int64)
    for i, p in enumerate(PRIMES):
        pm[i] = rng.integers(0, p, size=(KK, MDIM, N2, N1))
    aj = jnp.asarray(a)
    pj = jnp.asarray(pm.astype(np.int32))

    fn = _pipe_mxu_fn(
        N, PRIMES, T, CI, RMAX, RMAX, CO, PSIZE,
        RES_SIZE, KR, KA, 0, 1, False, 0, False, NDIG,
    )
    ref = np.load(WANT)
    dev = np.asarray(jax.block_until_ready(fn(aj, pj)))  # EAGER: no jit
    bad = int((dev != ref).sum())
    print(f"EAGER real _pipe_mxu_fn: exact={bad == 0} "
          f"mismatches={bad}/{dev.size}", flush=True)


if __name__ == "__main__":
    main()
