"""MXU mismatch bisect, stage 7: the REAL _pipe_mxu_fn vs repro3's body.

repro3 (2026-08-20, after the prime fix) proved the full kernel BODY —
fwd, vmp, inv, garner, normalize — is bit-exact device-vs-interpret
under grid=(1,) whole-array BlockSpecs.  repro6 proved the public
wrapper is wrong on device (98303/98304) while the VPU wrapper is exact
vs CPU truth.  Remaining delta: _pipe_mxu_fn's pallas_call config
(block-indexed specs, partial-bound kernel) and the wrapper's host-side
transforms (σ gather, N→(n2,n1) reshape).

This probe calls the REAL _pipe_mxu_fn at bp == t_tile (grid=(1,)) with
synthetic kernel-layout inputs (same distribution as repro3): device vs
interpret.  FAIL → config bug; PASS → host-side transform bug.

Two-phase (interpret of the full kernel over the TPU tunnel is too
slow to finish): compute the truth on CPU, then device-only compare.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
       python tools/probes/_mxu_repro7.py cpu
     timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro7.py tpu
"""

import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split
from poulpy_tpu.backends.pallas_fused_mxu import _pipe_mxu_fn
from poulpy_tpu.hal.primes import ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)
T, CI, RMAX, CO, PSIZE = 8, 2, 3, 2, 4
KK = CI * RMAX
MDIM = CO * PSIZE
RES_SIZE, KR, KA = 3, 17, 17
P = len(PRIMES)


WANT = "/tmp/mxu7_want.npy"


def main():
    phase = sys.argv[1]
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
    if phase == "cpu":
        with pltpu.force_tpu_interpret_mode():
            ref = np.asarray(fn(aj, pj))
        np.save(WANT, ref)
        print("cpu truth saved", flush=True)
        return
    ref = np.load(WANT)
    dev = np.asarray(jax.block_until_ready(jax.jit(fn)(aj, pj)))
    bad = int((dev != ref).sum())
    print(f"real _pipe_mxu_fn grid=1: exact={bad == 0} "
          f"mismatches={bad}/{dev.size}", flush=True)


if __name__ == "__main__":
    main()
