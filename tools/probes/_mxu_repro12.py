"""MXU mismatch bisect, stage 12: the dot→slice fusion, with workarounds.

repro11: lane-offset slicing alone is exact; _assemble_redc alone is
exact.  repro10: dot → slice → assemble composed is WRONG (sparse).  So
the miscompile lives in consuming the MXU dot's int32 accumulator through
lane-offset slices in the same kernel.  Three variants vs a numpy oracle:

  direct  — dot8 → column slices → assemble (repro10 asma; expect FAIL)
  scratch — dot8 result stored to a VMEM scratch ref and re-read before
            slicing (forces layout normalization)
  split   — four separate dot8 calls against pre-split table column
            blocks (no slicing of a dot output at all)

Run: timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro12.py
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
from poulpy_tpu.backends.pallas_mxu import _assemble_redc, _dot8
from poulpy_tpu.hal.primes import R, ntt_primes

N = 2048
N1, N2 = _split(N)
P0 = ntt_primes(2, 1 << 28)[0]
QINV = (-pow(P0, -1, R)) % R
ROWS = 48
K = NDIG * N2


def oracle(lhs, tab):
    pa = lhs.astype(np.int64) @ tab.astype(np.int64)
    ps = [pa[:, d * N2: (d + 1) * N2].reshape(ROWS, N1, N2)
          for d in range(NDIG)]
    val = sum(p.astype(object) * (1 << (8 * d)) for d, p in enumerate(ps))
    inv = pow(1 << 60, -1, P0)
    return np.vectorize(lambda v: (int(v) * inv) % P0,
                        otypes=[np.int64])(val).astype(np.int32)


def main():
    rng = np.random.default_rng(9)
    lhs = rng.integers(-128, 128, size=(ROWS * N1, K)).astype(np.int8)
    tab = rng.integers(-128, 128, size=(K, K)).astype(np.int8)
    want = oracle(lhs, tab)
    lj, tj = jnp.asarray(lhs), jnp.asarray(tab)

    def direct_kernel(l_ref, t_ref, o_ref):
        pa = _dot8(l_ref[...], t_ref[...])
        ps = [pa[:, d * N2: (d + 1) * N2].reshape(ROWS, N1, N2)
              for d in range(NDIG)]
        o_ref[...] = _assemble_redc(*ps, P0, QINV)

    def scratch_kernel(l_ref, t_ref, o_ref, s_ref):
        s_ref[...] = _dot8(l_ref[...], t_ref[...])
        pa = s_ref[...]
        ps = [pa[:, d * N2: (d + 1) * N2].reshape(ROWS, N1, N2)
              for d in range(NDIG)]
        o_ref[...] = _assemble_redc(*ps, P0, QINV)

    def split_kernel(l_ref, t_ref, o_ref):
        ps = [_dot8(l_ref[...],
                    t_ref[...][:, d * N2: (d + 1) * N2]
                    ).reshape(ROWS, N1, N2)
              for d in range(NDIG)]
        o_ref[...] = _assemble_redc(*ps, P0, QINV)

    out_shape = jax.ShapeDtypeStruct((ROWS, N1, N2), jnp.int32)
    for name, kern, scratch in (
        ("direct", direct_kernel, None),
        ("scratch", scratch_kernel,
         [pltpu.VMEM((ROWS * N1, K), jnp.int32)]),
        ("split", split_kernel, None),
    ):
        with jax.enable_x64(False):
            f = pl.pallas_call(
                kern,
                out_shape=out_shape,
                scratch_shapes=scratch or [],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            dev = np.asarray(jax.block_until_ready(jax.jit(f)(lj, tj)))
        bad = int((dev != want).sum())
        print(f"{name}: exact={bad == 0} mismatches={bad}/{dev.size}",
              flush=True)


if __name__ == "__main__":
    main()
