"""VPU vs MXU mega-kernel crossover study (VERDICT r2 item 1).

Times fused_glwe_product (VPU butterflies) against fused_mxu_glwe_product
(four-step int8-matmul transforms) at increasing transform weight:
(N=2048, P=2), (N=2048, P=4), (N=4096, P=4).  The MXU path's per-stage
digitize/assemble epilogues are ~fixed per element while its transform
FLOPs ride the systolic array, so it should overtake the VPU kernel once
N and the prime count are large enough.

Run on the TPU:  timeout 590 python _mxu_crossover.py [batch]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.pallas_fused import fused_glwe_product
from poulpy_tpu.backends.pallas_fused_mxu import fused_mxu_glwe_product
from poulpy_tpu.hal.module import get_module

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
CI, SIZE_A, ROWS, CO, PSIZE, RES_SIZE = 2, 3, 3, 2, 4, 3
BASE2K = 17


def bench(n, nprimes, prime_bits):
    m = get_module(n, nprimes, prime_bits)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(
        -(2**16), 2**16, size=(BATCH, CI, SIZE_A, n), dtype=np.int64))
    pm = np.zeros((ROWS, CI, CO, PSIZE, nprimes, n), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pm[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, n))
    pm = jnp.asarray(pm)

    out = {}
    for name, fn in (
        ("vpu", lambda a, pm: fused_glwe_product(
            m, a, pm, RES_SIZE, BASE2K, BASE2K)),
        ("mxu", lambda a, pm: fused_mxu_glwe_product(
            m, a, pm, RES_SIZE, BASE2K, BASE2K)),
    ):
        f = jax.jit(fn)
        o = f(a, pm)
        jax.block_until_ready(o)
        if name == "vpu":
            ref = np.asarray(o)
        else:
            assert np.array_equal(np.asarray(o), ref), "MXU != VPU output"
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(a, pm))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out[name] = BATCH / dt
    win = "MXU" if out["mxu"] > out["vpu"] else "VPU"
    print(f"N={n:5d} P={nprimes} bits={prime_bits}: "
          f"vpu {out['vpu']:10,.0f}/s   mxu {out['mxu']:10,.0f}/s   "
          f"-> {win} wins ({max(out.values())/min(out.values()):.2f}x)")


def main():
    cfgs = {"a": (2048, 2, 28), "b": (2048, 4, 30), "c": (4096, 4, 30)}
    sel = sys.argv[2] if len(sys.argv) > 2 else "abc"
    for key in sel:
        bench(*cfgs[key])


if __name__ == "__main__":
    main()
