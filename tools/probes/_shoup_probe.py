"""Harvey/Shoup vs Montgomery twiddle butterflies: on-device A/B.

Times fused_glwe_product at the headline config (N=2048, P=2, 28-bit lazy
primes, B=16384) with POULPY_TPU_SHOUP=0 vs 1 and asserts bit-equality of
the two kernels ON THE DEVICE; then repeats correctness-only at the strict
(30-bit, P=4) config.  Run: timeout 3000 python _shoup_probe.py [batch]
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
from poulpy_tpu.hal.module import get_module

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
CI, SIZE_A, ROWS, CO, PSIZE, RES_SIZE = 2, 3, 3, 2, 4, 3
BASE2K = 17


def run(n, nprimes, prime_bits, batch, timed):
    m = get_module(n, nprimes, prime_bits)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(
        -(2**16), 2**16, size=(batch, CI, SIZE_A, n), dtype=np.int64))
    pm = np.zeros((ROWS, CI, CO, PSIZE, nprimes, n), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pm[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, n))
    pm = jnp.asarray(pm)

    out = {}
    ref = None
    for mode in ("0", "1"):
        os.environ["POULPY_TPU_SHOUP"] = mode
        f = jax.jit(lambda a, pm: fused_glwe_product(
            m, a, pm, RES_SIZE, BASE2K, BASE2K))
        o = jax.block_until_ready(f(a, pm))
        if ref is None:
            ref = np.asarray(o)
        else:
            assert np.array_equal(np.asarray(o), ref), \
                f"shoup != mont on device (N={n} P={nprimes} b={prime_bits})"
        if timed:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    o = f(a, pm)
                jax.block_until_ready(o)
                ts.append(time.perf_counter() - t0)
            out[mode] = batch * 5 / min(ts)
    if timed:
        print(f"N={n} P={nprimes} bits={prime_bits} B={batch}: "
              f"mont {out['0']:10,.0f}/s   shoup {out['1']:10,.0f}/s   "
              f"({out['1'] / out['0']:.3f}x)", flush=True)
    else:
        print(f"N={n} P={nprimes} bits={prime_bits} B={batch}: "
              "bit-exact shoup==mont on device", flush=True)


def main():
    run(2048, 2, 28, BATCH, timed=True)
    run(2048, 4, 30, 256, timed=False)


if __name__ == "__main__":
    main()
