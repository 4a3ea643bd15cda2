"""Full-pipeline reproduction of the fused-MXU on-device mismatch.

_mxu_bisect.py cleared every sub-stage (transpose, K=64 int8 dot, fwd/inv
four-step, VMP broadcast) — each exact on the chip.  So the mismatch
_mxu_crossover.py caught must come from full-kernel composition: the grid
pipeline, VMEM pressure at full shape, or the tail.  This runs the real
wrappers at small batches and reports WHERE outputs differ:

  batch=8  -> one grid step   (grid pipelining ruled out if exact)
  batch=64 -> eight grid steps

Run: timeout 1700 python _mxu_repro.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.pallas_fused import fused_glwe_product
from poulpy_tpu.backends.pallas_fused_mxu import fused_mxu_glwe_product
from poulpy_tpu.hal.module import get_module

CI, SIZE_A, ROWS, CO, PSIZE, RES_SIZE = 2, 3, 3, 2, 4, 3
BASE2K = 17


def run(n, nprimes, prime_bits, batch):
    m = get_module(n, nprimes, prime_bits)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(
        -(2**16), 2**16, size=(batch, CI, SIZE_A, n), dtype=np.int64))
    pm = np.zeros((ROWS, CI, CO, PSIZE, nprimes, n), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pm[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, n))
    pm = jnp.asarray(pm)

    vpu = np.asarray(jax.block_until_ready(jax.jit(
        lambda a, pm: fused_glwe_product(m, a, pm, RES_SIZE, BASE2K, BASE2K)
    )(a, pm)))
    mxu = np.asarray(jax.block_until_ready(jax.jit(
        lambda a, pm: fused_mxu_glwe_product(
            m, a, pm, RES_SIZE, BASE2K, BASE2K)
    )(a, pm)))

    bad = vpu != mxu
    nb = int(bad.sum())
    print(f"N={n} P={nprimes} batch={batch}: mismatches {nb}/{bad.size}",
          flush=True)
    if nb:
        idx = np.argwhere(bad)
        # pattern: which batch rows / cols / limbs / coeff positions
        for ax, name in enumerate(["batch", "co", "limb", "coef"]):
            u = np.unique(idx[:, ax])
            frag = (f"{u[:8].tolist()}..." if len(u) > 8
                    else f"{u.tolist()}")
            print(f"  {name}: {len(u)} distinct -> {frag}", flush=True)
        i0 = tuple(idx[0])
        print(f"  first at {i0}: vpu={vpu[i0]} mxu={mxu[i0]} "
              f"delta={int(mxu[i0]) - int(vpu[i0])}", flush=True)
    return nb


def main():
    n1 = run(2048, 2, 28, 8)
    run(2048, 2, 28, 64)
    if n1 == 0:
        print("single grid step exact -> grid-composition suspect")


if __name__ == "__main__":
    main()
