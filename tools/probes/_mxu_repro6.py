"""MXU mismatch: which kernel is actually wrong on the device?

Everything so far compared device outputs against interpret mode running
IN THE SAME TPU PROCESS (plain XLA ops on the chip) — not against ground
truth.  Chain of equalities known: CPU MXU == CPU VPU; device MXU(Mosaic)
== device MXU(interpret-on-tpu).  Missing link: device vs CPU.

  phase cpu:  JAX_PLATFORMS=cpu — compute the reference output with the
              VPU wrapper in interpret mode, save to /tmp/mxu_want.npy
  phase tpu:  run BOTH wrappers on the chip, compare each to the file

Run:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python _mxu_repro6.py cpu
      timeout 1700 python _mxu_repro6.py tpu
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

N = 2048
ROWS, CI, CO, PSIZE, RES_SIZE = 3, 2, 2, 4, 3
BATCH = 8
WANT = "/tmp/mxu_want.npy"


def inputs(m):
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**16), 2**16, size=(BATCH, CI, 3, N),
                     dtype=np.int64)
    pmat = np.zeros((ROWS, CI, CO, PSIZE, m.nprimes, N), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pmat[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, N))
    return jnp.asarray(a), jnp.asarray(pmat)


def main():
    phase = sys.argv[1]
    from poulpy_tpu.backends.pallas_fused import fused_glwe_product
    from poulpy_tpu.backends.pallas_fused_mxu import fused_mxu_glwe_product
    from poulpy_tpu.hal.module import get_module

    m = get_module(N, 2, 28)
    aj, pj = inputs(m)

    if phase == "cpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            want = np.asarray(
                fused_glwe_product(m, aj, pj, RES_SIZE, 17, 17))
            mxu = np.asarray(
                fused_mxu_glwe_product(m, aj, pj, RES_SIZE, 17, 17))
        assert np.array_equal(want, mxu), "CPU VPU != CPU MXU ?!"
        np.save(WANT, want)
        print("cpu ground truth saved; VPU==MXU on cpu", flush=True)
        return

    want = np.load(WANT)
    vpu = np.asarray(jax.block_until_ready(jax.jit(
        lambda a, pm: fused_glwe_product(m, a, pm, RES_SIZE, 17, 17)
    )(aj, pj)))
    mxu = np.asarray(jax.block_until_ready(jax.jit(
        lambda a, pm: fused_mxu_glwe_product(m, a, pm, RES_SIZE, 17, 17)
    )(aj, pj)))
    for name, got in (("vpu", vpu), ("mxu", mxu)):
        bad = int((got != want).sum())
        print(f"device {name} vs cpu truth: exact={bad == 0} "
              f"mismatches={bad}/{got.size}", flush=True)


if __name__ == "__main__":
    main()
