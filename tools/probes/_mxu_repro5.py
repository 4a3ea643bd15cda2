"""MXU mismatch: is it the prep+kernel FUSION inside one jit?

Everything is exact in isolation (kernel body incl. full tail under real
specs; wrapper XLA prep).  Remaining suspect: when the sigma-gather /
layout prep and the pallas custom call compile in ONE jit, XLA may hand
the kernel a non-default operand layout.  Compare against the trusted VPU
wrapper:

  A. normal fused_mxu_glwe_product (prep + kernel in one jit)  [expect bad]
  B. host-numpy prep, _pipe_mxu_fn called directly under jit
  C. prep in its own jit, kernel in another (device round trip between)

Run: timeout 1700 python _mxu_repro5.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split, sigma_from_hal
from poulpy_tpu.backends.pallas_fused import fused_glwe_product, \
    pm_kernel_layout
from poulpy_tpu.backends.pallas_fused_mxu import _pipe_mxu_fn, \
    fused_mxu_glwe_product
from poulpy_tpu.hal.module import get_module

N = 2048
N1, N2 = _split(N)
ROWS, CI, CO, PSIZE, RES_SIZE = 3, 2, 2, 4, 3
BATCH = 8


def main():
    m = get_module(N, 2, 28)
    P = m.nprimes
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**16), 2**16, size=(BATCH, CI, 3, N),
                     dtype=np.int64)
    pmat = np.zeros((ROWS, CI, CO, PSIZE, P, N), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pmat[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, N))
    aj, pj = jnp.asarray(a), jnp.asarray(pmat)

    want = np.asarray(jax.block_until_ready(jax.jit(
        lambda a, pm: fused_glwe_product(m, a, pm, RES_SIZE, 17, 17)
    )(aj, pj)))

    def rep(name, got):
        got = np.asarray(got)
        bad = int((got != want).sum())
        print(f"{name}: exact={bad == 0} mismatches={bad}/{got.size}",
              flush=True)

    # A: the normal wrapper
    rep("A normal wrapper", jax.block_until_ready(jax.jit(
        lambda a, pm: fused_mxu_glwe_product(m, a, pm, RES_SIZE, 17, 17)
    )(aj, pj)))

    # B: host-numpy prep, kernel-only jit
    sig = sigma_from_hal(m.basis.primes, N)
    perm = pmat[..., sig]
    pmk = np.moveaxis(perm, 4, 0)
    pmk = np.swapaxes(pmk, 1, 2).reshape(P, CI * ROWS, CO * PSIZE, N)
    pmk = pmk.astype(np.int32).reshape(P, CI * ROWS, CO * PSIZE, N2, N1)
    a32 = a.reshape(BATCH, CI * 3, N).astype(np.int32).reshape(
        BATCH * CI * 3, N2, N1)
    fn = _pipe_mxu_fn(N, m.basis.primes, 8, CI, 3, 3, CO, PSIZE,
                      RES_SIZE, 17, 17, 0, 1, False, 0, False, NDIG)
    out_b = jax.block_until_ready(jax.jit(fn)(
        jnp.asarray(a32), jnp.asarray(pmk)))
    out_b = np.asarray(out_b).reshape(BATCH, CO, RES_SIZE, N).astype(
        np.int64)
    rep("B host prep + kernel-only jit", out_b)

    # C: prep jit -> device arrays -> kernel jit
    sig_j = jnp.asarray(sig)

    @jax.jit
    def prep(a, pmat):
        pm = pm_kernel_layout(pmat[..., sig_j], ROWS)
        pm = pm.reshape(P, CI * ROWS, CO * PSIZE, N2, N1)
        a32 = a.reshape(BATCH, CI * 3, N).astype(jnp.int32)
        return a32.reshape(BATCH * CI * 3, N2, N1), pm

    a32_d, pm_d = jax.block_until_ready(prep(aj, pj))
    out_c = jax.block_until_ready(jax.jit(fn)(a32_d, pm_d))
    out_c = np.asarray(out_c).reshape(BATCH, CO, RES_SIZE, N).astype(
        np.int64)
    rep("C split jits", out_c)


if __name__ == "__main__":
    main()
