"""MXU mismatch bisect, final stage: the wrapper's outside-kernel XLA prep.

_mxu_repro3.py proved the FULL kernel body is bit-exact on device under
identical grid/specs — so the Mosaic kernel is innocent.  What the real
wrapper adds around it: the sigma-permutation gather pmat[..., pi_sigma],
pm_kernel_layout's moveaxis/swapaxes/reshape/astype, the a32 input prep,
and the output reshape — all XLA ops running on the TPU under jit.
Compare each computed on-device vs host numpy.

Run: timeout 1700 python _mxu_repro4.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt4 import _split, sigma_from_hal
from poulpy_tpu.backends.pallas_fused import pm_kernel_layout
from poulpy_tpu.hal.module import get_module

N = 2048
N1, N2 = _split(N)
ROWS, CI, CO, PSIZE = 3, 2, 2, 4


def main():
    m = get_module(N, 2, 28)
    P = m.nprimes
    rng = np.random.default_rng(0)
    pmat = np.zeros((ROWS, CI, CO, PSIZE, P, N), dtype=np.int64)
    for i, p in enumerate(m.basis.primes):
        pmat[..., i, :] = rng.integers(0, p, size=(ROWS, CI, CO, PSIZE, N))
    pi_sigma = sigma_from_hal(m.basis.primes, N)

    # host-numpy ground truth of the wrapper prep
    perm_np = pmat[..., pi_sigma]
    want_pm = np.moveaxis(perm_np, 4, 0)           # [P, rows, ci, co, j, N]
    want_pm = np.swapaxes(want_pm, 1, 2)           # [P, ci, rows, co, j, N]
    want_pm = want_pm.reshape(P, CI * ROWS, CO * PSIZE, N).astype(np.int32)
    want_pm = want_pm.reshape(P, CI * ROWS, CO * PSIZE, N2, N1)

    # device: exactly the wrapper's expression under jit
    pmat_j = jnp.asarray(pmat)
    sig_j = jnp.asarray(pi_sigma)

    @jax.jit
    def prep(pmat):
        pm = pm_kernel_layout(pmat[..., sig_j], ROWS)
        return pm.reshape(P, CI * ROWS, CO * PSIZE, N2, N1)

    dev_pm = np.asarray(jax.block_until_ready(prep(pmat_j)))
    ok = np.array_equal(dev_pm, want_pm)
    print(f"wrapper pm prep (sigma gather + layout) on device: exact={ok} "
          f"mismatches={int((dev_pm != want_pm).sum())}/{dev_pm.size}",
          flush=True)
    if not ok:
        bad = np.argwhere(dev_pm != want_pm)
        print("  first bad index:", tuple(bad[0]), flush=True)
        i0 = tuple(bad[0])
        print(f"  dev={dev_pm[i0]} want={want_pm[i0]}", flush=True)
        # isolate: gather alone
        g = np.asarray(jax.block_until_ready(
            jax.jit(lambda x: x[..., sig_j])(pmat_j)))
        gok = np.array_equal(g, perm_np)
        print(f"  gather alone: exact={gok} "
              f"mismatches={int((g != perm_np).sum())}/{g.size}", flush=True)

    # input prep: astype int32 + reshape to [*, n2, n1]
    a = rng.integers(-(2**16), 2**16, size=(8, CI, 3, N), dtype=np.int64)
    want_a = a.reshape(8, CI * 3, N).astype(np.int32).reshape(
        8 * CI * 3, N2, N1)

    @jax.jit
    def prep_a(a):
        a32 = a.reshape(8, CI * 3, N).astype(jnp.int32)
        return a32.reshape(8 * CI * 3, N2, N1)

    dev_a = np.asarray(jax.block_until_ready(prep_a(jnp.asarray(a))))
    print(f"wrapper a prep on device: exact={np.array_equal(dev_a, want_a)}",
          flush=True)


if __name__ == "__main__":
    main()
