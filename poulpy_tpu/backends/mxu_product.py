"""MXU-path GLWE gadget product: four-step matmul NTT + Pallas VMP + tail.

Drop-in alternative to pallas_fused.fused_glwe_product (same contract, same
bit-exact outputs) that runs the two transforms on the systolic array
(backends/mxu_ntt4.py) instead of VPU butterflies:

  digitize → 4-step NTT einsums → assemble (MXU + fused XLA epilogues)
  → VMP (pallas_vmp kernel, VPU)           (pointwise mod-mul contraction,
                                            pmat σ-permuted to MXU order)
  → digitize → 4-step iNTT → assemble      (MXU)
  → Garner + add-small + normalize         (pallas_fused kernel B, VPU)

Preconditions mirror fused_glwe_product:
  * |input limbs| < 2^(in_bits) (callers pass their static bound; the
    digit-plane count is derived from it — normalized ciphertexts allow 3
    planes instead of 4, a 25% forward-MAC cut);
  * res_base2k + ceil(log2(psize+1)) ≤ 31 and res_base2k ≤ 26 (kernel B's
    i32 window arithmetic), dsize == 1.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import sigma_from_hal
from poulpy_tpu.backends.pallas_mxu import (
    pallas_mxu4_forward_limbs,
    pallas_mxu4_inverse,
)
from poulpy_tpu.backends.pallas_fused import _kernel_b_fn
from poulpy_tpu.backends.pallas_vmp import _vmp_fn
from poulpy_tpu.hal.module import Module


def _nd_for_bits(bits: int) -> int:
    """Digit planes needed so balanced base-256 digits cover |x| < 2^bits."""
    nd = 1
    while 128 * ((1 << (8 * nd)) - 1) // 255 < (1 << bits) - 1:
        nd += 1
    return min(nd, NDIG)


def mxu_glwe_product(
    module: Module,
    a_data,                  # [..., ci, size_a, N] int limbs
    pmat,                    # [rows, ci, co, psize, P, N] Montgomery
    res_size: int,
    res_base2k: int,
    pm_base2k: int,
    small=None,              # [..., s_size, N] body to add at col 0
    in_bits: int = 29,
    tb: int = 8,
):
    n = module.n
    P = module.nprimes
    t = module.tables
    rows, ci, co, psize = pmat.shape[:4]
    lead = a_data.shape[:-3]
    a_size = a_data.shape[-2]
    rmax = min(rows, a_size)
    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    nd = _nd_for_bits(in_bits)

    # --- forward NTT (fused Pallas four-step MXU kernel, σ order) ----------
    res = pallas_mxu4_forward_limbs(
        t, a_data[..., :rmax, :].reshape(-1, n), nd
    )                                                          # [R, P, N]

    # --- VMP (pallas kernel, [B, K, P·N] layout; pmat σ-permuted) ----------
    pi_sigma = jnp.asarray(sigma_from_hal(t.basis.primes, n))
    kdim = ci * rmax
    mdim = co * psize
    a_vmp = res.reshape(b_tot, kdim, P * n)
    pm = jnp.moveaxis(pmat[:rmax, ..., pi_sigma], 0, 1)
    pm = pm.reshape(kdim, mdim, P * n).astype(jnp.int32)
    rows_block = 4
    pad = (-b_tot) % rows_block
    if pad:
        a_vmp = jnp.pad(a_vmp, ((0, pad), (0, 0), (0, 0)))
    prod = _vmp_fn(n, t.basis.primes, kdim, mdim, rows_block)(a_vmp, pm)
    prod = prod[:b_tot]                                        # [B, M, P·N]

    # --- inverse NTT (fused Pallas four-step MXU kernel) -------------------
    prod = prod.reshape(b_tot * mdim, P, n)
    x = pallas_mxu4_inverse(t, prod)                           # [B·M, P, N]
    x = jnp.moveaxis(x, -2, 0)                                 # [P, B·M, N]

    # --- Garner + (small at col 0) + normalize (pallas kernel B) -----------
    bq = b_tot * co
    padq = (-bq) % tb
    if padq:
        x = jnp.pad(
            x.reshape(P, bq, psize, n), ((0, 0), (0, padq), (0, 0), (0, 0))
        ).reshape(P, (bq + padq) * psize, n)
    s_size = 0
    sm = None
    if small is not None:
        # small is added at column 0 of each batch element: expand to
        # per-(b, co) rows with zeros at co > 0
        s_size = small.shape[-2]
        smq = jnp.zeros((b_tot, co, s_size, n), jnp.int32)
        smq = smq.at[:, 0].set(
            small.reshape(b_tot, s_size, n).astype(jnp.int32)
        )
        smq = jnp.pad(
            smq.reshape(bq, s_size, n), ((0, padq), (0, 0), (0, 0))
        )
        sm = smq.reshape((bq + padq) * s_size, n)

    out = _kernel_b_fn(
        n, t.basis.primes, psize, s_size, res_size,
        res_base2k, pm_base2k, 0, min(tb, bq + padq),
    )(x, sm)
    out = out.reshape(-1, res_size, n)[:bq]
    return (
        out.reshape(lead + (co, res_size, n)).astype(jnp.int64)
    )
