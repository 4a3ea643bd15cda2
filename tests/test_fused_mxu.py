"""MXU mega-kernel equivalence vs the jnp reference backend.

Same cross-backend contract as tests/test_fused.py: the single-kernel MXU
pipeline (backends/pallas_fused_mxu.py) must reproduce the stage-by-stage
jnp path bit-exactly (cross_backend_test_suite analogue,
poulpy-hal/src/test_suite/mod.rs:35-95), including the σ relabeling
cancellation between the forward transform, the σ-permuted prepared
operands, and the inverse transform.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends import pallas_fused_mxu as pfm
from poulpy_tpu.hal import dft
from poulpy_tpu.hal.module import get_module

RNG = np.random.default_rng(17)

N = 256  # smallest ring with a lane-sized four-step split (n1 = 128)


def _rand_residues(basis, shape):
    out = np.zeros(shape, dtype=np.int64)
    for i, p in enumerate(basis.primes):
        out[..., i, :] = RNG.integers(0, p, size=shape[:-2] + shape[-1:])
    return jnp.asarray(out)


@pytest.mark.parametrize(
    "nprimes", [2, pytest.param(4, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize(
    "ci,co,rows,size_a,psize,batch",
    [
        (2, 2, 3, 3, 4, 4),     # rank-1 external product (bench config shape)
        pytest.param(1, 2, 4, 4, 4, 3, marks=pytest.mark.slow),  # ks mask
        pytest.param(2, 2, 4, 3, 4, 2, marks=pytest.mark.slow),  # rows>a
    ],
)
def test_fused_mxu_product_matches_jnp(nprimes, ci, co, rows, size_a, psize,
                                       batch):
    m = get_module(N, nprimes)
    kr, ka = 17, 17
    res_size = 3
    a = jnp.asarray(
        RNG.integers(-(2**26), 2**26, size=(batch, ci, size_a, N),
                     dtype=np.int64)
    )
    pmat = _rand_residues(m.basis, (rows, ci, co, psize, nprimes, N))

    a_dft = dft.dft_apply(m, a)
    res_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, res_dft)
    want = dft.big_normalize(m, res_size, kr, big, ka)

    with pltpu.force_tpu_interpret_mode():
        have = pfm.fused_mxu_glwe_product(
            m, a, pmat, res_size, kr, ka, t_tile=2
        )
    assert np.array_equal(np.asarray(have), np.asarray(want))


def test_fused_mxu_keyswitch_small_add_matches_jnp():
    m = get_module(N, 2)
    ci, co, rows, size_a, psize, batch = 1, 2, 3, 3, 4, 3
    kr = 17
    res_size = 3
    a = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, ci, size_a, N),
                     dtype=np.int64)
    )
    body = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, size_a, N),
                     dtype=np.int64)
    )
    pmat = _rand_residues(m.basis, (rows, ci, co, psize, 2, N))

    a_dft = dft.dft_apply(m, a)
    res_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, res_dft)
    big = big.at[..., 0, :size_a, :].add(body)
    want = dft.big_normalize(m, res_size, kr, big, kr)

    with pltpu.force_tpu_interpret_mode():
        have = pfm.fused_mxu_glwe_product(
            m, a, pmat, res_size, kr, kr, small=body, t_tile=2
        )
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.parametrize("nprimes,batch", [(2, 3)])
def test_fused_mxu_br_block_step_matches_jnp(nprimes, batch):
    """One fused block-binary CGGI step (MXU transforms) vs the jnp math."""
    from poulpy_tpu.backends.pallas_fused import pm_kernel_layout
    from poulpy_tpu.binfhe.blind_rotation import (
        _xpow_minus1_table,
        _xpow_table,
    )
    from poulpy_tpu.hal.ntt import mont_mul

    m = get_module(N, nprimes)
    base2k, cols, size, rows, psize, block = 17, 2, 3, 3, 4, 4
    t = m.tables
    acc = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, cols, size, N),
                     dtype=np.int64)
    )
    pmats = _rand_residues(m.basis, (block, rows, cols, cols, psize,
                                     nprimes, N))
    a_vals = jnp.asarray(
        RNG.integers(0, 2 * N, size=(batch, block), dtype=np.int64)
    )
    with pltpu.force_tpu_interpret_mode():
        xpow = _xpow_table(N, m.basis.primes)

        # jnp reference block step
        acc_dft = dft.dft_apply(m, acc)
        add_dft = None
        for i in range(block):
            vmp = dft.vmp_apply(m, acc_dft, pmats[i])
            xp = jnp.take(xpow, a_vals[:, i], axis=0)      # [batch, P, N]
            rot = mont_mul(vmp, xp[:, None, None], t.p[:, None],
                           t.qinv[:, None])
            term = dft.dft_sub(m, rot, vmp)
            add_dft = term if add_dft is None else dft.dft_add(m, add_dft,
                                                               term)
        big = dft.idft_apply(m, add_dft)
        big = big + dft._align_limbs(acc, big, big.shape[-2], limb_axis=-2)[0]
        want = dft.big_normalize(m, size, base2k, big, base2k)

        # fused MXU kernel: σ-permute pmats and x-powers
        pi = jnp.asarray(pfm._sigma_perm(m))
        rmax = min(rows, size)
        pm_k = jnp.swapaxes(pm_kernel_layout(pmats[..., pi], rmax), 0, 1)
        xpm1 = _xpow_minus1_table(N, m.basis.primes)
        xp_in = jnp.take(xpm1[..., pi], a_vals, axis=0).astype(jnp.int32)
        have = pfm.fused_mxu_br_block_step(m, acc, pm_k, xp_in, size,
                                           base2k, t_tile=2)
    assert np.array_equal(np.asarray(have), np.asarray(want))
