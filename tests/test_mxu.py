"""MXU matmul-NTT backend: bit-exact vs the jnp butterfly transforms.

The cross_backend_test_suite analogue (poulpy-hal/src/test_suite/mod.rs:35-95)
for backends/mxu_ntt.py: same canonical residues out of a completely
different evaluation strategy (int8 digit matmuls + folded reduction vs
Montgomery butterflies).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from poulpy_tpu.backends import mxu_ntt
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.ntt import ntt_forward, ntt_inverse, to_residues


@pytest.mark.parametrize(
    "n", [64, pytest.param(256, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("nprimes", [2, 4])
def test_mxu_forward_matches_jnp(n, nprimes):
    m = get_module(n, nprimes)
    t = m.tables
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.integers(-(2**29), 2**29, size=(3, 2, n), dtype=np.int64)
    )
    want = ntt_forward(t, to_residues(t, x))
    got = mxu_ntt.mxu_ntt_forward_limbs(t, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n", [64, pytest.param(256, marks=pytest.mark.slow)]
)
def test_mxu_forward_residues_matches_jnp(n):
    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.integers(-(2**20), 2**20, size=(5, n), dtype=np.int64))
    r = to_residues(t, x)
    want = ntt_forward(t, r)
    got = mxu_ntt.mxu_ntt_forward(t, r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "n", [64, pytest.param(256, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("nprimes", [2, 4])
def test_mxu_inverse_matches_jnp(n, nprimes):
    m = get_module(n, nprimes)
    t = m.tables
    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.integers(-(2**25), 2**25, size=(2, 3, n), dtype=np.int64)
    )
    r = ntt_forward(t, to_residues(t, x))
    want = ntt_inverse(t, r)
    got = mxu_ntt.mxu_ntt_inverse(t, r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mxu_roundtrip_convolution():
    """NTT-multiply two polys entirely through the MXU path and check the
    exact negacyclic product against a big-int oracle."""
    n = 128
    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(10)
    a = rng.integers(-(2**14), 2**14, size=(n,), dtype=np.int64)
    b = rng.integers(-(2**14), 2**14, size=(n,), dtype=np.int64)

    from poulpy_tpu.hal.ntt import garner_lift, mont_mul, to_mont

    ra = mxu_ntt.mxu_ntt_forward_limbs(t, jnp.asarray(a)[None])
    rb = to_mont(t, mxu_ntt.mxu_ntt_forward_limbs(t, jnp.asarray(b)[None]))
    prod = mont_mul(ra, rb, t.p[:, None], t.qinv[:, None])
    got = np.asarray(garner_lift(t, mxu_ntt.mxu_ntt_inverse(t, prod)))[0]

    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            s = int(a[i]) * int(b[j])
            if k < n:
                want[k] += s
            else:
                want[k - n] -= s
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_digitize_exact():
    rng = np.random.default_rng(11)
    x = jnp.asarray(
        rng.integers(-(2**30), 2**30, size=(4, 64), dtype=np.int64)
    )
    d = np.asarray(mxu_ntt.digitize(x)).reshape(4, mxu_ntt.NDIG, 64)
    back = sum(
        d[:, i].astype(np.int64) << (8 * i) for i in range(mxu_ntt.NDIG)
    )
    np.testing.assert_array_equal(back, np.asarray(x))


@pytest.mark.parametrize(
    "s_size", [0, pytest.param(3, marks=pytest.mark.slow)]
)
def test_mxu_glwe_product_matches_jnp(s_size):
    """Full MXU pipeline (matmul NTT -> VMP -> matmul iNTT -> kernel B) vs
    the stage-by-stage jnp path, bit-exact."""
    from poulpy_tpu.backends.mxu_product import mxu_glwe_product
    from poulpy_tpu.hal import dft
    from poulpy_tpu.hal.ntt import to_mont, to_residues, ntt_forward

    n, P = 128, 2
    rows, ci, co, psize = 3, 2, 2, 4
    size_a, res_size, kr = 3, 3, 17
    m = get_module(n, P)
    t = m.tables
    rng = np.random.default_rng(12)

    a = jnp.asarray(
        rng.integers(-(2**16), 2**16, size=(3, ci, size_a, n), dtype=np.int64)
    )
    mat = jnp.asarray(
        rng.integers(
            -(2**16), 2**16, size=(rows, ci, co, psize, n), dtype=np.int64
        )
    )
    pmat = to_mont(t, ntt_forward(t, to_residues(t, mat)))
    small = None
    if s_size:
        small = jnp.asarray(
            rng.integers(-(2**20), 2**20, size=(3, s_size, n), dtype=np.int64)
        )

    # jnp reference: dft -> vmp -> idft -> (+small) -> normalize
    a_dft = dft.dft_apply(m, a)
    r_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, r_dft)
    if small is not None:
        upto = min(s_size, psize)
        big = big.at[..., 0, :upto, :].add(small[..., :upto, :])
    want = dft.big_normalize(m, res_size, kr, big, kr)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = mxu_glwe_product(
            m, a, pmat, res_size, kr, kr, small=small, in_bits=21
        )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
