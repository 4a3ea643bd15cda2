"""Four-step MXU NTT: bit-exact vs the jnp butterfly transforms (up to the
documented σ frequency relabeling) and exact end-to-end products."""

import jax.numpy as jnp
import numpy as np
import pytest

from poulpy_tpu.backends import mxu_ntt4 as m4
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.ntt import ntt_forward, ntt_inverse, to_residues


@pytest.mark.parametrize(
    "n", [64, pytest.param(256, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("nprimes", [2, 4])
def test_mxu4_forward_matches_jnp_up_to_sigma(n, nprimes):
    m = get_module(n, nprimes)
    t = m.tables
    rng = np.random.default_rng(21)
    x = jnp.asarray(
        rng.integers(-(2**29), 2**29, size=(3, 2, n), dtype=np.int64)
    )
    want = np.asarray(ntt_forward(t, to_residues(t, x)))
    got = np.asarray(m4.mxu4_ntt_forward_limbs(t, x))
    pi = m4.sigma_from_hal(t.basis.primes, n)
    np.testing.assert_array_equal(got, want[..., pi])


@pytest.mark.parametrize(
    "n", [64, pytest.param(256, marks=pytest.mark.slow)]
)
def test_mxu4_inverse_roundtrip(n):
    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.integers(-(2**25), 2**25, size=(4, n), dtype=np.int64))
    y = m4.mxu4_ntt_forward_limbs(t, x)
    back = np.asarray(m4.mxu4_ntt_inverse(t, y))
    want = np.asarray(to_residues(t, x))
    np.testing.assert_array_equal(back, want)


def test_mxu4_inverse_matches_jnp():
    """mxu4 inverse on σ-permuted input == ntt_inverse on the original."""
    n = 128
    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.integers(-(2**20), 2**20, size=(3, n), dtype=np.int64))
    r = ntt_forward(t, to_residues(t, x))
    want = np.asarray(ntt_inverse(t, r))
    pi = m4.sigma_from_hal(t.basis.primes, n)
    got = np.asarray(m4.mxu4_ntt_inverse(t, r[..., pi]))
    np.testing.assert_array_equal(got, want)


def test_mxu4_pointwise_product_roundtrip():
    """NTT-multiply through the mxu4 path (σ-order pointwise) vs oracle."""
    n = 128
    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(24)
    a = rng.integers(-(2**14), 2**14, size=(n,), dtype=np.int64)
    b = rng.integers(-(2**14), 2**14, size=(n,), dtype=np.int64)

    from poulpy_tpu.hal.ntt import garner_lift, mont_mul, to_mont

    ra = m4.mxu4_ntt_forward_limbs(t, jnp.asarray(a)[None])
    rb = to_mont(t, m4.mxu4_ntt_forward_limbs(t, jnp.asarray(b)[None]))
    prod = mont_mul(ra, rb, t.p[:, None], t.qinv[:, None])
    got = np.asarray(garner_lift(t, m4.mxu4_ntt_inverse(t, prod)))[0]

    want = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            k = i + j
            s = int(a[i]) * int(b[j])
            if k < n:
                want[k] += s
            else:
                want[k - n] -= s
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "n", [256, pytest.param(512, marks=pytest.mark.slow)]
)
def test_pallas_mxu_matches_mxu4(n):
    """Fused Pallas MXU kernels == the XLA einsum transforms, bit-exact."""
    from jax.experimental.pallas import tpu as pltpu

    from poulpy_tpu.backends import pallas_mxu as pmx

    m = get_module(n, 2)
    t = m.tables
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.integers(-(2**16), 2**16, size=(5, n), dtype=np.int64))
    want_f = np.asarray(m4.mxu4_ntt_forward_limbs(t, x, 3))
    r = m4.mxu4_ntt_forward_limbs(t, x)
    want_i = np.asarray(m4.mxu4_ntt_inverse(t, r))
    with pltpu.force_tpu_interpret_mode():
        got_f = np.asarray(pmx.pallas_mxu4_forward_limbs(t, x, 3, tr=4))
        got_i = np.asarray(pmx.pallas_mxu4_inverse(t, r, tr=4))
    np.testing.assert_array_equal(got_f, want_f)
    np.testing.assert_array_equal(got_i, want_i)
