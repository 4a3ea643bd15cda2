"""Cross-backend equivalence: Pallas kernels vs the jnp reference backend.

The analogue of the reference's cross_backend_test_suite
(poulpy-hal/src/test_suite/mod.rs:35-95): both backends compute the same op
and results must match bit-exactly.  Runs the kernels in TPU-interpret mode
on CPU; the same comparisons execute compiled on real TPU via bench tooling.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends import pallas_ntt as pntt
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.ntt import ntt_forward, ntt_inverse, to_residues

RNG = np.random.default_rng(3)


@pytest.mark.parametrize(
    "n", [128, pytest.param(512, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("nprimes,prime_bits", [(2, 30), (4, 30), (2, 28)])
def test_pallas_ntt_matches_jnp(n, nprimes, prime_bits):
    # prime_bits=28 exercises the lazy-reduction (Harvey) butterflies
    m = get_module(n, nprimes, prime_bits)
    t = m.tables
    x = jnp.asarray(
        RNG.integers(-(2**40), 2**40, size=(3, 2, n), dtype=np.int64)
    )
    r = to_residues(t, x)
    want_f = ntt_forward(t, r)
    want_i = ntt_inverse(t, want_f)
    with pltpu.force_tpu_interpret_mode():
        have_f = pntt.pallas_ntt_forward(t, r)
        have_i = pntt.pallas_ntt_inverse(t, have_f)
    assert np.array_equal(np.asarray(have_f), np.asarray(want_f))
    assert np.array_equal(np.asarray(have_i), np.asarray(want_i))
    assert np.array_equal(np.asarray(have_i), np.asarray(r))


def test_mont_mul_i32_matches_i64():
    from poulpy_tpu.backends.pallas_ntt import mont_mul_i32
    from poulpy_tpu.hal.ntt import mont_mul
    from poulpy_tpu.hal.primes import ntt_primes

    for p in ntt_primes(4):
        qinv30 = (-pow(p, -1, 1 << 30)) % (1 << 30)
        a = RNG.integers(0, p, size=1000, dtype=np.int64)
        b = RNG.integers(0, p, size=1000, dtype=np.int64)
        want = np.asarray(
            mont_mul(jnp.asarray(a), jnp.asarray(b), jnp.int64(p), jnp.int64(qinv30))
        )
        have = np.asarray(
            mont_mul_i32(
                jnp.asarray(a, jnp.int32).astype(jnp.int32),
                jnp.asarray(b, jnp.int32).astype(jnp.int32),
                jnp.int32(p),
                jnp.int32(qinv30),
            )
        )
        assert np.array_equal(have.astype(np.int64), want)
