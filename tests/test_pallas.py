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


# ---------------------------------------------------------------------------
# Unit contracts of the scalar-multiply primitives (exact Python oracle):
# mont_mul (9-multiply slim REDC), Harvey/Shoup stored-quotient multiply.
# Pure jnp int32 — identical ops to what Mosaic lowers, no kernel needed.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("p", [268369921, 268361729,      # 28-bit (lazy)
                               1073479681, 1072693249])   # 30-bit (strict)
def test_mul_primitives_exact(p):
    R = 1 << 30
    qinv = (-pow(p, -1, R)) % R
    k = 4096
    a = RNG.integers(0, p, size=k, dtype=np.int64)
    b = RNG.integers(0, p, size=k, dtype=np.int64)
    # edge values: zeros, p-1, and (lazy-range) values up to min(4p, 2^30)-1
    a[:4] = [0, 1, p - 1, min(4 * p, 1 << 30) - 1]
    b[:4] = [0, 1, p - 1, p - 1]
    av = jnp.asarray(a, dtype=jnp.int32)
    bv = jnp.asarray(b, dtype=jnp.int32)

    # _mul_hi30 / _mul_lo30 against the full product
    hi = np.asarray(pntt._mul_hi30(av, bv), dtype=np.int64)
    lo = np.asarray(pntt._mul_lo30(av, bv), dtype=np.int64)
    assert (hi == (a * b) >> 30).all()
    assert (lo == (a * b) & ((1 << 30) - 1)).all()

    # strict Montgomery: canonical a*b*R^{-1} mod p
    want = a * b % p * pow(R, -1, p) % p
    got = np.asarray(
        pntt.mont_mul_i32(av, bv, jnp.int32(p), jnp.int32(qinv)),
        dtype=np.int64,
    )
    assert (got == want).all()

    # lazy Montgomery: congruent and < 2p (valid for a < min(4p, 2^30))
    gl = np.asarray(
        pntt.mont_mul_i32_lazy(av, bv, jnp.int32(p), jnp.int32(qinv)),
        dtype=np.int64,
    )
    assert ((gl - want) % p == 0).all() and (gl < 2 * p).all() and (
        gl >= 0).all()

    # Shoup: w < p with stored quotient; strict = canonical product
    w = b
    wq = jnp.asarray((w << 30) // p, dtype=jnp.int32)
    wv = jnp.asarray(w, dtype=jnp.int32)
    ws = a * w % p
    gs = np.asarray(
        pntt.shoup_mul_i32(
            jnp.asarray(np.minimum(a, p - 1), dtype=jnp.int32), wv, wq,
            jnp.int32(p)),
        dtype=np.int64,
    )
    assert (gs == np.minimum(a, p - 1) * w % p).all()
    # lazy Shoup on the extended operand range: congruent, in [0, 2p)
    gsl = np.asarray(
        pntt.shoup_mul_i32_lazy(av, wv, wq, jnp.int32(p)), dtype=np.int64
    )
    assert ((gsl - ws) % p == 0).all() and (gsl < 2 * p).all() and (
        gsl >= 0).all()
