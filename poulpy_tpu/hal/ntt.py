"""Exact negacyclic NTT over a CRT prime basis + Montgomery arithmetic.

This is the TPU-native DFT domain replacing both reference families:
  * FFT64's `reim` f64 FFT (poulpy-cpu-ref/src/reference/fft64/reim/fft_ref.rs:25-43)
    — not portable to TPU (no f64 vector hardware), and
  * NTT120's 4×~30-bit-prime CRT NTT (poulpy-cpu-ref/src/reference/ntt120/ntt.rs:558,617)
    — same mathematical idea, but re-derived here for i64-emulation-friendly
    Montgomery form (R = 2^32) rather than the reference's Q120 lazy layout.

All kernels are pure `jnp` int64 and shape-polymorphic: residue tensors are
`[..., P, N]` with P = number of primes, N = ring degree.  XLA lowers int64
to i32 pairs on TPU; the Pallas backend replaces the hot loops with native
i32 kernels (see poulpy_tpu/backends/).

Values in the NTT domain are kept in *standard* residue form `[0, p)`;
prepared operands (twiddles, SVP/VMP matrices) are stored in *Montgomery*
form `b·R mod p` so a single REDC per product returns a standard-form
result: REDC(a · bR) = a·b mod p.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.hal.primes import MASK32, PrimeBasis

I64 = jnp.int64


# --------------------------------------------------------------------------
# Modular scalar kernels (vectorized; p/qinv broadcast along trailing dims)
# --------------------------------------------------------------------------

def mont_mul(a, b_mont, p, qinv):
    """REDC(a · b_mont) = a·b mod p, for 0 ≤ a,b < p < 2^30.

    t + m·p < 2^60 + 2^62 stays in signed int64.
    """
    t = a * b_mont
    m = ((t & MASK32) * qinv) & MASK32
    u = (t + m * p) >> 32
    return jnp.where(u >= p, u - p, u)


def add_mod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def sub_mod(a, b, p):
    d = a - b
    return jnp.where(d < 0, d + p, d)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


def mul_mod(a, b, p):
    """Plain (a·b) mod p for 0 ≤ a,b < p < 2^30 (non-Montgomery)."""
    return (a * b) % p


def reduce_i64(x, p, two32_mod_p):
    """Arbitrary signed int64 → residue in [0, p).

    Splits x = hi·2^32 + lo (lo unsigned) so every intermediate product
    stays < 2^61.  Used when entering the NTT domain
    (reference analogue: reim_from_znx / i64→NTT conversion,
    poulpy-cpu-ref/src/reference/fft64/reim/conversion.rs).
    """
    lo = x & MASK32
    hi = x >> 32  # arithmetic shift: sign lives here
    r = (hi % p) * two32_mod_p + lo  # < 2^60 + 2^32
    return r % p


# --------------------------------------------------------------------------
# Twiddle tables
# --------------------------------------------------------------------------

def _bit_reverse(i: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (i & 1)
        i >>= 1
    return r


@functools.lru_cache(maxsize=None)
def _host_tables(primes: tuple[int, ...], n: int):
    """Host-side twiddle tables (numpy int64, Montgomery form).

    Returns (psi_brv_mont, psi_inv_brv_mont, n_inv_mont):
      psi_brv_mont[P][j] = psi^{bitrev(j)}·R mod p for j in [0, N)
      (the classic Longa–Naehrig layout for merged negacyclic CT/GS NTTs).
    """
    from poulpy_tpu.hal.primes import R, psi_2n

    logn = n.bit_length() - 1
    P = len(primes)
    psi_t = np.zeros((P, n), dtype=np.int64)
    psi_inv_t = np.zeros((P, n), dtype=np.int64)
    n_inv = np.zeros((P,), dtype=np.int64)
    for k, p in enumerate(primes):
        psi = psi_2n(p, 2 * n)
        psi_inv = pow(psi, -1, p)
        for j in range(n):
            b = _bit_reverse(j, logn)
            psi_t[k, j] = pow(psi, b, p) * R % p
            psi_inv_t[k, j] = pow(psi_inv, b, p) * R % p
        n_inv[k] = pow(n, -1, p) * R % p
    return psi_t, psi_inv_t, n_inv


class NttTables:
    """Device twiddle tables for one (prime basis, N)."""

    def __init__(self, basis: PrimeBasis, n: int):
        assert n & (n - 1) == 0 and n >= 4, "N must be a power of two >= 4"
        self.basis = basis
        self.n = n
        self.logn = n.bit_length() - 1
        psi, psi_inv, n_inv = _host_tables(basis.primes, n)
        self.psi_brv = jnp.asarray(psi)            # [P, N] Montgomery
        self.psi_inv_brv = jnp.asarray(psi_inv)    # [P, N] Montgomery
        self.n_inv = jnp.asarray(n_inv)            # [P]    Montgomery
        self.p = jnp.asarray(basis.p_arr)          # [P]
        self.qinv = jnp.asarray(basis.qinv_arr)    # [P]
        self.r2 = jnp.asarray(basis.r2_arr)        # [P]
        self.two32_mod_p = jnp.asarray(basis.two32_mod_p_arr)
        # Garner lift constants
        self.garner_inv = jnp.asarray(basis.garner_inv)            # [P]
        self.garner_pprod = jnp.asarray(basis.garner_pprod_mod)    # [P, P]
        self.garner_weight = jnp.asarray(basis.garner_weight_u64)  # [P]
        self.modulus_u64 = jnp.asarray(basis.modulus_u64)          # scalar
        self.half_digits = jnp.asarray(basis.half_digits)          # [P]


# --------------------------------------------------------------------------
# Forward / inverse negacyclic NTT
# --------------------------------------------------------------------------

def ntt_forward(t: NttTables, x):
    """Negacyclic forward NTT, per prime.

    x: `[..., P, N]` standard-form residues → `[..., P, N]` (bit-reversed
    frequency order — internal convention; only pointwise ops happen in this
    domain, and `ntt_inverse` undoes it).

    Cooley–Tukey with merged psi powers: stage m has m butterflies blocks of
    half-length t = N/(2m); w for block i is psi^{brv(m+i)}.
    """
    n = t.n
    p = t.p[:, None]          # [P, 1]
    qinv = t.qinv[:, None]
    lead = x.shape[:-2]
    P = x.shape[-2]
    for s in range(t.logn):
        m = 1 << s
        half = n >> (s + 1)
        w = t.psi_brv[:, m : 2 * m]            # [P, m] Montgomery
        xr = x.reshape(lead + (P, m, 2, half))
        lo = xr[..., 0, :]
        hi = xr[..., 1, :]
        v = mont_mul(hi, w[..., :, None], p[..., None], qinv[..., None])
        nlo = add_mod(lo, v, p[..., None])
        nhi = sub_mod(lo, v, p[..., None])
        x = jnp.stack([nlo, nhi], axis=-2).reshape(lead + (P, n))
    return x


def ntt_inverse(t: NttTables, x):
    """Inverse of `ntt_forward` (Gentleman–Sande, then scale by N^{-1})."""
    n = t.n
    p = t.p[:, None]
    qinv = t.qinv[:, None]
    lead = x.shape[:-2]
    P = x.shape[-2]
    for s in range(t.logn - 1, -1, -1):
        m = 1 << s
        half = n >> (s + 1)
        w = t.psi_inv_brv[:, m : 2 * m]        # [P, m] Montgomery
        xr = x.reshape(lead + (P, m, 2, half))
        lo = xr[..., 0, :]
        hi = xr[..., 1, :]
        u = add_mod(lo, hi, p[..., None])
        d = sub_mod(lo, hi, p[..., None])
        v = mont_mul(d, w[..., :, None], p[..., None], qinv[..., None])
        x = jnp.stack([u, v], axis=-2).reshape(lead + (P, n))
    return mont_mul(x, t.n_inv[:, None], p, qinv)


# --------------------------------------------------------------------------
# Basis entry / exit
# --------------------------------------------------------------------------

def to_residues(t: NttTables, x):
    """int64 `[..., N]` → standard residues `[..., P, N]`."""
    return reduce_i64(
        x[..., None, :], t.p[:, None], t.two32_mod_p[:, None]
    )


def to_mont(t: NttTables, r):
    """Standard residues → Montgomery form (for prepared operands)."""
    return mont_mul(r, t.r2[:, None], t.p[:, None], t.qinv[:, None])


def garner_lift(t: NttTables, r):
    """Centered CRT lift: residues `[..., P, N]` → wrapping int64 `[..., N]`.

    Garner's mixed-radix algorithm (the exact-integer equivalent of the
    reference NTT120 backend's i128 reconstruction,
    poulpy-cpu-ref/src/reference/ntt120/mod.rs:34-44): digits d_i in [0, p_i),
    value V = Σ d_i·W_i computed mod 2^64, centered by subtracting M when the
    mixed-radix digit vector exceeds floor(M/2).  Exact whenever the true
    value's magnitude is < M/2 (guaranteed by Module parameter validation).
    """
    P = r.shape[-2]
    p = t.p
    digits = []
    for i in range(P):
        x = r[..., i, :]
        for j in range(i):
            x = sub_mod(x, mul_mod(digits[j], t.garner_pprod[i, j], p[i]), p[i])
        if i > 0:
            x = mul_mod(x, t.garner_inv[i], p[i])
        digits.append(x)
    # V mod 2^64 (wrapping int64 multiply-accumulate)
    v = jnp.zeros_like(r[..., 0, :])
    for i in range(P):
        v = v + digits[i] * t.garner_weight[i]
    # lexicographic compare of (d_{P-1}, …, d_0) with digits of floor(M/2)
    gt = jnp.zeros(v.shape, dtype=bool)
    eq = jnp.ones(v.shape, dtype=bool)
    for i in range(P - 1, -1, -1):
        gt = gt | (eq & (digits[i] > t.half_digits[i]))
        eq = eq & (digits[i] == t.half_digits[i])
    return v - jnp.where(gt, t.modulus_u64, jnp.int64(0))
