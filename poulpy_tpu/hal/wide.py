"""Wide (128-bit) big-accumulator mode — the NTT120-family i128 twin.

The reference's NTT120 backends accumulate exact convolution results in
i128 (`ScalarBig = i128`, poulpy-cpu-ref/src/ntt120/module.rs:45-46), which
lets parameter sets with base2k up to ~52 (e.g. the CKKS demo,
poulpy-ckks/examples/poly2.rs:48-61) keep gadget/tensor products exact.
JAX has no int128, so wide big vectors are (hi, lo) **int64 pairs** with
`lo` carrying the unsigned low 64 bits: value = hi·2^64 + u64(lo).

Everything here is exact wrapping two's-complement arithmetic; the
(hi, lo) pair of any value |v| < 2^127 is unique, and the normalization
windows only ever need 64-bit funnel shifts of the pair (each window lies
in [0, 2^base2k), so their sums fit int64 for base2k ≤ 59).

Used by hal.dft's `*_wide` entry points when a call site's exact value
bound exceeds int64 (see dft.needs_wide); the int64 path remains the fast
default for every bench config.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.hal.normalization import vec_znx_normalize

I64_MIN = -(1 << 63)
MASK64 = (1 << 64) - 1


def i64c(v: int) -> int:
    """Python int → signed value of its low 64 bits."""
    return ((v & MASK64) ^ (1 << 63)) - (1 << 63)


def wadd(h1, l1, h2, l2):
    lo = l1 + l2
    c = ((lo ^ I64_MIN) < (l1 ^ I64_MIN)).astype(jnp.int64)
    return h1 + h2 + c, lo


def wsub(h1, l1, h2, l2):
    lo = l1 - l2
    b = ((l1 ^ I64_MIN) < (l2 ^ I64_MIN)).astype(jnp.int64)
    return h1 - h2 - b, lo


def wfrom_i64(x):
    """Sign-extend an int64 array into a pair."""
    return x >> 63, x


def _lsr64(x, s: int):
    """Logical right shift of an i64 bit pattern by static 0 ≤ s < 64."""
    if s == 0:
        return x
    return (x >> s) & ((1 << (64 - s)) - 1)


def wshr_lo64(h, l, s: int):
    """Low 64 bits of the arithmetic 128-bit shift (h:l) >> s, static s."""
    if s == 0:
        return l
    if s < 64:
        return _lsr64(l, s) | (h << (64 - s))
    if s == 64:
        return h
    if s < 128:
        return h >> (s - 64)
    return h >> 63


def wshl(h, l, s: int):
    """(h:l) << s wrapping mod 2^128, static s ≥ 0."""
    if s == 0:
        return h, l
    if s < 64:
        return (h << s) | _lsr64(l, 64 - s), l << s
    if s < 128:
        return l << (s - 64), jnp.zeros_like(l)
    return jnp.zeros_like(h), jnp.zeros_like(l)


def wmul_d_w128(d, w: int):
    """(d · w) mod 2^128 as a pair, for 0 ≤ d < 2^31 and static 0 ≤ w < 2^128.

    32-bit digit schoolbook: every partial product d·wk < 2^63 fits int64.
    """
    hi = jnp.zeros_like(d)
    lo = jnp.zeros_like(d)
    for k in range(4):
        wk = (w >> (32 * k)) & 0xFFFFFFFF
        if wk == 0:
            continue
        p = d * jnp.int64(wk)            # < 2^63, non-negative
        ph, plo = wshl(jnp.zeros_like(d), p, 32 * k)
        hi, lo = wadd(hi, lo, ph, plo)
    return hi, lo


def garner_lift_wide(t, r):
    """Centered CRT lift into (hi, lo) int64 pairs — the i128 analogue of
    hal.ntt.garner_lift (same mixed-radix digit recurrence, 128-bit
    reconstruction).  Exact whenever |value| < M/2 (< 2^127 for ≤ 8 primes).
    """
    from poulpy_tpu.hal.ntt import mont_mul, sub_mod

    r = r.astype(jnp.int64)
    P = r.shape[-2]
    p = t.p
    basis = t.basis
    digits = []
    for i in range(P):
        x = r[..., i, :]
        for j in range(i):
            x = sub_mod(
                x,
                mont_mul(digits[j], t.garner_pprod_mont[i, j], p[i], t.qinv[i]),
                p[i],
            )
        if i > 0:
            x = mont_mul(x, t.garner_inv_mont[i], p[i], t.qinv[i])
        digits.append(x)

    weights = [1]
    prod = 1
    for i in range(P - 1):
        prod *= int(basis.primes[i])
        weights.append(prod & ((1 << 128) - 1))
    hi = jnp.zeros_like(digits[0])
    lo = digits[0]
    for i in range(1, P):
        ph, plo = wmul_d_w128(digits[i], weights[i])
        hi, lo = wadd(hi, lo, ph, plo)

    gt = jnp.zeros(lo.shape, dtype=bool)
    eq = jnp.ones(lo.shape, dtype=bool)
    for i in range(P - 1, -1, -1):
        gt = gt | (eq & (digits[i] > t.half_digits[i]))
        eq = eq & (digits[i] == t.half_digits[i])
    m128 = basis.modulus & ((1 << 128) - 1)
    mh = jnp.where(gt, jnp.int64(i64c(m128 >> 64)), jnp.int64(0))
    ml = jnp.where(gt, jnp.int64(i64c(m128)), jnp.int64(0))
    return wsub(hi, lo, mh, ml)


def wide_add_small(pair, small, limb_axis: int = -2):
    """pair[..., j, :] += sign-extend(small[..., j, :]) over common limbs."""
    hi, lo = pair
    upto = min(hi.shape[limb_axis], small.shape[limb_axis])
    idx = [slice(None)] * hi.ndim
    idx[limb_axis % hi.ndim] = slice(0, upto)
    idx = tuple(idx)
    sh, sl = wfrom_i64(small[idx])
    nh, nl = wadd(hi[idx], lo[idx], sh, sl)
    return hi.at[idx].set(nh), lo.at[idx].set(nl)


def wide_big_add(a, b):
    """Pair + pair with limb alignment (vec_znx_big_add analogue)."""
    from poulpy_tpu.hal.dft import _align_limbs

    ah, al = a
    bh, bl = b
    res_size = max(ah.shape[-2], bh.shape[-2])
    ah, bh = _align_limbs(ah, bh, res_size, limb_axis=-2)
    al, bl = _align_limbs(al, bl, res_size, limb_axis=-2)
    return wadd(ah, al, bh, bl)


def vec_znx_normalize_full_wide(
    res_size: int,
    res_base2k: int,
    res_offset: int,
    pair,
    a_base2k: int,
):
    """Bit-window normalization of a wide big vector — exact analogue of
    hal.normalization.vec_znx_normalize_full on (hi, lo) pairs.

    Each (input limb, output limb) window is the low-`res_base2k`-bit field
    of an arithmetic 128-bit shift (value in [0, 2^res_base2k)), so the
    window sums and the final carry scan run in plain int64.
    """
    hi, lo = pair
    a_size = hi.shape[-2]
    kr = res_base2k
    ka = a_base2k
    assert kr + (a_size + 1).bit_length() <= 63
    mask_kr = (1 << kr) - 1
    acc = []
    for i in range(res_size):
        w = (i + 1) * kr
        acc_i = None
        for j in range(a_size):
            t = w - ((j + 1) * ka - res_offset)
            if t >= kr:
                continue
            if t > 0:
                piece = (lo[..., j, :] & ((1 << (kr - t)) - 1)) << t
            else:
                piece = wshr_lo64(hi[..., j, :], lo[..., j, :], -t) & mask_kr
            acc_i = piece if acc_i is None else acc_i + piece
        if acc_i is None:
            acc_i = jnp.zeros_like(lo[..., 0, :])
        acc.append(acc_i)
    return vec_znx_normalize(kr, jnp.stack(acc, axis=-2))
