"""Fused external-product / keyswitch mega-kernels.

The unfused pipeline (dft_apply → vmp_apply → idft_apply → big_normalize)
materializes every stage to HBM; at N=2048/B=256 that is ~6 ms of almost
pure bandwidth.  These two kernels keep the whole GLWE gadget product in
VMEM per batch tile (ROADMAP.md perf item 1):

  Kernel A  (residues → forward NTT → VMP → inverse NTT), pure i32:
    the reference call stack's hot region (SURVEY.md §3.2:
    vec_znx_dft_apply / vmp_apply_dft_to_dft / vec_znx_idft_apply_consume,
    poulpy-cpu-ref/src/reference/fft64/{vec_znx_dft.rs:160,vmp.rs:144}).

  Kernel B  (Garner CRT lift → optional small add → big_normalize):
    the big-accumulator exit (vec_znx_big_normalize,
    reference/fft64/vec_znx_big.rs:241-278).  Mosaic has no 64-bit vectors,
    so the wrapping-i64 big values are emulated as (hi, lo) i32 pairs; the
    bit-window normalization then only ever needs 32-bit funnel shifts and
    the carry scan runs entirely in i32 (windows lie in [0, 2^base2k)).

Bit-exactness: both kernels reproduce the jnp reference backend results
exactly (tests/test_fused.py), because every step is the same exact integer
computation — same Montgomery constants, same Garner digit recurrence, same
window/carry schedule.

Preconditions (asserted by the dispatch wrapper, not data-checked):
  * input limbs satisfy |x| < 2^29 (normalized ciphertexts and their small
    combinations always do; this mirrors the reference FFT64 backend's own
    53-bit exactness precondition on reim_from_znx);
  * res_base2k + ceil(log2(psize + 1)) ≤ 31 so window sums fit i32;
  * dsize == 1 (the dsize > 1 digit grouping stays on the unfused path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends.pallas_ntt import (
    MASK30,
    _add_mod,
    _csub,
    _mul_lo30,
    _stage_twiddles,
    _stage_twiddles_shoup,
    _sub_mod,
    lazy_ok,
    mont_mul_i32,
    mont_mul_i32_lazy,
    shoup_mul_i32,
    shoup_mul_i32_lazy,
)
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.primes import R, PrimeBasis

I32_MIN = -(1 << 31)
MASK32 = (1 << 32) - 1


def _i32c(v: int) -> int:
    """Python int → the signed value of its low 32 bits."""
    return ((v & MASK32) ^ (1 << 31)) - (1 << 31)


def _ninv_triple(n: int, p: int) -> tuple[int, int, int]:
    """N^{-1} mod p as (Montgomery form, plain, Shoup quotient)."""
    nv = pow(n, -1, p)
    return (nv * R % p, nv, (nv << 30) // p)


# ---------------------------------------------------------------------------
# i64-as-(hi, lo) i32-pair primitives (lo interpreted unsigned)
# ---------------------------------------------------------------------------

def _add64(h1, l1, h2, l2):
    lo = l1 + l2
    # unsigned overflow ⟺ u32(lo) < u32(l1):  flip sign bits, compare signed
    c = ((lo ^ I32_MIN) < (l1 ^ I32_MIN)).astype(jnp.int32)
    return h1 + h2 + c, lo


def _sub64(h1, l1, h2, l2):
    lo = l1 - l2
    b = ((l1 ^ I32_MIN) < (l2 ^ I32_MIN)).astype(jnp.int32)
    return h1 - h2 - b, lo


def _lsr32(x, s: int):
    """Logical right shift of an i32 bit pattern by static 0 ≤ s < 32."""
    if s == 0:
        return x
    return (x >> s) & ((1 << (32 - s)) - 1)


def _shr64_lo32(h, l, s: int):
    """Low 32 bits of the arithmetic 64-bit shift (h:l) >> s, static s ≥ 0."""
    if s == 0:
        return l
    if s < 32:
        return _lsr32(l, s) | (h << (32 - s))
    if s == 32:
        return h
    if s < 64:
        return h >> (s - 32)
    return h >> 31


def _shl64_u31(v, s: int):
    """(0, v) << s for v ≥ 0 (< 2^31), static 0 ≤ s; returns (hi, lo)."""
    z = jnp.zeros_like(v)
    if s == 0:
        return z, v
    if s < 32:
        return v >> (32 - s), v << s
    if s < 64:
        return v << (s - 32), z
    return z, z


def _mul_pair_30x28(a, b):
    """Full product a·b as an (hi, lo) i32 pair, for 0 ≤ a < 2^30 and
    0 ≤ b < 2^28 (15-bit digit schoolbook; product < 2^58)."""
    a0 = a & 0x7FFF
    a1 = a >> 15                      # < 2^15
    b0 = b & 0x7FFF
    b1 = b >> 15                      # < 2^13
    p00 = a0 * b0                     # < 2^30
    mid = a0 * b1 + a1 * b0           # < 2^31
    p11 = a1 * b1                     # < 2^28
    hi, lo = _add64(mid >> 17, mid << 15, p11 >> 2, p11 << 30)
    return _add64(hi, lo, jnp.zeros_like(p00), p00)


def _redc64_pair(hi, lo, p: int, qinv: int):
    """One Montgomery R=2^30 reduction of a non-negative 64-bit pair
    S < 2^60: returns T = (S + m·p)/2^30 ≡ S·R^{-1} (mod p), T < S/2^30 + p.
    T must fit i32 (callers guarantee S < 2^60)."""
    m = _mul_lo30(lo & MASK30, jnp.int32(qinv))
    mh, ml = _mul_pair_30x28(m, jnp.int32(p))
    hi, lo = _add64(hi, lo, mh, ml)
    return _shr64_lo32(hi, lo, 30)


def _mul_d30_w64(d, w: int):
    """(d · w) mod 2^64 as (hi, lo), for 0 ≤ d < 2^30 and static w < 2^64.

    15-bit digit schoolbook: every partial product < 2^30 stays in i32.
    """
    parts = []
    for j, dj in enumerate((d & 0x7FFF, d >> 15)):
        for k in range(5):
            wk = (w >> (15 * k)) & 0x7FFF
            sh = 15 * (j + k)
            if wk == 0 or sh >= 64:
                continue
            parts.append(_shl64_u31(dj * jnp.int32(wk), sh))
    hi = jnp.zeros_like(d)
    lo = jnp.zeros_like(d)
    for ph, pll in parts:
        hi, lo = _add64(hi, lo, ph, pll)
    return hi, lo


# ---------------------------------------------------------------------------
# Shared in-kernel tail: Garner CRT lift → centering → bit-window normalize
# (the big-accumulator exit, reference/fft64/vec_znx_big.rs:241-278; used by
# the VPU mega-kernel, kernel B, and the MXU mega-kernel in pallas_fused_mxu)
# ---------------------------------------------------------------------------

def garner_center_pairs(ys, primes, qinvs, basis: PrimeBasis):
    """Canonical residues per prime (list of [rows, N] i32) → centered CRT
    value mod 2^64 as an (hi, lo) i32 pair (hal.ntt.garner_lift recurrence +
    lexicographic M/2 centering)."""
    P = len(primes)
    digits = []
    for i, p in enumerate(primes):
        xi = ys[i]
        for j in range(i):
            c = int(basis.garner_pprod_mont[i, j])
            xi = _sub_mod(
                xi, mont_mul_i32(digits[j], jnp.int32(c), p, qinvs[i]), p
            )
        if i > 0:
            xi = mont_mul_i32(
                xi, jnp.int32(int(basis.garner_inv_mont[i])), p, qinvs[i]
            )
        digits.append(xi)

    weights = [int(np.uint64(w.view(np.uint64)))
               for w in basis.garner_weight_u64]
    hi = jnp.zeros_like(digits[0])
    lo = digits[0]                          # W_0 = 1
    for i in range(1, P):
        ph, plo = _mul_d30_w64(digits[i], weights[i])
        hi, lo = _add64(hi, lo, ph, plo)

    # centering: subtract M when (d_{P-1},…,d_0) >lex digits of M/2
    gt = jnp.zeros(lo.shape, dtype=bool)
    eq = jnp.ones(lo.shape, dtype=bool)
    for i in range(P - 1, -1, -1):
        hd = jnp.int32(int(basis.half_digits[i]))
        gt = gt | (eq & (digits[i] > hd))
        eq = eq & (digits[i] == hd)
    m64 = basis.modulus & ((1 << 64) - 1)
    mh = jnp.where(gt, jnp.int32(_i32c(m64 >> 32)), 0)
    ml = jnp.where(gt, jnp.int32(_i32c(m64)), 0)
    return _sub64(hi, lo, mh, ml)


def normalize_windows(his, los, psize, res_size, kr, ka, offset):
    """(hi, lo) pairs per limb (lists of [T, N]) → res_size normalized limb
    arrays (bit-window telescoping + i32 carry scan,
    hal.normalization.vec_znx_normalize_full with lsh = 0)."""
    mask_kr = (1 << kr) - 1
    accs = []
    for i in range(res_size):
        w = (i + 1) * kr
        acc = None
        for j in range(psize):
            t = w - ((j + 1) * ka - offset)
            if t >= kr:
                continue                    # window provably zero
            if t > 0:
                piece = (los[j] & ((1 << (kr - t)) - 1)) << t
            else:
                piece = _shr64_lo32(his[j], los[j], -t) & mask_kr
            acc = piece if acc is None else acc + piece
        if acc is None:
            acc = jnp.zeros_like(los[0])
        accs.append(acc)

    def gdig(k, v):
        sh = 32 - k
        return (v << sh) >> sh

    out = [None] * res_size
    if res_size == 1:
        out[0] = gdig(kr, accs[0])
    else:
        x0 = gdig(kr, accs[res_size - 1])
        cy = (accs[res_size - 1] - x0) >> kr
        out[res_size - 1] = x0
        for j in range(res_size - 2, 0, -1):
            dj = gdig(kr, accs[j])
            carry_j = (accs[j] - dj) >> kr
            dpc = dj + cy
            x1 = gdig(kr, dpc)
            out[j] = x1
            cy = carry_j + ((dpc - x1) >> kr)
        out[0] = gdig(kr, gdig(kr, accs[0]) + cy)
    return out


# ---------------------------------------------------------------------------
# NTT stage helpers (pure i32, per-prime, scalar immediates)
#
# Paired-row butterflies: a radix-2 stage only consumes the twiddle products
# of its HI lanes (both butterfly outputs read y = x_hi·w), so a uniform
# full-width multiply wastes half the VPU mult work.  Packing the hi-lane
# operands of TWO rows into one vector (stage twiddles are constant within
# each 2·half block, so one twiddle vector serves both) halves the Montgomery
# multiplies per stage at the cost of ~1 extra roll — the multiplies are the
# dominant term (i32 mult ≈ 2× add on the VPU, BENCH_NOTES.md).
# Lane values computed are bitwise identical to the unpaired form.
# ---------------------------------------------------------------------------

def _tw_mul(x, wref, s, stage_index, p, qinv, lazy, shoup):
    """One butterfly twiddle product x·w_s mod p.  shoup=True reads the
    stacked (plain, Harvey-quotient) table (_stage_twiddles_shoup) and runs
    the 6-multiply Shoup reduction; otherwise Montgomery REDC (11 mults).
    Output in [0, 2p) when lazy, canonical [0, p) otherwise."""
    if shoup:
        w = wref[s, 0, stage_index]
        wq = wref[s, 1, stage_index]
        if lazy:
            return shoup_mul_i32_lazy(x, w, wq, p)
        return shoup_mul_i32(x, w, wq, p)
    w = wref[s, stage_index]
    if lazy:
        return mont_mul_i32_lazy(x, w, p, qinv)
    return mont_mul_i32(x, w, p, qinv)


def _ntt_rows_paired(x, wref, n, logn, p, qinv, stage_index, lazy=False,
                     shoup=False):
    """Forward Cooley–Tukey stages on [rows, N] (rows even) for one prime,
    one twiddle multiply per ROW PAIR per stage.  Bit-exact vs _ntt_rows."""
    rows = x.shape[0]
    h = rows // 2
    a = x[:h]
    b = x[h:]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    for s in range(logn):
        half = n >> (s + 1)
        mask = (lane & (2 * half - 1)) < half
        # pack: lo lanes ← b's hi-partner values, hi lanes ← a's own
        c = jnp.where(mask, pltpu.roll(b, jnp.int32(n - half), axis=1), a)
        yc = _tw_mul(c, wref, s, stage_index, p, qinv, lazy, shoup)
        ya = jnp.where(mask, pltpu.roll(yc, jnp.int32(n - half), axis=1), yc)
        yb = jnp.where(mask, yc, pltpu.roll(yc, jnp.int32(half), axis=1))
        if lazy:
            a = _csub(jnp.where(
                mask, a + ya,
                pltpu.roll(a, jnp.int32(half), axis=1) - ya + 2 * p,
            ), 2 * p)
            b = _csub(jnp.where(
                mask, b + yb,
                pltpu.roll(b, jnp.int32(half), axis=1) - yb + 2 * p,
            ), 2 * p)
        else:
            a = jnp.where(
                mask,
                _add_mod(a, ya, p),
                _sub_mod(pltpu.roll(a, jnp.int32(half), axis=1), ya, p),
            )
            b = jnp.where(
                mask,
                _add_mod(b, yb, p),
                _sub_mod(pltpu.roll(b, jnp.int32(half), axis=1), yb, p),
            )
    return jnp.concatenate([a, b], axis=0)


def _ninv_scale(x, ninv, p, qinv, lazy, shoup):
    """Final N^{-1} scale of an inverse transform.  `ninv` is the
    (montgomery, plain, shoup-quotient) triple; the Shoup form saves 5
    vector multiplies per row (shoup_mul_i32_lazy vs mont_mul_i32_lazy)
    and is bit-identical (both canonicalize to x·N^{-1} mod p)."""
    nm, nw, nq = ninv
    if lazy:
        if shoup:
            # x < 2p < 2^29 ⇒ r < p·(1 + 2p/2^30) < 3p/2 ⇒ one csub
            return _csub(
                shoup_mul_i32_lazy(x, jnp.int32(nw), jnp.int32(nq), p), p
            )
        return _csub(mont_mul_i32_lazy(x, jnp.int32(nm), p, qinv), p)
    return mont_mul_i32(x, jnp.int32(nm), p, qinv)


def _intt_rows_paired(x, wref, n, logn, p, qinv, ninv, stage_index,
                      lazy=False, shoup=False):
    """Inverse Gentleman–Sande stages + N^{-1} scale, one twiddle multiply
    per ROW PAIR per stage.  Bit-exact vs _intt_rows."""
    rows = x.shape[0]
    h = rows // 2
    a = x[:h]
    b = x[h:]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    for si in range(logn):
        s = logn - 1 - si
        half = n >> (s + 1)
        mask = (lane & (2 * half - 1)) < half
        if lazy:
            da = pltpu.roll(a, jnp.int32(half), axis=1) - a + 2 * p
            db = pltpu.roll(b, jnp.int32(half), axis=1) - b + 2 * p
        else:
            da = _sub_mod(pltpu.roll(a, jnp.int32(half), axis=1), a, p)
            db = _sub_mod(pltpu.roll(b, jnp.int32(half), axis=1), b, p)
        c = jnp.where(mask, pltpu.roll(db, jnp.int32(n - half), axis=1), da)
        vc = _tw_mul(c, wref, si, stage_index, p, qinv, lazy, shoup)
        if lazy:
            ua = a + pltpu.roll(a, jnp.int32(n - half), axis=1)
            ub = b + pltpu.roll(b, jnp.int32(n - half), axis=1)
            a = _csub(jnp.where(mask, ua, vc), 2 * p)
            b = _csub(jnp.where(
                mask, ub, pltpu.roll(vc, jnp.int32(half), axis=1)
            ), 2 * p)
        else:
            ua = _add_mod(a, pltpu.roll(a, jnp.int32(n - half), axis=1), p)
            ub = _add_mod(b, pltpu.roll(b, jnp.int32(n - half), axis=1), p)
            a = jnp.where(mask, ua, vc)
            b = jnp.where(mask, ub, pltpu.roll(vc, jnp.int32(half), axis=1))
    x = jnp.concatenate([a, b], axis=0)
    return _ninv_scale(x, ninv, p, qinv, lazy, shoup)


def _ntt_rows_sl(x, wref, n, logn, p, qinv, stage_index, lazy=False):
    """Forward Cooley–Tukey stages on the sublane/lane-split layout
    [rows, S, 128] (S = N/128; element j ↦ (j//128, j%128)).

    Butterflies with half ≥ 128 exchange across SUBLANES — realized as
    slice arithmetic with NO rolls, masks, or selects, and the twiddle
    multiply touches only the hi half of the data.  Butterflies with
    half < 128 stay within one 128-lane register row, so their pltpu.roll
    is a native single-register lane rotate instead of a synthesized
    N-lane rotate across N/128 registers (BENCH_NOTES: a 2048-lane roll
    ≈ several vector ops).  Lane stages keep the paired-row trick (one
    twiddle multiply per row pair) when rows is even.

    Same arithmetic mod p as _ntt_rows/_ntt_rows_paired (lazy: values in
    [0, 2p) between stages)."""
    S = x.shape[-2]
    nsub = max(0, S.bit_length() - 1)
    two_p = jnp.int32(2 * p)
    for s in range(nsub):
        half = n >> (s + 1)
        hs = half // 128
        w = wref[s, stage_index]
        parts = []
        for b0 in range(0, S, 2 * hs):
            lo = x[:, b0 : b0 + hs]
            hi = x[:, b0 + hs : b0 + 2 * hs]
            wv = w[b0 + hs : b0 + 2 * hs]
            if lazy:
                y = mont_mul_i32_lazy(hi, wv, p, qinv)
                parts.append(_csub(lo + y, 2 * p))
                parts.append(_csub(lo - y + two_p, 2 * p))
            else:
                y = mont_mul_i32(hi, wv, p, qinv)
                parts.append(_add_mod(lo, y, p))
                parts.append(_sub_mod(lo, y, p))
        x = jnp.concatenate(parts, axis=1)

    rows = x.shape[0]
    if rows % 2 == 0 and nsub < logn:
        h = rows // 2
        a = x[:h]
        b = x[h:]
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
        for s in range(nsub, logn):
            half = n >> (s + 1)
            w = wref[s, stage_index]
            mask = (lane & (2 * half - 1)) < half
            c = jnp.where(
                mask, pltpu.roll(b, jnp.int32(128 - half), axis=2), a
            )
            if lazy:
                yc = mont_mul_i32_lazy(c, w, p, qinv)
            else:
                yc = mont_mul_i32(c, w, p, qinv)
            ya = jnp.where(
                mask, pltpu.roll(yc, jnp.int32(128 - half), axis=2), yc
            )
            yb = jnp.where(mask, yc, pltpu.roll(yc, jnp.int32(half), axis=2))
            if lazy:
                a = _csub(jnp.where(
                    mask, a + ya,
                    pltpu.roll(a, jnp.int32(half), axis=2) - ya + 2 * p,
                ), 2 * p)
                b = _csub(jnp.where(
                    mask, b + yb,
                    pltpu.roll(b, jnp.int32(half), axis=2) - yb + 2 * p,
                ), 2 * p)
            else:
                a = jnp.where(
                    mask,
                    _add_mod(a, ya, p),
                    _sub_mod(pltpu.roll(a, jnp.int32(half), axis=2), ya, p),
                )
                b = jnp.where(
                    mask,
                    _add_mod(b, yb, p),
                    _sub_mod(pltpu.roll(b, jnp.int32(half), axis=2), yb, p),
                )
        return jnp.concatenate([a, b], axis=0)

    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    for s in range(nsub, logn):
        half = n >> (s + 1)
        w = wref[s, stage_index]
        mask = (lane & (2 * half - 1)) < half
        if lazy:
            y = mont_mul_i32_lazy(x, w, p, qinv)
            lo_new = x + pltpu.roll(y, jnp.int32(128 - half), axis=2)
            hi_new = pltpu.roll(x, jnp.int32(half), axis=2) - y + 2 * p
            x = _csub(jnp.where(mask, lo_new, hi_new), 2 * p)
        else:
            y = mont_mul_i32(x, w, p, qinv)
            lo_new = _add_mod(
                x, pltpu.roll(y, jnp.int32(128 - half), axis=2), p
            )
            hi_new = _sub_mod(pltpu.roll(x, jnp.int32(half), axis=2), y, p)
            x = jnp.where(mask, lo_new, hi_new)
    return x


def _intt_rows_sl(x, wref, n, logn, p, qinv, ninv, stage_index,
                  lazy=False):
    """Inverse Gentleman–Sande stages + N^{-1} scale on the sublane/lane
    split layout [rows, S, 128] (see _ntt_rows_sl): lane stages first
    (paired when rows even), then roll-free sublane stages."""
    S = x.shape[-2]
    nsub = max(0, S.bit_length() - 1)
    nlane = logn - nsub
    two_p = jnp.int32(2 * p)

    rows = x.shape[0]
    if rows % 2 == 0 and nlane > 0:
        h = rows // 2
        a = x[:h]
        b = x[h:]
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 2)
        for si in range(nlane):
            s = logn - 1 - si
            half = n >> (s + 1)
            w = wref[si, stage_index]
            mask = (lane & (2 * half - 1)) < half
            if lazy:
                da = pltpu.roll(a, jnp.int32(half), axis=2) - a + 2 * p
                db = pltpu.roll(b, jnp.int32(half), axis=2) - b + 2 * p
            else:
                da = _sub_mod(pltpu.roll(a, jnp.int32(half), axis=2), a, p)
                db = _sub_mod(pltpu.roll(b, jnp.int32(half), axis=2), b, p)
            c = jnp.where(
                mask, pltpu.roll(db, jnp.int32(128 - half), axis=2), da
            )
            if lazy:
                vc = mont_mul_i32_lazy(c, w, p, qinv)
                ua = a + pltpu.roll(a, jnp.int32(128 - half), axis=2)
                ub = b + pltpu.roll(b, jnp.int32(128 - half), axis=2)
                a = _csub(jnp.where(mask, ua, vc), 2 * p)
                b = _csub(jnp.where(
                    mask, ub, pltpu.roll(vc, jnp.int32(half), axis=2)
                ), 2 * p)
            else:
                vc = mont_mul_i32(c, w, p, qinv)
                ua = _add_mod(
                    a, pltpu.roll(a, jnp.int32(128 - half), axis=2), p
                )
                ub = _add_mod(
                    b, pltpu.roll(b, jnp.int32(128 - half), axis=2), p
                )
                a = jnp.where(mask, ua, vc)
                b = jnp.where(
                    mask, ub, pltpu.roll(vc, jnp.int32(half), axis=2)
                )
        x = jnp.concatenate([a, b], axis=0)
    elif nlane > 0:
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        for si in range(nlane):
            s = logn - 1 - si
            half = n >> (s + 1)
            w = wref[si, stage_index]
            mask = (lane & (2 * half - 1)) < half
            partner = jnp.where(
                mask,
                pltpu.roll(x, jnp.int32(128 - half), axis=2),
                pltpu.roll(x, jnp.int32(half), axis=2),
            )
            if lazy:
                u = x + partner
                v = mont_mul_i32_lazy(partner - x + 2 * p, w, p, qinv)
                x = _csub(jnp.where(mask, u, v), 2 * p)
            else:
                u = _add_mod(x, partner, p)
                v = mont_mul_i32(_sub_mod(partner, x, p), w, p, qinv)
                x = jnp.where(mask, u, v)

    for si in range(nlane, logn):
        s = logn - 1 - si
        half = n >> (s + 1)
        hs = half // 128
        w = wref[si, stage_index]
        parts = []
        for b0 in range(0, S, 2 * hs):
            lo = x[:, b0 : b0 + hs]
            hi = x[:, b0 + hs : b0 + 2 * hs]
            wv = w[b0 + hs : b0 + 2 * hs]
            if lazy:
                parts.append(_csub(lo + hi, 2 * p))
                parts.append(
                    mont_mul_i32_lazy(lo - hi + two_p, wv, p, qinv)
                )
            else:
                parts.append(_add_mod(lo, hi, p))
                parts.append(
                    mont_mul_i32(_sub_mod(lo, hi, p), wv, p, qinv)
                )
        x = jnp.concatenate(parts, axis=1)

    return _ninv_scale(x, ninv, p, qinv, lazy, False)


def _ntt_rows(x, wref, lane, n, logn, p, qinv, stage_index, lazy=False,
              shoup=False):
    """Forward Cooley–Tukey stages on [rows, N] for one prime (scalar p).

    lazy=True (p < 2^28): x carried in [0, 2p) with one csub per stage
    (Harvey butterflies); the RESULT is also in [0, 2p) — callers reduce
    where canonical values are required."""
    for s in range(logn):
        half = n >> (s + 1)
        mask = (lane & (2 * half - 1)) < half
        y = _tw_mul(x, wref, s, stage_index, p, qinv, lazy, shoup)
        if lazy:
            lo_new = x + pltpu.roll(y, jnp.int32(n - half), axis=1)
            hi_new = pltpu.roll(x, jnp.int32(half), axis=1) - y + 2 * p
            x = _csub(jnp.where(mask, lo_new, hi_new), 2 * p)
        else:
            lo_new = _add_mod(
                x, pltpu.roll(y, jnp.int32(n - half), axis=1), p
            )
            hi_new = _sub_mod(pltpu.roll(x, jnp.int32(half), axis=1), y, p)
            x = jnp.where(mask, lo_new, hi_new)
    return x


def _intt_rows(x, wref, lane, n, logn, p, qinv, ninv, stage_index,
               lazy=False, shoup=False):
    """Inverse Gentleman–Sande stages + N^{-1} scale, one prime.

    lazy=True accepts x in [0, 2p) and returns canonical [0, p)."""
    for si in range(logn):
        s = logn - 1 - si
        half = n >> (s + 1)
        mask = (lane & (2 * half - 1)) < half
        partner = jnp.where(
            mask,
            pltpu.roll(x, jnp.int32(n - half), axis=1),
            pltpu.roll(x, jnp.int32(half), axis=1),
        )
        if lazy:
            u = x + partner                              # [0, 4p)
            v = _tw_mul(partner - x + 2 * p, wref, si, stage_index, p, qinv,
                        True, shoup)
            x = _csub(jnp.where(mask, u, v), 2 * p)
        else:
            u = _add_mod(x, partner, p)
            d_hi = _sub_mod(partner, x, p)
            v = _tw_mul(d_hi, wref, si, stage_index, p, qinv, False, shoup)
            x = jnp.where(mask, u, v)
    return _ninv_scale(x, ninv, p, qinv, lazy, shoup)


def _lazy_reduce(x, bound: int, p: int, target: int):
    """csub chain bringing a value known < `bound` down to < `target`
    (target a small multiple of p).  Static bound arithmetic — the chain is
    unrolled at trace time."""
    while bound > target:
        t = 1 << max(0, (bound // p).bit_length() - 2)
        x = _csub(x, t * p)
        bound = max(t * p, bound - t * p)
    return x


# ---------------------------------------------------------------------------
# The single fused pipeline kernel:
#   residues → NTT → per-block-element (VMP [+ X^a rotate − id]) accumulate
#   → iNTT → Garner → (+ acc | + small) → big_normalize
# block == 1 / rotate == False is the plain external product / keyswitch;
# block ≥ 1 / rotate == True is one block-binary CGGI step
# (poulpy-bin-fhe/src/blind_rotation/algorithms/cggi/algorithm.rs:275-368).
# ---------------------------------------------------------------------------

def _kernel_pipe(n, logn, primes, qinvs, ninvs, basis: PrimeBasis,
                 t_tile, cols, size_a, rmax, co, psize,
                 res_size, kr, ka, offset, block, rotate, add_acc, s_size,
                 s64_size, shoup, rot_mode, steps,
                 *refs):
    it = iter(refs)
    a_ref = next(it)
    wf_ref = next(it)
    wi_ref = next(it)
    pm_ref = next(it)
    xp_ref = next(it) if rotate else None
    sm_ref = next(it) if s_size else None
    s64h_ref = next(it) if s64_size else None
    s64l_ref = next(it) if s64_size else None
    o_ref = next(it)

    P = len(primes)
    kk = cols * rmax
    mdim = co * psize
    lazy = lazy_ok(primes)
    i32_cap = 1 << 31
    x = a_ref[...]         # [T·cols·size_a, N] or [T·cols·size_a, S, 128]
    sl = x.ndim == 3       # sublane/lane-split layout (see _ntt_rows_sl)
    tail = x.shape[1:]

    # steps > 1 chains whole block steps inside ONE kernel launch (the
    # normalized accumulator never leaves VMEM between them) — valid when
    # the output shape re-enters as the accumulator (BR: cols == co,
    # size_a == res_size, add_acc, rotate)
    assert steps == 1 or (rotate and add_acc and cols == co
                          and size_a == res_size and not s_size
                          and not s64_size and not sl)
    for st in range(steps):
        ys = []
        for pi, p in enumerate(primes):
            qinv = qinvs[pi]
            if lazy:
                # residues: |x| < 2^29 ⇒ shift by a p-multiple ≥ 2^29 to make
                # non-negative, then csub chain (NTT entry only needs [0, 2p))
                shift = 4 * p
                while shift < (1 << 29):
                    shift *= 2
                r = _lazy_reduce(x + jnp.int32(shift), (1 << 29) + shift,
                                 p, 2 * p)
            else:
                # residues: |x| < 2^29 < 2p ⇒ one conditional add + one csub
                r = jnp.where(x < 0, x + jnp.int32(2 * p), x)
                r = jnp.where(r >= p, r - p, r)
            if sl:
                r = _ntt_rows_sl(r, wf_ref, n, logn, p, qinv, pi, lazy)
            elif r.shape[0] % 2 == 0:
                r = _ntt_rows_paired(r, wf_ref, n, logn, p, qinv, pi, lazy,
                                     shoup)
            else:
                lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                r = _ntt_rows(r, wf_ref, lane, n, logn, p, qinv, pi, lazy,
                              shoup)
            r4 = r.reshape(t_tile, cols, size_a, *tail)[:, :, :rmax]
            r4 = r4.reshape(t_tile, kk, *tail)  # [0, 2p) when lazy else [0, p)
            add = None
            add_b = 0                           # static value bound (lazy mode)
            for bi in range(block):
                if rotate and rot_mode == 1:
                    # (X^{a_i} − 1) applied to the VMP INPUT (the external
                    # product is linear in acc: xp·(acc ⊡ K) = (xp·acc) ⊡ K)
                    # — kk rows of 6-mul Shoup products instead of mdim rows
                    # of 11-mul Montgomery products on the output (kk < mdim
                    # at every BR config: rmax ≤ size < psize).  xp_ref
                    # stacks (plain, Harvey quotient) per table entry.
                    # NOTE: the two-plane table doubles xp VMEM — measured
                    # to interact negatively with steps chaining
                    # (BENCH_NOTES r5 gate A/B).
                    xw = xp_ref[pi, st * block + bi, 0][:, None]  # [T,1,N]
                    xq = xp_ref[pi, st * block + bi, 1][:, None]
                    # r4 < 2p < 2^29 ⇒ Shoup result < p·(1 + 2p/2^30) < 2p
                    rsrc = shoup_mul_i32_lazy(r4, xw, xq, p)
                elif rotate and rot_mode == 2:
                    # input-side with the SINGLE-PLANE Montgomery table:
                    # kk rows of 9-mul lazy REDC replace mdim rows of the
                    # same — no extra VMEM, composes with steps chaining
                    xw = xp_ref[pi, st * block + bi][:, None]     # [T,1,N]
                    rsrc = mont_mul_i32_lazy(r4, xw, p, qinv)     # < 2p
                else:
                    rsrc = r4
                acc = None
                acc_b = 0
                if lazy:
                    # deferred REDC: accumulate full 64-bit products (4 digit
                    # muls each), ONE Montgomery fold per ≤16-term chunk —
                    # instead of a full REDC (11 digit muls) per term.
                    # Chunk bound: S < 16·2p·p < 2^61 keeps T = S·R^{-1}
                    # < S/2^30 + p < 2^31 in i32 (and < 4p when kk ≤ 6).
                    for k0 in range(0, kk, 16):
                        ks = range(k0, min(k0 + 16, kk))
                        hi = lo = None
                        for k in ks:
                            ak = rsrc[:, k][:, None]                 # < 2p
                            bk = pm_ref[pi, st * block + bi, k][None]             # < p
                            ph, plo = _mul_pair_30x28(ak, bk)
                            if hi is None:
                                hi, lo = ph, plo
                            else:
                                hi, lo = _add64(hi, lo, ph, plo)
                        t = _redc64_pair(hi, lo, p, qinv)
                        t_b = ((len(ks) * 2 * p * p) >> 30) + p + 1
                        if acc is None:
                            acc, acc_b = t, t_b
                        else:
                            if acc_b + t_b >= i32_cap:
                                acc = _lazy_reduce(acc, acc_b, p, 2 * p)
                                acc_b = 2 * p
                            acc = acc + t
                            acc_b += t_b
                else:
                    for k in range(kk):
                        ak = rsrc[:, k][:, None]
                        bk = pm_ref[pi, st * block + bi, k][None]
                        term = mont_mul_i32(ak, bk, p, qinv)         # [T, M, N]
                        acc = term if acc is None else _add_mod(acc, term, p)
                if rotate and rot_mode == 0:
                    # xp holds Montgomery NTT(X^{a_i} − 1) (the −1 is folded
                    # into the table, _xpow_minus1_table), so the rotate-and-
                    # subtract collapses to ONE multiply
                    xp = xp_ref[pi, st * block + bi]         # [T, N]
                    if lazy:
                        if acc_b > min(4 * p, 1 << 30):
                            acc = _lazy_reduce(acc, acc_b, p, 2 * p)
                        acc = mont_mul_i32_lazy(acc, xp[:, None], p, qinv)
                        acc_b = 2 * p
                    else:
                        acc = mont_mul_i32(acc, xp[:, None], p, qinv)
                if add is None:
                    add, add_b = acc, acc_b
                elif lazy:
                    if add_b + acc_b >= i32_cap:
                        add = _lazy_reduce(add, add_b, p, 2 * p)
                        add_b = 2 * p
                    if add_b + acc_b >= i32_cap:
                        acc = _lazy_reduce(acc, acc_b, p, 2 * p)
                        acc_b = 2 * p
                    add = add + acc
                    add_b += acc_b
                else:
                    add = _add_mod(add, acc, p)
            if lazy:
                add = _lazy_reduce(add, add_b, p, 2 * p)
            y = add.reshape(t_tile * mdim, *tail)
            if sl:
                ys.append(_intt_rows_sl(y, wi_ref, n, logn, p, qinv,
                                        ninvs[pi], pi, lazy))
            elif y.shape[0] % 2 == 0:
                ys.append(_intt_rows_paired(y, wi_ref, n, logn, p, qinv,
                                            ninvs[pi], pi, lazy, shoup))
            else:
                lane_y = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                ys.append(_intt_rows(y, wi_ref, lane_y, n, logn, p, qinv,
                                     ninvs[pi], pi, lazy, shoup))

        hi, lo = garner_center_pairs(ys, primes, qinvs, basis)  # [T·M, N]

        hi = hi.reshape(t_tile, co, psize, *tail)
        lo = lo.reshape(t_tile, co, psize, *tail)
        his = [[hi[:, c, j] for j in range(psize)] for c in range(co)]
        los = [[lo[:, c, j] for j in range(psize)] for c in range(co)]

        # --- + acc (block-binary carry) or + body (keyswitch), sign-extended ---
        if add_acc:
            x4 = x.reshape(t_tile, cols, size_a, *tail)
            for c in range(min(cols, co)):
                for j in range(min(size_a, psize)):
                    sj = x4[:, c, j]
                    his[c][j], los[c][j] = _add64(his[c][j], los[c][j],
                                                  sj >> 31, sj)
        if s_size:
            sm = sm_ref[...].reshape(t_tile, s_size, *tail)
            for j in range(min(s_size, psize)):
                sj = sm[:, j]
                his[0][j], los[0][j] = _add64(his[0][j], los[0][j], sj >> 31, sj)

        # --- + per-column 64-bit terms (tensor-relinearize linear parts), as
        # (hi, lo) i32 pairs; may carry MORE limbs than the product (the conv
        # output is longer than the key psize) — extend with zero pairs --------
        ext_size = max(psize, s64_size)
        if s64_size:
            zero = jnp.zeros((t_tile,) + tail, jnp.int32)
            for c in range(co):
                his[c] += [zero] * (ext_size - psize)
                los[c] += [zero] * (ext_size - psize)
            h4 = s64h_ref[...].reshape(t_tile, co, s64_size, *tail)
            l4 = s64l_ref[...].reshape(t_tile, co, s64_size, *tail)
            for c in range(co):
                for j in range(s64_size):
                    his[c][j], los[c][j] = _add64(
                        his[c][j], los[c][j], h4[:, c, j], l4[:, c, j]
                    )

        # --- bit-window telescoping + i32 carry scan (per output column) -------
        out_rows = []
        for c in range(co):
            out_rows.extend(
                normalize_windows(his[c], los[c], ext_size, res_size, kr, ka,
                                  offset)
            )
        rows = jnp.stack(out_rows, axis=1).reshape(
            (t_tile * co * res_size,) + tail
        )
        if st + 1 < steps:
            x = rows          # normalized acc feeds the next fused step
        else:
            o_ref[...] = rows


@functools.lru_cache(maxsize=None)
def _pipe_fn(n: int, primes: tuple, t_tile: int, cols: int, size_a: int,
             rmax: int, co: int, psize: int, res_size: int, kr: int, ka: int,
             offset: int, block: int, rotate: bool, s_size: int,
             add_acc: bool, s64_size: int = 0, shoup: bool = False,
             rot_mode: int = 0, steps: int = 1):
    logn = n.bit_length() - 1
    P = len(primes)
    kk = cols * rmax
    mdim = co * psize
    assert rot_mode == 0 or lazy_ok(primes)  # input rotate needs [0,2p) math
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(_ninv_triple(n, p) for p in primes)
    # sublane/lane-split layout (see _ntt_rows_sl): reshape every [..., N]
    # operand to [..., S, 128] — free at the XLA level (contiguous view) —
    # so sublane butterflies become slice arithmetic and lane rolls stay
    # within one 128-lane register
    sl = (n % 128 == 0 and n >= 128
          and os.environ.get("POULPY_TPU_SL", "0") != "0")
    shoup = shoup and not sl      # sl path keeps Montgomery butterflies
    if shoup:
        wf = _stage_twiddles_shoup(primes, n, False, P)  # [logn, 2, P, N]
        wi = _stage_twiddles_shoup(primes, n, True, P)
    else:
        wf = _stage_twiddles(primes, n, False, P)        # [logn, P, N]
        wi = _stage_twiddles(primes, n, True, P)
    basis = PrimeBasis(primes)
    kernel = functools.partial(
        _kernel_pipe, n, logn, primes, qinvs, ninvs, basis,
        t_tile, cols, size_a, rmax, co, psize,
        res_size, kr, ka, offset, block, rotate, add_acc, s_size, s64_size,
        shoup, rot_mode, steps,
    )
    rows_a = cols * size_a
    tail = (n // 128, 128) if sl else (n,)
    zi = (0,) * len(tail)

    def fn(a, pm, xp=None, sm=None, s64h=None, s64l=None):
        # a: [Bp·cols·size_a, N] i32; pm: [P, block, KK, M, N] i32
        # xp: [P, block, Bp, N] i32; sm: [Bp·s_size, N] i32
        bp = a.shape[0] // rows_a
        grid = (bp // t_tile,)
        wlead = 3 if shoup else 2     # (logn, [2,] P)
        wspec = pl.BlockSpec(
            wf.shape[:wlead] + tail, lambda bi: (0,) * wlead + zi,
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec((t_tile * rows_a,) + tail,
                         lambda bi: (bi,) + zi, memory_space=pltpu.VMEM),
            wspec,
            wspec,
            pl.BlockSpec((P, steps * block, kk, mdim) + tail,
                         lambda bi: (0, 0, 0, 0) + zi,
                         memory_space=pltpu.VMEM),
        ]
        args = [
            a.reshape(a.shape[:1] + tail),
            jnp.asarray(wf).reshape(wf.shape[:wlead] + tail),
            jnp.asarray(wi).reshape(wi.shape[:wlead] + tail),
            pm.reshape(pm.shape[:4] + tail),
        ]
        if rotate:
            # rot_mode 1: xp stacks (plain, Harvey quotient) → extra axis
            xlead = ((P, steps * block, 2, t_tile) if rot_mode == 1
                     else (P, steps * block, t_tile))
            nfix = len(xlead) - 1
            in_specs.append(
                pl.BlockSpec(xlead + tail,
                             lambda bi, _n=nfix: (0,) * _n + (bi,) + zi,
                             memory_space=pltpu.VMEM)
            )
            args.append(xp.reshape(xp.shape[: nfix + 1] + tail))
        if s_size:
            in_specs.append(
                pl.BlockSpec((t_tile * s_size,) + tail,
                             lambda bi: (bi,) + zi,
                             memory_space=pltpu.VMEM)
            )
            args.append(sm.reshape(sm.shape[:1] + tail))
        if s64_size:
            for arr in (s64h, s64l):
                in_specs.append(
                    pl.BlockSpec((t_tile * co * s64_size,) + tail,
                                 lambda bi: (bi,) + zi,
                                 memory_space=pltpu.VMEM)
                )
                args.append(arr.reshape(arr.shape[:1] + tail))
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (t_tile * co * res_size,) + tail,
                    lambda bi: (bi,) + zi,
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (bp * co * res_size,) + tail, jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*args)
        return out.reshape(bp * co * res_size, n)

    return fn


# ---------------------------------------------------------------------------
# Kernel B: Garner lift → (+ small) → big_normalize  (i32 + pair emulation)
# ---------------------------------------------------------------------------

def _kernel_b(primes, basis: PrimeBasis, psize, s_size, res_size,
              kr, ka, offset, tb,
              *refs):
    if s_size:
        x_ref, sm_ref, o_ref = refs
    else:
        x_ref, o_ref = refs
        sm_ref = None
    P = len(primes)
    n = x_ref.shape[-1]
    qinvs = [(-pow(p, -1, R)) % R for p in primes]

    hi, lo = garner_center_pairs(
        [x_ref[i] for i in range(P)], primes, qinvs, basis
    )                                       # [Tb·psize, N]

    his = [hi.reshape(tb, psize, n)[:, j, :] for j in range(psize)]
    los = [lo.reshape(tb, psize, n)[:, j, :] for j in range(psize)]

    # --- add small term (keyswitch body), sign-extended --------------------
    if sm_ref is not None:
        sm = sm_ref[...].reshape(tb, s_size, n)
        for j in range(min(s_size, psize)):
            sj = sm[:, j, :]
            his[j], los[j] = _add64(his[j], los[j], sj >> 31, sj)

    out = normalize_windows(his, los, psize, res_size, kr, ka, offset)
    o_ref[...] = jnp.stack(out, axis=1).reshape(tb * res_size, n)


@functools.lru_cache(maxsize=None)
def _kernel_b_fn(n: int, primes: tuple, psize: int, s_size: int,
                 res_size: int, kr: int, ka: int, offset: int, tb: int):
    basis = PrimeBasis(primes)
    P = len(primes)
    kernel = functools.partial(
        _kernel_b, primes, basis, psize, s_size, res_size, kr, ka, offset, tb
    )

    def fn(x, sm=None):  # x: [P, Bq·psize, N] i32; sm: [Bq·s_size, N] i32
        bq = x.shape[1] // psize
        grid = (bq // tb,)
        in_specs = [
            pl.BlockSpec((P, tb * psize, n), lambda bi: (0, bi, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [x]
        if s_size:
            in_specs.append(
                pl.BlockSpec((tb * s_size, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(sm)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (tb * res_size, n), lambda bi: (bi, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (bq * res_size, n), jnp.int32
                ),
            )(*args)

    return fn


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def fused_supported(module: Module, psize: int, res_base2k: int) -> bool:
    """Static validity of the fused path (see module docstring)."""
    return res_base2k + (psize + 1).bit_length() <= 31 and res_base2k <= 26


def _use_shoup() -> bool:
    """Harvey/Shoup twiddle butterflies (6 vector multiplies per twiddle
    product vs Montgomery's 11 — see shoup_mul_i32_lazy).  Default on;
    POULPY_TPU_SHOUP=0 restores the Montgomery butterflies."""
    return os.environ.get("POULPY_TPU_SHOUP", "1") != "0"


_T_TILE = int(os.environ.get("POULPY_TPU_TTILE", "32"))
# t-tile re-sweep 2026-08-20 (deferred-REDC kernel, B=16384): t8 102.6k,
# t16 106.9k, t32@24MB 110.0k ext-products/s
_VMEM_BUDGET_MB = int(os.environ.get("POULPY_TPU_VMEM_MB", "24"))


def _pick_tile(n, P, cols, size_a, rmax, co, psize, block, b_tot,
               t_tile=None):
    """Largest batch tile keeping the kernel working set under the VMEM
    budget (default ~10 MB; POULPY_TPU_TTILE / POULPY_TPU_VMEM_MB tune)."""
    if t_tile is None:
        t_tile = _T_TILE
    t_tile = min(t_tile, max(1, b_tot))
    kk = cols * rmax
    mdim = co * psize
    logn = n.bit_length() - 1

    def vmem_bytes(t):
        return 4 * n * (
            t * cols * size_a + P * t * cols * size_a
            + P * block * kk * mdim + 2 * P * t * mdim
            + 2 * logn * P + block * P * t
        )

    while t_tile > 1 and vmem_bytes(t_tile) > _VMEM_BUDGET_MB * (1 << 20):
        t_tile -= 1
    if t_tile > 4:
        # keep block row counts 8-divisible (Mosaic tiling constraint)
        t_tile = 1 << (t_tile.bit_length() - 1)
    return t_tile


def pm_kernel_layout(pmat, rmax: int):
    """[..., rows, ci, co, psize, P, N] Montgomery pmat → kernel layout
    [..., P, KK=(ci·rmax), M=(co·psize), N] i32 (ci-major, row-minor)."""
    lead = pmat.ndim - 6
    pm = jnp.moveaxis(pmat[..., :rmax, :, :, :, :, :], lead + 4, lead)
    pm = jnp.swapaxes(pm, lead + 1, lead + 2)   # [..., P, ci, rmax, co, j, N]
    shape = pm.shape[:lead + 1] + (
        pm.shape[lead + 1] * pm.shape[lead + 2],
        pm.shape[lead + 3] * pm.shape[lead + 4],
        pm.shape[-1],
    )
    return pm.reshape(shape).astype(jnp.int32)


def pm_kernel_layout_dsize(pmat, rmax: int, dsize: int):
    """dsize > 1 kernel layout: the grouped-limb bivariate convolution
    (keyswitching/glwe.rs:321+, Σ_di vmp(a[dsize−1−di :: dsize], pmat,
    limb_offset=di)) is still a plain bilinear form Σ_ℓ a_ℓ · PM[ℓ, m] —
    input limb ℓ maps to gadget row ℓ//dsize with output-limb shift
    di = dsize−1−(ℓ mod dsize), zero-padded past psize.  Building PM host-
    side lets the SAME mega-kernel serve any dsize."""
    rows, ci, co, psize = pmat.shape[:4]
    entries = []
    zero = jnp.zeros_like(pmat[0])
    for limb in range(rmax):
        r = limb // dsize
        di = dsize - 1 - (limb % dsize)
        if r >= rows or di >= psize:
            entries.append(zero)
        else:
            sl = pmat[r, :, :, di:]
            entries.append(jnp.pad(
                sl, ((0, 0), (0, 0), (0, psize - sl.shape[2]),
                     (0, 0), (0, 0))
            ))
    pm = jnp.stack(entries, axis=1)       # [ci, rmax, co, psize, P, N]
    pm = jnp.moveaxis(pm, 4, 0)           # [P, ci, rmax, co, psize, N]
    return pm.reshape(
        pm.shape[0], pm.shape[1] * pm.shape[2], pm.shape[3] * pm.shape[4],
        pm.shape[5],
    ).astype(jnp.int32)


def fused_glwe_product(
    module: Module,
    a_data,                  # [..., ci, size_a, N] i64, |limb| < 2^29
    pmat,                    # [rows, ci, co, psize, P, N] Montgomery
    res_size: int,
    res_base2k: int,
    pm_base2k: int,
    small=None,              # [..., s_size, N] i64 body to add at col 0
    t_tile: int | None = None,
    dsize: int = 1,
    small64=None,            # [..., co, s64, N] i64 big terms, per column
):
    """Fused equivalent of dft_apply → vmp_apply (any dsize) → idft_apply →
    (big_add_small at column 0 | big_add per column for `small64`) →
    big_normalize, bit-exact vs the jnp path.

    `small64` carries full wrapping-i64 values (tensor-relinearize linear
    terms, up to ~2^48): split into (hi, lo) i32 pairs for the in-kernel
    64-bit add; its limb count may exceed the product's psize.
    """
    n = module.n
    P = module.nprimes
    rows, ci, co, psize = pmat.shape[:4]
    lead = a_data.shape[:-3]
    a_size = a_data.shape[-2]
    rmax = min(rows * dsize, a_size)
    assert fused_supported(module, psize, res_base2k)

    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = _pick_tile(n, P, ci, rmax, rmax, co, psize, 1, b_tot, t_tile)
    a32 = a_data[..., :rmax, :].reshape(b_tot, ci * rmax, n).astype(jnp.int32)
    pad = (-b_tot) % t_tile
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0), (0, 0)))
    bp = b_tot + pad

    if dsize == 1:
        pm = pm_kernel_layout(pmat, rmax)     # [P, KK, M, N]
    else:
        pm = pm_kernel_layout_dsize(pmat, rmax, dsize)
    pm = pm[:, None]                          # [P, 1(block), KK, M, N]

    s_size = 0
    sm = None
    if small is not None:
        s_size = small.shape[-2]
        sm = small.reshape(b_tot, s_size, n).astype(jnp.int32)
        if pad:
            sm = jnp.pad(sm, ((0, pad), (0, 0), (0, 0)))
        sm = sm.reshape(bp * s_size, n)

    s64_size = 0
    s64h = s64l = None
    if small64 is not None:
        s64_size = small64.shape[-2]
        sb = small64.reshape(b_tot, co, s64_size, n)
        if pad:
            sb = jnp.pad(sb, ((0, pad), (0, 0), (0, 0), (0, 0)))
        s64h = (sb >> 32).astype(jnp.int32).reshape(bp * co * s64_size, n)
        s64l = (sb & 0xFFFFFFFF).astype(jnp.int32).reshape(
            bp * co * s64_size, n
        )

    out = _pipe_fn(
        n, module.basis.primes, t_tile, ci, rmax, rmax, co, psize,
        res_size, res_base2k, pm_base2k, 0, 1, False, s_size, False,
        s64_size, _use_shoup(),
    )(a32.reshape(bp * ci * rmax, n), pm, sm=sm, s64h=s64h, s64l=s64l)

    out = out.reshape(bp, co, res_size, n)[:b_tot]
    return out.reshape(lead + (co, res_size, n)).astype(jnp.int64)


def fused_br_block_step(
    module: Module,
    acc,                     # [..., cols, size, N] i64 normalized
    pm_k,                    # [P, block, KK, M, N] i32 kernel-layout pmats
    xp,                      # [..., block, P, N] Mont NTT(X^{a_i} − 1) i32,
                             # or [..., block, 2, P, N] (plain, quot) stacked
                             # when rot_mode == 1
    res_size: int,
    base2k: int,
    t_tile: int | None = None,
    rot_mode: int = 0,
    steps: int = 1,
):
    """One fused block-binary CGGI step (algorithm.rs:275-368):

        acc ← normalize(acc + iNTT(Σ_i (X^{a_i} − 1)·(NTT(acc) ⊡ BRK_i)))

    with the (X^{a_i} − 1) factor supplied pre-transformed via
    _xpow_minus1_table (one in-kernel multiply per block element).

    `rot_mode` (lazy primes): 0 applies the factor Montgomery-style to
    the mdim VMP OUTPUT rows (the r4 kernel); 1 applies it to the kk VMP
    *input* rows (the product is linear in acc) as a Harvey/Shoup multiply
    from a stacked (plain, quotient) table; 2 applies it input-side from
    the single-plane Montgomery table (no extra VMEM — the default,
    composing with `steps`).

    bit-exact vs the jnp block path in blind_rotation_execute_block.
    """
    n = module.n
    P = module.nprimes
    blk_tot = pm_k.shape[1]               # steps · block
    assert blk_tot % steps == 0
    block = blk_tot // steps
    lead = acc.shape[:-3]
    cols, size_a = acc.shape[-3], acc.shape[-2]
    kk, mdim = pm_k.shape[2], pm_k.shape[3]
    rmax = kk // cols
    psize = mdim // cols
    assert fused_supported(module, psize, base2k)

    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = _pick_tile(n, P, cols, size_a, rmax, cols, psize, blk_tot,
                        b_tot, t_tile)
    a32 = acc.reshape(b_tot, cols * size_a, n).astype(jnp.int32)
    pad = (-b_tot) % t_tile
    if rot_mode == 1:
        xp32 = xp.reshape(b_tot, blk_tot, 2, P, n).astype(jnp.int32)
        xp32 = jnp.transpose(xp32, (3, 1, 2, 0, 4))  # [P, blk, 2, B, N]
        if pad:
            xp32 = jnp.pad(
                xp32, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
            )
    else:
        xp32 = xp.reshape(b_tot, blk_tot, P, n).astype(jnp.int32)
        xp32 = jnp.transpose(xp32, (2, 1, 0, 3))      # [P, blk, B, N]
        if pad:
            xp32 = jnp.pad(xp32, ((0, 0), (0, 0), (0, pad), (0, 0)))
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0), (0, 0)))
    bp = b_tot + pad

    out = _pipe_fn(
        n, module.basis.primes, t_tile, cols, size_a, rmax, cols, psize,
        res_size, base2k, base2k, 0, block, True, 0, True,
        0, _use_shoup(), rot_mode, steps,
    )(a32.reshape(bp * cols * size_a, n), pm_k, xp=xp32)

    out = out.reshape(bp, cols, res_size, n)[:b_tot]
    return out.reshape(lead + (cols, res_size, n)).astype(jnp.int64)


# ---------------------------------------------------------------------------
# Fused rank-1 tensor product: residues → NTT(a), NTT(b) → limb convolution
# per column pair (deferred-REDC 64-bit sums) → iNTT → Garner → {normalized
# quad digits, linear terms as (hi, lo) pairs}.
# The quad output is exactly big_normalize(quad_big, dnum limbs); the linear
# outputs are exactly the wrapping-i64 idft results split into i32 pairs —
# both feed the existing fused relinearize call (small64).
# (glwe_tensor_apply, poulpy-core/src/operations/glwe.rs:233-296.)
# Lazy-prime (< 2^28) path only; others use the jnp pipeline.
# ---------------------------------------------------------------------------

def _kernel_tensor(n, logn, primes, qinvs, ninvs, r2s, basis: PrimeBasis,
                   t_tile, size_a, size_b, conv_size, dnum, kr, ka, shoup,
                   a_ref, b_ref, wf_ref, wi_ref, d_ref, lh_ref, ll_ref):
    P = len(primes)
    xa = a_ref[...]                   # [T·2·size_a, N] i32, |limb| < 2^29
    xb = b_ref[...]                   # [T·2·size_b, N]

    ys = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        shift = 4 * p
        while shift < (1 << 29):
            shift *= 2

        def entry(x):
            r = _lazy_reduce(x + jnp.int32(shift), (1 << 29) + shift,
                             p, 2 * p)
            if r.shape[0] % 2 == 0:
                return _ntt_rows_paired(r, wf_ref, n, logn, p, qinv, pi,
                                        lazy=True, shoup=shoup)
            lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            return _ntt_rows(r, wf_ref, lane, n, logn, p, qinv, pi,
                             lazy=True, shoup=shoup)

        ra = entry(xa).reshape(t_tile, 2, size_a, n)      # [0, 2p)
        rb = entry(xb).reshape(t_tile, 2, size_b, n)
        # right operand Montgomery + canonical (< p) for the 30×28 products
        rb = _csub(mont_mul_i32_lazy(rb, jnp.int32(r2s[pi]), p, qinv), p)

        # column pairs: 0 → a0·b0, 1 → a0·b1 + a1·b0, 2 → a1·b1
        pairs = [((0, 0),), ((0, 1), (1, 0)), ((1, 1),)]
        rows = []
        for terms in pairs:
            for k in range(conv_size):
                hi = lo = None
                cnt = 0
                for (ci, cj) in terms:
                    for l in range(size_a):
                        j = k - l
                        if not (0 <= j < size_b):
                            continue
                        ph, plo = _mul_pair_30x28(
                            ra[:, ci, l, :], rb[:, cj, j, :]
                        )
                        if hi is None:
                            hi, lo = ph, plo
                        else:
                            hi, lo = _add64(hi, lo, ph, plo)
                        cnt += 1
                if hi is None:
                    rows.append(jnp.zeros((t_tile, n), jnp.int32))
                    continue
                assert cnt <= 16          # single-REDC chunk bound
                t = _redc64_pair(hi, lo, p, qinv)
                t = _lazy_reduce(t, ((cnt * 2 * p * p) >> 30) + p + 1,
                                 p, 2 * p)
                rows.append(t)
        y = jnp.stack(rows, axis=1).reshape(t_tile * 3 * conv_size, n)
        if y.shape[0] % 2 == 0:
            ys.append(_intt_rows_paired(y, wi_ref, n, logn, p, qinv,
                                        ninvs[pi], pi, lazy=True,
                                        shoup=shoup))
        else:
            lane_y = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            ys.append(_intt_rows(y, wi_ref, lane_y, n, logn, p, qinv,
                                 ninvs[pi], pi, lazy=True, shoup=shoup))

    hi, lo = garner_center_pairs(ys, primes, qinvs, basis)  # [T·3·conv, N]
    hi = hi.reshape(t_tile, 3, conv_size, n)
    lo = lo.reshape(t_tile, 3, conv_size, n)

    # quad column (pair index 2) → gadget digits
    his = [hi[:, 2, j, :] for j in range(conv_size)]
    los = [lo[:, 2, j, :] for j in range(conv_size)]
    d = normalize_windows(his, los, conv_size, dnum, kr, ka, 0)
    d_ref[...] = jnp.stack(d, axis=1).reshape(t_tile * dnum, n)
    # linear columns (pairs 0, 1) → raw 64-bit pairs
    lh_ref[...] = hi[:, :2].reshape(t_tile * 2 * conv_size, n)
    ll_ref[...] = lo[:, :2].reshape(t_tile * 2 * conv_size, n)


@functools.lru_cache(maxsize=None)
def _tensor_fn(n: int, primes: tuple, t_tile: int, size_a: int, size_b: int,
               conv_size: int, dnum: int, kr: int, ka: int,
               shoup: bool = False):
    logn = n.bit_length() - 1
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(_ninv_triple(n, p) for p in primes)
    r2s = tuple(R * R % p for p in primes)
    if shoup:
        wf = _stage_twiddles_shoup(primes, n, False, P)
        wi = _stage_twiddles_shoup(primes, n, True, P)
    else:
        wf = _stage_twiddles(primes, n, False, P)
        wi = _stage_twiddles(primes, n, True, P)
    basis = PrimeBasis(primes)
    kernel = functools.partial(
        _kernel_tensor, n, logn, primes, qinvs, ninvs, r2s, basis,
        t_tile, size_a, size_b, conv_size, dnum, kr, ka, shoup,
    )
    ra, rb = 2 * size_a, 2 * size_b
    wspec = pl.BlockSpec(
        wf.shape, lambda bi: (0,) * wf.ndim, memory_space=pltpu.VMEM
    )

    def fn(a, b):   # a: [Bp·2·size_a, N] i32; b: [Bp·2·size_b, N] i32
        bp = a.shape[0] // ra
        grid = (bp // t_tile,)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((t_tile * ra, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t_tile * rb, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    wspec,
                    wspec,
                ],
                out_specs=[
                    pl.BlockSpec((t_tile * dnum, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t_tile * 2 * conv_size, n),
                                 lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((t_tile * 2 * conv_size, n),
                                 lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((bp * dnum, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * 2 * conv_size, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * 2 * conv_size, n), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(a, b, jnp.asarray(wf), jnp.asarray(wi))

    return fn


def tensor_supported(module: Module, conv_size: int, base2k: int) -> bool:
    """Lazy primes + window sums in i32 + single-REDC term bound."""
    return (
        lazy_ok(module.basis.primes)
        and base2k + (conv_size + 1).bit_length() <= 31
        and base2k <= 26
    )


def fused_tensor_product(
    module: Module,
    a_data,                  # [..., 2, size_a, N] i64 rank-1 ct
    b_data,                  # [..., 2, size_b, N] i64
    conv_size: int,
    dnum: int,
    kr: int,                 # key base2k (quad digit width)
    ka: int,                 # ciphertext base2k
    t_tile: int = 4,
):
    """Rank-1 tensor product: returns (d, lin64) with
    d = big_normalize(quad_big, dnum limbs at kr) `[..., dnum, N]` i64 and
    lin64 `[..., 2, conv_size, N]` wrapping-i64 linear terms — bit-exact vs
    glwe_tensor_product_big + big_normalize."""
    n = module.n
    lead = a_data.shape[:-3]
    size_a, size_b = a_data.shape[-2], b_data.shape[-2]
    assert tensor_supported(module, conv_size, ka)
    assert min(size_a, size_b) * 2 <= 16
    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = min(t_tile, max(1, b_tot))
    a32 = a_data.reshape(b_tot, 2 * size_a, n).astype(jnp.int32)
    b32 = b_data.reshape(b_tot, 2 * size_b, n).astype(jnp.int32)
    pad = (-b_tot) % t_tile
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0), (0, 0)))
        b32 = jnp.pad(b32, ((0, pad), (0, 0), (0, 0)))
    bp = b_tot + pad
    d, lh, ll = _tensor_fn(
        n, module.basis.primes, t_tile, size_a, size_b, conv_size, dnum,
        kr, ka, _use_shoup(),
    )(a32.reshape(bp * 2 * size_a, n), b32.reshape(bp * 2 * size_b, n))
    d = d.reshape(bp, dnum, n)[:b_tot].reshape(lead + (dnum, n))
    lh = lh.reshape(bp, 2, conv_size, n)[:b_tot]
    ll = ll.reshape(bp, 2, conv_size, n)[:b_tot]
    lin64 = (lh.astype(jnp.int64) << 32) | (
        ll.astype(jnp.int64) & 0xFFFFFFFF
    )
    return d.astype(jnp.int64), lin64.reshape(lead + (2, conv_size, n))
