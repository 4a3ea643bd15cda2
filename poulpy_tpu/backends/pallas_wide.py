"""Wide (128-bit) fused mega-kernels — the NTT120-twin exit, in VMEM.

The reference's NTT120 backends accumulate convolution results in i128
(`ScalarBig = i128`, poulpy-cpu-ref/src/ntt120/module.rs:45-46), which the
repo mirrors with the stage-by-stage (hi, lo)-i64-pair pipeline in
hal/wide.py.  Until round 5 that exit bypassed every fused kernel
(backends/pallas_fused.py gated `dsize==1`-era non-wide configs only), so
the reference's own CKKS demo parameterization (base2k=52,
poulpy-ckks/examples/poly2.rs:48-61) ran each stage through HBM.

These kernels extend the fused design to the wide exit:

  * big values are FOUR i32 words (w3..w0, two's complement mod 2^128) —
    Mosaic has no 64-bit vectors, so the i128 twin is word-ripple i32;
  * ciphertext limbs at base2k up to ~52 (|limb| < 2^55) enter as a
    host-side 26-bit split (x = x1·2^26 + x0, both halves i32 within the
    kernel's |v| < 2^29 entry precondition); residues recombine with ONE
    Shoup constant multiply per prime;
  * normalization windows (up to ~59 bits) and output limbs are
    (hi, lo) i32 pairs; the carry scan itself stays i32.

Everything else (lazy Harvey/Shoup NTT stages, deferred-REDC VMP and limb
convolution) is shared with pallas_fused.  Requires lazy primes
(p < 2^28): wide configs should build their Module with prime_bits=28 and
one extra prime (e.g. `get_module(n, 5, 28)` instead of `get_module(n, 4)`
— the ~140-bit modulus still covers every base2k ≤ 52 bound and unlocks
this path).

Bit-exactness contract: identical results to the jnp wide pipeline
(dft_apply → vmp_apply → idft_apply_wide → big_normalize_wide), proven by
tests/test_wide.py::test_fused_wide_*.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends.pallas_fused import (
    I32_MIN,
    _ninv_triple,
    _add64,
    _i32c,
    _intt_rows,
    _intt_rows_paired,
    _lazy_reduce,
    _lsr32,
    _mul_pair_30x28,
    _ntt_rows,
    _ntt_rows_paired,
    _pick_tile,
    _redc64_pair,
    _shr64_lo32,
    _sub64,
    _use_shoup,
)
from poulpy_tpu.backends.pallas_ntt import (
    _csub,
    _stage_twiddles,
    _stage_twiddles_shoup,
    lazy_ok,
    mont_mul_i32,
    mont_mul_i32_lazy,
    shoup_mul_i32_lazy,
)
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.primes import R, PrimeBasis

MASK26 = (1 << 26) - 1
MASK32 = (1 << 32) - 1


# ---------------------------------------------------------------------------
# i128-as-4×i32-word primitives (w3 signed, w2..w0 unsigned bit patterns)
# ---------------------------------------------------------------------------

def _adc(a, b, cin):
    """a + b + cin with carry out (cin ∈ {0, 1}); unsigned-compare trick."""
    t = a + b
    c1 = ((t ^ I32_MIN) < (a ^ I32_MIN)).astype(jnp.int32)
    s = t + cin
    c2 = ((s ^ I32_MIN) < (t ^ I32_MIN)).astype(jnp.int32)
    return s, c1 + c2


def _add128(a, b):
    a3, a2, a1, a0 = a
    b3, b2, b1, b0 = b
    s0, c = _adc(a0, b0, jnp.zeros_like(a0))
    s1, c = _adc(a1, b1, c)
    s2, c = _adc(a2, b2, c)
    return (a3 + b3 + c, s2, s1, s0)


def _sbb(a, b, bin_):
    """a − b − bin_ with borrow out (bin_ ∈ {0, 1})."""
    t = a - b
    b1 = ((a ^ I32_MIN) < (b ^ I32_MIN)).astype(jnp.int32)
    s = t - bin_
    b2 = ((t ^ I32_MIN) < (bin_ ^ I32_MIN)).astype(jnp.int32)
    return s, b1 + b2


def _sub128(a, b):
    a3, a2, a1, a0 = a
    b3, b2, b1, b0 = b
    s0, c = _sbb(a0, b0, jnp.zeros_like(a0))
    s1, c = _sbb(a1, b1, c)
    s2, c = _sbb(a2, b2, c)
    return (a3 - b3 - c, s2, s1, s0)


def _quad_from_pair(h, l):
    """Sign-extend a 64-bit (hi, lo) pair into 4 words."""
    s = h >> 31
    return (s, s, h, l)


def _shl128_u31(v, s: int, zero):
    """(value v) << s as 4 words, for 0 ≤ v < 2^31, static 0 ≤ s < 128."""
    k, r = divmod(s, 32)
    words = [zero, zero, zero, zero]
    if r == 0:
        if k < 4:
            words[k] = v
    else:
        if k < 4:
            words[k] = v << r
        if k + 1 < 4:
            words[k + 1] = v >> (32 - r)      # v ≥ 0: arithmetic == logical
    return tuple(reversed(words))             # (w3, w2, w1, w0)


def _mul_d30_w128(d, w: int, zero):
    """(d · w) mod 2^128 as 4 words, 0 ≤ d < 2^30, static 0 ≤ w < 2^128.

    15-bit digit schoolbook (every partial product < 2^30 stays i32)."""
    acc = (zero, zero, zero, zero)
    for j, dj in enumerate((d & 0x7FFF, d >> 15)):
        for k in range(9):
            wk = (w >> (15 * k)) & 0x7FFF
            sh = 15 * (j + k)
            if wk == 0 or sh >= 128:
                continue
            acc = _add128(acc, _shl128_u31(dj * jnp.int32(wk), sh, zero))
    return acc


def _wshr128_lo32(ws, s: int):
    """Low 32 bits of the arithmetic 128-bit shift (value >> s), static
    s ≥ 0 (words beyond w3 are the sign)."""
    w3, w2, w1, w0 = ws
    sign = w3 >> 31

    def word(i):
        if i <= 0:
            return w0
        if i == 1:
            return w1
        if i == 2:
            return w2
        if i == 3:
            return w3
        return sign

    k, r = divmod(s, 32)
    if r == 0:
        return word(k)
    return _lsr32(word(k), r) | (word(k + 1) << (32 - r))


def _window_pair(ws, t: int, kr: int, zero):
    """((value << t) if t > 0 else (value >> −t)) & (2^kr − 1) as an
    unsigned (hi, lo) i32 pair, static t, kr ≤ 59."""
    if t <= 0:
        lo = _wshr128_lo32(ws, -t)
        hi = _wshr128_lo32(ws, -t + 32)
    else:
        w3, w2, w1, w0 = ws
        ku, ru = divmod(t, 32)

        def word(i):
            if i < 0:
                return zero
            return (w0, w1, w2, w3)[i]

        def shifted(m):
            i = m - ku
            if ru == 0:
                return word(i)
            return (word(i) << ru) | _lsr32(word(i - 1), 32 - ru)

        lo = shifted(0)
        hi = shifted(1)
    if kr <= 32:
        m = lo & ((1 << kr) - 1) if kr < 32 else lo
        return zero, m
    return hi & ((1 << (kr - 32)) - 1), lo


def _gdig_pair(kr: int, h, l):
    """Sign-extended low-kr field of a pair, as a pair."""
    if kr < 32:
        d = (l << (32 - kr)) >> (32 - kr)
        return d >> 31, d
    if kr == 32:
        return l >> 31, l
    s = 64 - kr
    dh = (h << s) >> s if s else h
    return dh, l


def _carry_pair_i32(kr: int, ah, al, dh, dl):
    """(acc − digit) >> kr for digit = gdig(acc): exact multiple of 2^kr
    with small quotient — the carry fits i32."""
    h, l = _sub64(ah, al, dh, dl)
    return _shr64_lo32(h, l, kr)


def garner_center_quads(ys, primes, qinvs, basis: PrimeBasis):
    """Canonical residues per prime (list of [rows, N] i32) → centered CRT
    value mod 2^128 as 4 i32 words (hal.wide.garner_lift_wide twin)."""
    P = len(primes)
    digits = []
    for i, p in enumerate(primes):
        xi = ys[i]
        for j in range(i):
            c = int(basis.garner_pprod_mont[i, j])
            t = mont_mul_i32(digits[j], jnp.int32(c), p, qinvs[i])
            d = xi - t
            xi = jnp.where(d < 0, d + p, d)
        if i > 0:
            xi = mont_mul_i32(
                xi, jnp.int32(int(basis.garner_inv_mont[i])), p, qinvs[i]
            )
        digits.append(xi)

    zero = jnp.zeros_like(digits[0])
    weights = [1]
    prod = 1
    for i in range(P - 1):
        prod *= int(basis.primes[i])
        weights.append(prod & ((1 << 128) - 1))
    acc = (zero, zero, zero, digits[0])
    for i in range(1, P):
        acc = _add128(acc, _mul_d30_w128(digits[i], weights[i], zero))

    gt = jnp.zeros(zero.shape, dtype=bool)
    eq = jnp.ones(zero.shape, dtype=bool)
    for i in range(P - 1, -1, -1):
        hd = jnp.int32(int(basis.half_digits[i]))
        gt = gt | (eq & (digits[i] > hd))
        eq = eq & (digits[i] == hd)
    m128 = basis.modulus & ((1 << 128) - 1)
    mw = tuple(
        jnp.where(gt, jnp.int32(_i32c((m128 >> sh) & MASK32)), 0)
        for sh in (96, 64, 32, 0)
    )
    return _sub128(acc, mw)


def normalize_windows_wide(quads, psize, res_size, kr, ka, offset):
    """List of 4-word values per input limb → res_size normalized limbs as
    (hi, lo) i32 pairs (bit-window telescoping, wide twin of
    pallas_fused.normalize_windows / hal.wide.vec_znx_normalize_full_wide).
    """
    assert kr + (psize + 1).bit_length() <= 63
    zero = jnp.zeros_like(quads[0][3])
    accs = []
    for i in range(res_size):
        w = (i + 1) * kr
        ah = al = None
        for j in range(psize):
            t = w - ((j + 1) * ka - offset)
            if t >= kr:
                continue                    # window provably zero
            ph, plo = _window_pair(quads[j], t, kr, zero)
            if ah is None:
                ah, al = ph, plo
            else:
                ah, al = _add64(ah, al, ph, plo)
        if ah is None:
            ah, al = zero, zero
        accs.append((ah, al))

    out = [None] * res_size
    if res_size == 1:
        out[0] = _gdig_pair(kr, *accs[0])
        return out
    x0 = _gdig_pair(kr, *accs[-1])
    cy = _carry_pair_i32(kr, *accs[-1], *x0)
    out[-1] = x0
    for j in range(res_size - 2, 0, -1):
        dj = _gdig_pair(kr, *accs[j])
        carry_j = _carry_pair_i32(kr, *accs[j], *dj)
        dpc = _add64(dj[0], dj[1], cy >> 31, cy)
        x1 = _gdig_pair(kr, *dpc)
        out[j] = x1
        cy = carry_j + _carry_pair_i32(kr, *dpc, *x1)
    d0 = _gdig_pair(kr, *accs[0])
    out[0] = _gdig_pair(kr, *_add64(d0[0], d0[1], cy >> 31, cy))
    return out


# ---------------------------------------------------------------------------
# Shared entry: 26-bit-split limbs → lazy residues in [0, 2p)
# ---------------------------------------------------------------------------

def _entry26(x1, x0, p: int, qinv: int, c26: int, c26q: int):
    """Residue of (x1·2^26 + x0) mod p in [0, 2p), |x1| < 2^29,
    0 ≤ x0 < 2^26 < p (lazy primes)."""
    shift = 4 * p
    while shift < (1 << 29):
        shift *= 2
    r1 = _lazy_reduce(x1 + jnp.int32(shift), (1 << 29) + shift, p, 2 * p)
    r = shoup_mul_i32_lazy(r1, jnp.int32(c26), jnp.int32(c26q), p) + x0
    return _csub(r, 2 * p)                  # < 2p + 2^26 < 3p → one csub


def _split26(a64):
    """Host-side split of i64 limbs (|x| < 2^55) into (x1, x0) i32."""
    return (
        (a64 >> 26).astype(jnp.int32),
        (a64 & MASK26).astype(jnp.int32),
    )


def _join_pairs(oh, ol):
    return (oh.astype(jnp.int64) << 32) | (ol.astype(jnp.int64) & MASK32)


def _ntt_entry(r, wf_ref, n, logn, p, qinv, pi, shoup):
    if r.shape[0] % 2 == 0:
        return _ntt_rows_paired(r, wf_ref, n, logn, p, qinv, pi, True, shoup)
    lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    return _ntt_rows(r, wf_ref, lane, n, logn, p, qinv, pi, True, shoup)


def _intt_exit(y, wi_ref, n, logn, p, qinv, ninv, pi, shoup):
    if y.shape[0] % 2 == 0:
        return _intt_rows_paired(y, wi_ref, n, logn, p, qinv, ninv, pi,
                                 True, shoup)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    return _intt_rows(y, wi_ref, lane, n, logn, p, qinv, ninv, pi,
                      True, shoup)


# ---------------------------------------------------------------------------
# Wide fused pipeline: residues → NTT → deferred-REDC VMP → iNTT →
# Garner-128 → (+ small pairs per column) → wide normalize → limb pairs
# ---------------------------------------------------------------------------

def _kernel_pipe_wide(n, logn, primes, qinvs, ninvs, c26s, basis,
                      t_tile, cols, size_a, rmax, co, psize,
                      res_size, kr, ka, offset, s_size, shoup,
                      *refs):
    it = iter(refs)
    a1_ref = next(it)
    a0_ref = next(it)
    wf_ref = next(it)
    wi_ref = next(it)
    pm_ref = next(it)
    sh_ref = next(it) if s_size else None
    sl_ref = next(it) if s_size else None
    oh_ref = next(it)
    ol_ref = next(it)

    kk = cols * rmax
    mdim = co * psize
    i32_cap = 1 << 31
    x1 = a1_ref[...]                        # [T·cols·size_a, N]
    x0 = a0_ref[...]

    ys = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        r = _entry26(x1, x0, p, qinv, *c26s[pi])
        r = _ntt_entry(r, wf_ref, n, logn, p, qinv, pi, shoup)
        r4 = r.reshape(t_tile, cols, size_a, n)[:, :, :rmax]
        r4 = r4.reshape(t_tile, kk, n)      # [0, 2p)
        # deferred-REDC VMP (same chunking as the non-wide mega-kernel)
        acc = None
        acc_b = 0
        for k0 in range(0, kk, 16):
            ks = range(k0, min(k0 + 16, kk))
            hi = lo = None
            for k in ks:
                ak = r4[:, k][:, None]
                bk = pm_ref[pi, 0, k][None]
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
        acc = _lazy_reduce(acc, acc_b, p, 2 * p)
        y = acc.reshape(t_tile * mdim, n)
        ys.append(_intt_exit(y, wi_ref, n, logn, p, qinv, ninvs[pi], pi,
                             shoup))

    ws = garner_center_quads(ys, primes, qinvs, basis)   # 4×[T·M, N]
    ws = tuple(w.reshape(t_tile, co, psize, n) for w in ws)

    if s_size:
        sh = sh_ref[...].reshape(t_tile, co, s_size, n)
        sl = sl_ref[...].reshape(t_tile, co, s_size, n)

    oh_rows, ol_rows = [], []
    for c in range(co):
        quads = [tuple(w[:, c, j] for w in ws) for j in range(psize)]
        if s_size:
            for j in range(min(s_size, psize)):
                quads[j] = _add128(
                    quads[j], _quad_from_pair(sh[:, c, j], sl[:, c, j])
                )
        out = normalize_windows_wide(quads, psize, res_size, kr, ka, offset)
        oh_rows.extend(h for h, _ in out)
        ol_rows.extend(l for _, l in out)
    oh_ref[...] = jnp.stack(oh_rows, axis=1).reshape(
        t_tile * co * res_size, n
    )
    ol_ref[...] = jnp.stack(ol_rows, axis=1).reshape(
        t_tile * co * res_size, n
    )


@functools.lru_cache(maxsize=None)
def _pipe_wide_fn(n: int, primes: tuple, t_tile: int, cols: int,
                  size_a: int, rmax: int, co: int, psize: int,
                  res_size: int, kr: int, ka: int, offset: int,
                  s_size: int, shoup: bool):
    logn = n.bit_length() - 1
    P = len(primes)
    kk = cols * rmax
    mdim = co * psize
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(_ninv_triple(n, p) for p in primes)
    c26s = tuple(
        ((1 << 26) % p, ((1 << 26) % p << 30) // p) for p in primes
    )
    if shoup:
        wf = _stage_twiddles_shoup(primes, n, False, P)
        wi = _stage_twiddles_shoup(primes, n, True, P)
    else:
        wf = _stage_twiddles(primes, n, False, P)
        wi = _stage_twiddles(primes, n, True, P)
    basis = PrimeBasis(primes)
    kernel = functools.partial(
        _kernel_pipe_wide, n, logn, primes, qinvs, ninvs, c26s, basis,
        t_tile, cols, size_a, rmax, co, psize, res_size, kr, ka, offset,
        s_size, shoup,
    )
    rows_a = cols * size_a
    wlead = 3 if shoup else 2

    def fn(a1, a0, pm, sh=None, sl=None):
        # a1/a0: [Bp·cols·size_a, N] i32; pm: [P, 1, KK, M, N] i32
        bp = a1.shape[0] // rows_a
        grid = (bp // t_tile,)
        wspec = pl.BlockSpec(
            wf.shape[:wlead] + (n,), lambda bi: (0,) * wlead + (0,),
            memory_space=pltpu.VMEM,
        )
        aspec = pl.BlockSpec((t_tile * rows_a, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [
            aspec, aspec, wspec, wspec,
            pl.BlockSpec((P, 1, kk, mdim, n),
                         lambda bi: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [a1, a0, jnp.asarray(wf), jnp.asarray(wi), pm]
        if s_size:
            sspec = pl.BlockSpec((t_tile * co * s_size, n),
                                 lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM)
            in_specs += [sspec, sspec]
            args += [sh, sl]
        ospec = pl.BlockSpec((t_tile * co * res_size, n),
                             lambda bi: (bi, 0), memory_space=pltpu.VMEM)
        with jax.enable_x64(False):
            oh, ol = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=[ospec, ospec],
                out_shape=[
                    jax.ShapeDtypeStruct((bp * co * res_size, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * co * res_size, n), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*args)
        return oh, ol

    return fn


def fused_wide_supported(module: Module, psize: int, res_base2k: int,
                         a_base2k: int) -> bool:
    """Static validity of the wide fused path: lazy primes (< 2^28) for
    the deferred-REDC 30×28 digit products, and pair-width windows."""
    return (
        lazy_ok(module.basis.primes)
        and res_base2k + (psize + 1).bit_length() <= 63
        and max(res_base2k, a_base2k) <= 59
    )


def fused_glwe_product_wide(
    module: Module,
    a_data,                  # [..., ci, size_a, N] i64, |limb| < 2^55
    pmat,                    # [rows, ci, co, psize, P, N] Montgomery
    res_size: int,
    res_base2k: int,
    pm_base2k: int,
    small=None,              # [..., co, s_size, N] i64 (col-aligned adds)
    res_offset: int = 0,
    t_tile: int | None = None,
    dsize: int = 1,
):
    """Wide twin of pallas_fused.fused_glwe_product: dft_apply → vmp_apply
    → idft_apply_wide → (wadd sign-extended `small` per column) →
    big_normalize_wide, bit-exact vs the jnp wide path
    (ntt120 ScalarBig=i128 semantics, reference ntt120/module.rs:45-46)."""
    from poulpy_tpu.backends.pallas_fused import (
        pm_kernel_layout,
        pm_kernel_layout_dsize,
    )

    n = module.n
    P = module.nprimes
    rows, ci, co, psize = pmat.shape[:4]
    lead = a_data.shape[:-3]
    a_size = a_data.shape[-2]
    rmax = min(rows * dsize, a_size)
    assert fused_wide_supported(module, psize, res_base2k, pm_base2k)

    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = _pick_tile(n, P, ci, rmax, rmax, co, psize, 1, b_tot, t_tile)
    a = a_data[..., :rmax, :].reshape(b_tot, ci * rmax, n)
    a1, a0 = _split26(a)
    pad = (-b_tot) % t_tile
    if pad:
        a1 = jnp.pad(a1, ((0, pad), (0, 0), (0, 0)))
        a0 = jnp.pad(a0, ((0, pad), (0, 0), (0, 0)))
    bp = b_tot + pad

    if dsize == 1:
        pm = pm_kernel_layout(pmat, rmax)
    else:
        pm = pm_kernel_layout_dsize(pmat, rmax, dsize)
    pm = pm[:, None]

    s_size = 0
    sh = sl = None
    if small is not None:
        s_size = small.shape[-2]
        sb = small.reshape(b_tot, co, s_size, n)
        if pad:
            sb = jnp.pad(sb, ((0, pad), (0, 0), (0, 0), (0, 0)))
        sh = (sb >> 32).astype(jnp.int32).reshape(bp * co * s_size, n)
        sl = (sb & MASK32).astype(jnp.int32).reshape(bp * co * s_size, n)

    oh, ol = _pipe_wide_fn(
        n, module.basis.primes, t_tile, ci, rmax, rmax, co, psize,
        res_size, res_base2k, pm_base2k, res_offset, s_size, _use_shoup(),
    )(a1.reshape(bp * ci * rmax, n), a0.reshape(bp * ci * rmax, n), pm,
      sh, sl)

    out = _join_pairs(oh, ol).reshape(bp, co, res_size, n)[:b_tot]
    return out.reshape(lead + (co, res_size, n))


# ---------------------------------------------------------------------------
# Wide fused rank-1 tensor product: NTT both cts → limb convolution →
# iNTT → Garner-128 → wide normalize of BOTH the quad digits and the
# linear terms (each with the CKKS landing offset) → limb pairs.
# (The wide twin of pallas_fused.fused_tensor_product; matches the
# ckks/ops.py wide mul data flow: quad → keyswitch digits, lin →
# normalized then wadded into the relinearize exit.)
# ---------------------------------------------------------------------------

def _kernel_tensor_wide(n, logn, primes, qinvs, ninvs, r2s, c26s, basis,
                        t_tile, size_a, size_b, conv_size, dnum, lin_size,
                        kr, ka, offset, shoup,
                        a1_ref, a0_ref, b1_ref, b0_ref, wf_ref, wi_ref,
                        dh_ref, dl_ref, lh_ref, ll_ref):
    ys = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]

        def entry(x1_ref, x0_ref):
            r = _entry26(x1_ref[...], x0_ref[...], p, qinv, *c26s[pi])
            return _ntt_entry(r, wf_ref, n, logn, p, qinv, pi, shoup)

        ra = entry(a1_ref, a0_ref).reshape(t_tile, 2, size_a, n)
        rb = entry(b1_ref, b0_ref).reshape(t_tile, 2, size_b, n)
        rb = _csub(mont_mul_i32_lazy(rb, jnp.int32(r2s[pi]), p, qinv), p)

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
                assert cnt <= 16
                t = _redc64_pair(hi, lo, p, qinv)
                t = _lazy_reduce(t, ((cnt * 2 * p * p) >> 30) + p + 1,
                                 p, 2 * p)
                rows.append(t)
        y = jnp.stack(rows, axis=1).reshape(t_tile * 3 * conv_size, n)
        ys.append(_intt_exit(y, wi_ref, n, logn, p, qinv, ninvs[pi], pi,
                             shoup))

    ws = garner_center_quads(ys, primes, qinvs, basis)
    ws = tuple(w.reshape(t_tile, 3, conv_size, n) for w in ws)

    # quad column (pair index 2) → gadget digits at key base2k, with the
    # landing offset applied inside the normalization (ckks/ops.py mul)
    quads = [tuple(w[:, 2, j] for w in ws) for j in range(conv_size)]
    d = normalize_windows_wide(quads, conv_size, dnum, kr, ka, offset)
    dh_ref[...] = jnp.stack([h for h, _ in d], axis=1).reshape(
        t_tile * dnum, n
    )
    dl_ref[...] = jnp.stack([l for _, l in d], axis=1).reshape(
        t_tile * dnum, n
    )
    # linear columns (pairs 0, 1) → normalized at the ciphertext base2k
    # with the same offset (lin_shifted in the wide mul data flow)
    lh_rows, ll_rows = [], []
    for c in range(2):
        quads = [tuple(w[:, c, j] for w in ws) for j in range(conv_size)]
        out = normalize_windows_wide(quads, conv_size, lin_size, ka, ka,
                                     offset)
        lh_rows.extend(h for h, _ in out)
        ll_rows.extend(l for _, l in out)
    lh_ref[...] = jnp.stack(lh_rows, axis=1).reshape(
        t_tile * 2 * lin_size, n
    )
    ll_ref[...] = jnp.stack(ll_rows, axis=1).reshape(
        t_tile * 2 * lin_size, n
    )


@functools.lru_cache(maxsize=None)
def _tensor_wide_fn(n: int, primes: tuple, t_tile: int, size_a: int,
                    size_b: int, conv_size: int, dnum: int, lin_size: int,
                    kr: int, ka: int, offset: int, shoup: bool):
    logn = n.bit_length() - 1
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(_ninv_triple(n, p) for p in primes)
    r2s = tuple(R * R % p for p in primes)
    c26s = tuple(
        ((1 << 26) % p, ((1 << 26) % p << 30) // p) for p in primes
    )
    if shoup:
        wf = _stage_twiddles_shoup(primes, n, False, P)
        wi = _stage_twiddles_shoup(primes, n, True, P)
    else:
        wf = _stage_twiddles(primes, n, False, P)
        wi = _stage_twiddles(primes, n, True, P)
    basis = PrimeBasis(primes)
    kernel = functools.partial(
        _kernel_tensor_wide, n, logn, primes, qinvs, ninvs, r2s, c26s,
        basis, t_tile, size_a, size_b, conv_size, dnum, lin_size, kr, ka,
        offset, shoup,
    )
    ra, rb = 2 * size_a, 2 * size_b
    wspec = pl.BlockSpec(
        wf.shape, lambda bi: (0,) * wf.ndim, memory_space=pltpu.VMEM
    )

    def fn(a1, a0, b1, b0):
        bp = a1.shape[0] // ra
        grid = (bp // t_tile,)
        aspec = pl.BlockSpec((t_tile * ra, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((t_tile * rb, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
        dspec = pl.BlockSpec((t_tile * dnum, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
        lspec = pl.BlockSpec((t_tile * 2 * lin_size, n),
                             lambda bi: (bi, 0), memory_space=pltpu.VMEM)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[aspec, aspec, bspec, bspec, wspec, wspec],
                out_specs=[dspec, dspec, lspec, lspec],
                out_shape=[
                    jax.ShapeDtypeStruct((bp * dnum, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * dnum, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * 2 * lin_size, n), jnp.int32),
                    jax.ShapeDtypeStruct((bp * 2 * lin_size, n), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(a1, a0, b1, b0, jnp.asarray(wf), jnp.asarray(wi))

    return fn


def tensor_wide_supported(module: Module, conv_size: int, kr: int,
                          ka: int) -> bool:
    return (
        lazy_ok(module.basis.primes)
        and max(kr, ka) + (conv_size + 1).bit_length() <= 63
        and max(kr, ka) <= 59
    )


def fused_tensor_product_wide(
    module: Module,
    a_data,                  # [..., 2, size_a, N] i64 rank-1 ct
    b_data,                  # [..., 2, size_b, N] i64
    conv_size: int,
    dnum: int,
    lin_size: int,
    kr: int,                 # key base2k (quad digit width)
    ka: int,                 # ciphertext base2k
    offset: int = 0,         # CKKS landing offset (off_bits − base2k)
    t_tile: int = 4,
):
    """Rank-1 wide tensor product: returns (d, lin) with
    d = big_normalize_wide(quad, dnum limbs at kr, offset) [..., dnum, N]
    and lin = big_normalize_wide(lin_c, lin_size limbs at ka, offset)
    [..., 2, lin_size, N] — bit-exact vs glwe_tensor_product_big(wide=True)
    + the two wide normalizations in ckks/ops.py mul."""
    n = module.n
    lead = a_data.shape[:-3]
    size_a, size_b = a_data.shape[-2], b_data.shape[-2]
    assert tensor_wide_supported(module, conv_size, kr, ka)
    assert min(size_a, size_b) * 2 <= 16
    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = min(t_tile, max(1, b_tot))
    a1, a0 = _split26(a_data.reshape(b_tot, 2 * size_a, n))
    b1, b0 = _split26(b_data.reshape(b_tot, 2 * size_b, n))
    pad = (-b_tot) % t_tile
    if pad:
        a1, a0, b1, b0 = (
            jnp.pad(x, ((0, pad), (0, 0), (0, 0))) for x in (a1, a0, b1, b0)
        )
    bp = b_tot + pad
    dh, dl, lh, ll = _tensor_wide_fn(
        n, module.basis.primes, t_tile, size_a, size_b, conv_size, dnum,
        lin_size, kr, ka, offset, _use_shoup(),
    )(a1.reshape(bp * 2 * size_a, n), a0.reshape(bp * 2 * size_a, n),
      b1.reshape(bp * 2 * size_b, n), b0.reshape(bp * 2 * size_b, n))
    d = _join_pairs(dh, dl).reshape(bp, dnum, n)[:b_tot]
    lin = _join_pairs(lh, ll).reshape(bp, 2, lin_size, n)[:b_tot]
    return (
        d.reshape(lead + (dnum, n)),
        lin.reshape(lead + (2, lin_size, n)),
    )
