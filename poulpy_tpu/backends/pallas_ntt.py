"""Fused negacyclic NTT as a Pallas TPU kernel.

The jnp NTT materializes every butterfly stage to HBM (log N round trips);
this kernel keeps the polynomial block in VMEM across all stages — the
classic bandwidth-to-compute conversion the AVX backend achieves with
registers (poulpy-cpu-avx/src/fft64/reim/).

Layout is transpose-free: tensors stay `[..., P, N]` int32 exactly as the
hal stores them (a flat `[M, P, N]` view), so the wrapper adds zero HBM
passes.  Arithmetic is pure int32: Montgomery REDC with R = 2^30 decomposed
into 15-bit digit products (every intermediate fits signed i32).
Butterflies pair lanes via `pltpu.roll`; per-stage full-length twiddle
vectors make the pairing branchless.

Cross-checked bit-exactly against hal.ntt by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.hal.ntt import NttTables, _host_tables

MASK15 = (1 << 15) - 1
MASK30 = (1 << 30) - 1


def _mul_lo30(a, b):
    """Low 30 bits of a·b in i32 — ONE native multiply (the VPU has a
    native 32-bit low product; only mulhi needs 15-bit schoolbook)."""
    return (a * b) & MASK30


def _mul_hi30(a, b):
    """floor(a·b / 2^30) for 0 ≤ a,b < 2^30 (15-bit digit schoolbook —
    this is the half the VPU has no native op for)."""
    a0 = a & MASK15
    a1 = a >> 15
    b0 = b & MASK15
    b1 = b >> 15
    return a1 * b1 + ((a0 * b1 + a1 * b0 + ((a0 * b0) >> 15)) >> 15)


def mont_mul_i32(a, b, p, qinv30):
    """REDC_{2^30}(a·b) in pure i32.

    0 ≤ a,b < p < 2^30; every intermediate < 2^31.  9 vector multiplies:
    two schoolbook mulhi (a·b and m·p), native low products for t0 and m,
    and the low-half carry collapses to (t0 != 0) because
    t0 + (m·p mod 2^30) ≡ 0 (mod 2^30) with both terms in [0, 2^30)."""
    t0 = (a * b) & MASK30
    t1 = _mul_hi30(a, b)
    m = (t0 * qinv30) & MASK30
    u = t1 + _mul_hi30(m, p) + (t0 != 0).astype(jnp.int32)
    return jnp.where(u >= p, u - p, u)


def _add_mod(a, b, p):
    s = a + b
    return jnp.where(s >= p, s - p, s)


def _sub_mod(a, b, p):
    d = a - b
    return jnp.where(d < 0, d + p, d)


# ---------------------------------------------------------------------------
# Lazy-reduction variants (Harvey butterflies): for primes p < 2^28 values
# are carried in [0, 2p) between stages — one conditional subtract per
# butterfly instead of three (mont csub + add_mod + sub_mod).  Bounds:
#   mont_mul_i32_lazy(a < 4p, b < p) < p + 4p·p/2^30 < 2p     (p < 2^28)
#   butterfly sums < 4p < 2^30, so every intermediate stays i32
# The final stage fully reduces to [0, p), so outputs remain bit-exact vs
# the strict path.
# ---------------------------------------------------------------------------

LAZY_PRIME_BOUND = 1 << 28


def lazy_ok(primes) -> bool:
    return max(primes) < LAZY_PRIME_BOUND


def mont_mul_i32_lazy(a, b, p, qinv30):
    """REDC_{2^30}(a·b) in [0, 2p), for 0 ≤ a < min(4p, 2^30), 0 ≤ b < p,
    p < 2^28 (skips the canonicalizing subtract of mont_mul_i32).
    Same 9-multiply structure as mont_mul_i32."""
    t0 = (a * b) & MASK30
    t1 = _mul_hi30(a, b)
    m = (t0 * qinv30) & MASK30
    return t1 + _mul_hi30(m, p) + (t0 != 0).astype(jnp.int32)


def _csub(x, m):
    """x − m if x ≥ m else x (one conditional subtract)."""
    return jnp.where(x >= m, x - m, x)


# ---------------------------------------------------------------------------
# Harvey/Shoup constant multiplication (twiddle butterflies)
#
# For a multiply by a PRECOMPUTABLE constant w (NTT twiddles), Harvey's
# method with a stored quotient wq = floor(w·2^30/p) beats Montgomery REDC
# on this VPU: the reduction needs only the LOW 30 bits of x·w and q·p,
# and the VPU has a native 32-bit low-product multiply (only mulhi is
# missing — BENCH_NOTES roofline).  Six vector multiplies total
# (4 schoolbook for the exact hi part of x·wq + 2 native low products)
# vs mont_mul_i32_lazy's 11, and far fewer support ops.
# Counterpart of the reference's AVX twiddle handling
# (poulpy-cpu-avx/src/fft64/reim/), re-derived for i32 lanes.
# ---------------------------------------------------------------------------


def shoup_mul_i32_lazy(x, w, wq, p):
    """x·w mod p as a representative in [0, 2p), for 0 ≤ x < 2^30,
    0 ≤ w < p < 2^30, wq = floor(w·2^30/p) precomputed host-side.

    q = floor(x·wq/2^30) exactly (15-bit schoolbook high part), then
    r = x·w − q·p via two native i32 low products; Harvey's lemma gives
    0 ≤ r < p·(1 + x/2^30) < 2p whenever x < 2^30.  Every intermediate
    fits signed i32 (schoolbook sums < 2^31 − 2^16)."""
    x0 = x & MASK15
    x1 = x >> 15
    wq0 = wq & MASK15
    wq1 = wq >> 15
    q = x1 * wq1 + (
        (x0 * wq1 + x1 * wq0 + ((x0 * wq0) >> 15)) >> 15
    )
    # r < 2p < 2^31, so the subtraction is exact modulo 2^31 (a 30-bit
    # mask would corrupt 30-bit primes, where 2p > 2^30)
    m31 = (1 << 31) - 1
    return (((x * w) & m31) - ((q * p) & m31)) & m31


def shoup_mul_i32(x, w, wq, p):
    """Canonical x·w mod p for 0 ≤ x < p < 2^30 (lazy core + one csub).
    Bit-identical to mont_mul_i32(x, w·R mod p, p, qinv)."""
    r = shoup_mul_i32_lazy(x, w, wq, p)
    return jnp.where(r >= p, r - p, r)


@functools.lru_cache(maxsize=None)
def _stage_twiddles(primes: tuple[int, ...], n: int, inverse: bool,
                    rows_block: int):
    """Per-stage twiddle blocks [logN, rows_block, N] int32.

    The kernel folds the prime axis into the row axis (row r handles prime
    r % P) so VMEM tiles are fully occupied; the twiddle block repeats the
    per-prime vectors in the same interleaved pattern.  Lane i of stage s
    carries the twiddle of its butterfly block (branchless pairing);
    inverse stages stored in execution order."""
    psi_t, psi_inv_t, _ = _host_tables(primes, n)
    logn = n.bit_length() - 1
    P = len(primes)
    assert rows_block % P == 0
    out = np.zeros((logn, rows_block, n), dtype=np.int32)
    src = psi_inv_t if inverse else psi_t
    for s in range(logn):
        m = 1 << s
        two_half = n >> s
        blk = np.arange(n) // two_half
        idx = m + blk
        stage = s if not inverse else (logn - 1 - s)
        per_prime = src[:, idx].astype(np.int32)      # [P, N]
        out[stage] = np.tile(per_prime, (rows_block // P, 1))
    return out


@functools.lru_cache(maxsize=None)
def _stage_twiddles_shoup(primes: tuple[int, ...], n: int, inverse: bool,
                          rows_block: int):
    """Stacked Harvey twiddle tables [logN, 2, rows_block, N] int32:
    [s, 0] = plain stage twiddles w = ψ-power mod p (NOT Montgomery form),
    [s, 1] = quotients floor(w·2^30/p) for shoup_mul_i32(_lazy).
    Same row interleaving as _stage_twiddles (row r ↦ prime r % P)."""
    from poulpy_tpu.hal.primes import R

    mont = _stage_twiddles(primes, n, inverse, rows_block)
    P = len(primes)
    out = np.zeros((mont.shape[0], 2) + mont.shape[1:], dtype=np.int32)
    for k, p in enumerate(primes):
        rinv = pow(R, -1, p)
        wm = mont[:, k::P].astype(np.int64)
        plain = wm * rinv % p
        out[:, 0, k::P] = plain.astype(np.int32)
        out[:, 1, k::P] = ((plain << 30) // p).astype(np.int32)
    return out


def _row_consts(vals: np.ndarray, rows_block: int) -> np.ndarray:
    """Per-prime scalars tiled into the folded row pattern [rows_block, 1]."""
    P = len(vals)
    return np.tile(vals.astype(np.int32), rows_block // P)[:, None]


def _tw(x, w_ref, s, sl, p, qinv, lazy, shoup):
    """One twiddle product for the standalone kernels: w_ref is
    [logn, 2, rows, N] (plain, Harvey quotient) when shoup, else the
    Montgomery [logn, rows, N] table; sl slices the row range."""
    if shoup:
        w = w_ref[s, 0][sl]
        wq = w_ref[s, 1][sl]
        if lazy:
            return shoup_mul_i32_lazy(x, w, wq, p)
        return shoup_mul_i32(x, w, wq, p)
    w = w_ref[s][sl]
    if lazy:
        return mont_mul_i32_lazy(x, w, p, qinv)
    return mont_mul_i32(x, w, p, qinv)


def _ntt_kernel_paired(logn: int, inverse: bool, lazy: bool, shoup: bool,
                       x_ref, w_ref, p_ref, qinv_ref, ninv_ref, o_ref):
    """Paired-row butterflies: a radix-2 stage only consumes the twiddle
    products of its HI lanes, so packing two rows' hi-lane operands into one
    vector halves the Montgomery multiplies per stage (stage twiddles are
    constant within each 2·half block, so one twiddle vector serves both).
    Requires rows_block % (2·P) == 0 so row r and r + rows_block/2 share a
    prime.  Lane values are bitwise identical to _ntt_kernel."""
    n = x_ref.shape[-1]
    x = x_ref[...]                       # [rows_block, N], prime = row % P
    rows = x.shape[0]
    h = rows // 2
    a, b = x[:h], x[h:]
    p = p_ref[...][:h]                   # [h, 1]; halves share the pattern
    qinv = qinv_ref[...][:h]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)

    if not inverse:
        for s in range(logn):
            half = n >> (s + 1)
            mask = (lane & (2 * half - 1)) < half
            c = jnp.where(mask, pltpu.roll(b, jnp.int32(n - half), axis=1), a)
            yc = _tw(c, w_ref, s, slice(None, h), p, qinv, lazy, shoup)
            ya = jnp.where(
                mask, pltpu.roll(yc, jnp.int32(n - half), axis=1), yc
            )
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
        x = jnp.concatenate([a, b], axis=0)
        if lazy:
            x = _csub(x, p_ref[...])     # [0, 2p) → [0, p)
    else:
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
            c = jnp.where(
                mask, pltpu.roll(db, jnp.int32(n - half), axis=1), da
            )
            vc = _tw(c, w_ref, si, slice(None, h), p, qinv, lazy, shoup)
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
                b = jnp.where(
                    mask, ub, pltpu.roll(vc, jnp.int32(half), axis=1)
                )
        x = jnp.concatenate([a, b], axis=0)
        pf = p_ref[...]
        qf = qinv_ref[...]
        if lazy:
            x = _csub(
                mont_mul_i32_lazy(
                    x, jnp.broadcast_to(ninv_ref[...], x.shape), pf, qf
                ),
                pf,
            )
        else:
            x = mont_mul_i32(
                x, jnp.broadcast_to(ninv_ref[...], x.shape), pf, qf
            )
    o_ref[...] = x


def _ntt_kernel(logn: int, inverse: bool, lazy: bool, shoup: bool,
                x_ref, w_ref, p_ref, qinv_ref, ninv_ref, o_ref):
    n = x_ref.shape[-1]
    x = x_ref[...]                       # [rows_block, N], prime = row % P
    p = p_ref[...]                       # [rows_block, 1]
    qinv = qinv_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    full = slice(None)

    if not inverse:
        for s in range(logn):
            half = n >> (s + 1)
            mask = (lane & (2 * half - 1)) < half
            # lazy: x ∈ [0, 2p): y < 2p, lo/hi ∈ [0, 4p) → one csub back
            y = _tw(x, w_ref, s, full, p, qinv, lazy, shoup)
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
        if lazy:
            x = _csub(x, p)              # [0, 2p) → [0, p)
    else:
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
                # x ∈ [0, 2p): u ∈ [0, 4p), d ∈ (0, 4p) — both safe
                u = x + partner
                v = _tw(partner - x + 2 * p, w_ref, si, full, p, qinv,
                        True, shoup)
                x = _csub(jnp.where(mask, u, v), 2 * p)
            else:
                u = _add_mod(x, partner, p)
                d_hi = _sub_mod(partner, x, p)
                v = _tw(d_hi, w_ref, si, full, p, qinv, False, shoup)
                x = jnp.where(mask, u, v)
        if lazy:
            x = _csub(
                mont_mul_i32_lazy(
                    x, jnp.broadcast_to(ninv_ref[...], x.shape), p, qinv
                ),
                p,
            )
        else:
            x = mont_mul_i32(
                x, jnp.broadcast_to(ninv_ref[...], x.shape), p, qinv
            )
    o_ref[...] = x


@functools.lru_cache(maxsize=None)
def ntt_fn(n: int, primes: tuple[int, ...], rows_block: int = 8,
           inverse: bool = False, shoup: bool = False):
    logn = n.bit_length() - 1
    P = len(primes)
    assert rows_block % P == 0
    if shoup:
        wstack_np = _stage_twiddles_shoup(primes, n, inverse, rows_block)
    else:
        wstack_np = _stage_twiddles(primes, n, inverse, rows_block)
    from poulpy_tpu.hal.primes import R

    p_np = _row_consts(np.array(primes), rows_block)
    qinv_np = _row_consts(
        np.array([(-pow(q, -1, R)) % R for q in primes]), rows_block
    )
    ninv_np = _row_consts(
        np.array([pow(n, -1, q) * R % q for q in primes]), rows_block
    )
    kfn = _ntt_kernel_paired if rows_block % (2 * P) == 0 else _ntt_kernel
    kernel = functools.partial(kfn, logn, inverse, lazy_ok(primes), shoup)
    wspec = pl.BlockSpec(
        wstack_np.shape, lambda bi: (0,) * wstack_np.ndim,
        memory_space=pltpu.VMEM,
    )

    def fn(x):  # x: [M·P, N] int32, prime-folded rows (row r → prime r % P)
        m_rows = x.shape[0]
        grid = (pl.cdiv(m_rows, rows_block),)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((rows_block, n), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM),
                    wspec,
                    pl.BlockSpec((rows_block, 1), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_block, 1), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows_block, 1), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (rows_block, n), lambda bi: (bi, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            )(
                x, jnp.asarray(wstack_np), jnp.asarray(p_np),
                jnp.asarray(qinv_np), jnp.asarray(ninv_np),
            )

    return fn


def pallas_ntt_forward(tables: NttTables, x):
    """x: [..., P, N] residues → forward NTT (same layout as
    hal.ntt.ntt_forward, bit-exact; i32 in/out with no transposes)."""
    return _apply(tables, x, inverse=False)


def pallas_ntt_inverse(tables: NttTables, x):
    return _apply(tables, x, inverse=True)


def _apply(tables: NttTables, x, inverse: bool):
    n = tables.n
    P = tables.basis.nprimes
    lead = x.shape[:-2]
    dtype_in = x.dtype
    # fold the prime axis into rows (free reshape: [..., P, N] is P-minor)
    xm = x.reshape((-1, n)).astype(jnp.int32)
    m_rows = xm.shape[0]
    # rows are prime-folded (row r → prime r % P) so the block must cover
    # whole prime groups, AND Mosaic requires the sublane block dimension
    # divisible by 8 → lcm(P, 8) (P=5 → 40)
    import math

    rows_block = math.lcm(P, 8)
    pad = (-m_rows) % rows_block
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    import os

    shoup = os.environ.get("POULPY_TPU_SHOUP", "1") != "0"
    out = ntt_fn(n, tables.basis.primes, rows_block, inverse, shoup)(xm)
    if pad:
        out = out[:m_rows]
    return out.reshape(lead + (P, n)).astype(dtype_in)
