"""Fused four-step MXU NTT as Pallas kernels (int8 in-kernel dots).

The XLA-level four-step transforms (mxu_ntt4.py) are correct but slow: the
int32 digit-partials (4× the data) materialize to HBM between each einsum
and its assemble epilogue — measured ~0.6 ms per assemble at bench shapes,
~2.6/3.6 ms per forward/inverse call.  These kernels keep the whole
transform in VMEM per row tile: the weight tables (≤ 1 MiB per direction)
are VMEM-resident, the digit planes and partials never leave the chip, and
the assemble + double-REDC epilogue runs in pure i32 pair arithmetic
(helpers from pallas_fused.py).

Pipeline per row tile (forward; inverse mirrors it):

  x [Tr, N] i32 ──digitize──► 3 planes ──transpose──► lhsA [Tr·n1, 3·n2]
    ──MXU dot UA──► partials ──assemble/REDC²──► A [Tr, n1, P, k2]
    ──⊙ T (Montgomery twiddle)──digitize──► lhsB [Tr·k2, 4·n1]
    ──MXU dot V0──► partials ──assemble/REDC²──► Y [Tr, P, N]  (σ order)

Math identical to mxu_ntt4.py except the inter-step twiddle is applied as
an elementwise Montgomery multiply (T = ψ^{n1(1+2k2)}·R) instead of being
folded into k2-batched step-B weights — that keeps step B one plain
[Tr·k2, 4n1]@[4n1, 4n1] dot per prime (full MXU shapes, no batching).

Bit-exact vs mxu_ntt4 (hence vs hal.ntt up to σ): tests/test_mxu4.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends.mxu_ntt import NDIG, _np_digitize
from poulpy_tpu.backends.mxu_ntt4 import _psi_pows, _split
from poulpy_tpu.backends.pallas_fused import _add64, _lsr32
from poulpy_tpu.backends.pallas_ntt import MASK15, MASK30, _mul_lo30
from poulpy_tpu.hal.ntt import NttTables
from poulpy_tpu.hal.primes import R


# ---------------------------------------------------------------------------
# i32 pair helpers for the assemble + REDC² epilogue
# ---------------------------------------------------------------------------

def _shl64_i32(v, s: int):
    """(sign-extended v) << s as an (hi, lo) i32 pair, static 0 ≤ s < 32."""
    if s == 0:
        return v >> 31, v
    return v >> (32 - s), v << s


def _mul30x30(a, b):
    """(hi, lo) of a·b for 0 ≤ a, b < 2^30 (15-bit digit schoolbook)."""
    a0 = a & MASK15
    a1 = a >> 15
    b0 = b & MASK15
    b1 = b >> 15
    p00 = a0 * b0
    mid = a0 * b1 + a1 * b0               # < 2^31
    p11 = a1 * b1
    h, l = jnp.zeros_like(a), p00
    h2, l2 = _shl64_i32(mid & MASK15, 15)
    h, l = _add64(h, l, h2, l2)
    mh = mid >> 15                        # ≥ 0, < 2^16
    h, l = _add64(h, l, mh >> 2, mh << 30)
    h, l = _add64(h, l, p11 >> 2, p11 << 30)
    return h, l


def _redc2_pair(h, l, p: int, qinv: int):
    """(h:l)·2^{-60} mod p in [0, p), exact for |value| < 2^59 − 2^30·p."""
    m = _mul_lo30(l & MASK30, qinv)
    mh, ml = _mul30x30(m, jnp.full_like(m, p))
    h, l = _add64(h, l, mh, ml)
    v1 = _lsr32(l, 30) | (h << 2)         # exact: (h:l) divisible by 2^30
    m2 = _mul_lo30(v1 & MASK30, qinv)
    mh2, ml2 = _mul30x30(m2, jnp.full_like(m2, p))
    h2, l2 = _add64(v1 >> 31, v1, mh2, ml2)
    v2 = _lsr32(l2, 30) | (h2 << 2)
    v2 = jnp.where(v2 < 0, v2 + p, v2)
    return jnp.where(v2 >= p, v2 - p, v2)


def _assemble_redc(p0, p1, p2, p3, p: int, qinv: int):
    """Σ_d P_d·2^{8d} then ·2^{-60} mod p (the folded-weight epilogue)."""
    h, l = p0 >> 31, p0
    h, l = _add64(h, l, *_shl64_i32(p1, 8))
    h, l = _add64(h, l, *_shl64_i32(p2, 16))
    h, l = _add64(h, l, *_shl64_i32(p3, 24))
    return _redc2_pair(h, l, p, qinv)


def _mont_mul_pk(a, b, p: int, qinv: int):
    """Montgomery product with scalar modulus (pallas_ntt.mont_mul_i32
    with python-int p/qinv)."""
    from poulpy_tpu.backends.pallas_ntt import mont_mul_i32

    return mont_mul_i32(a, b, p, qinv)


def _digit_planes(v, nd: int):
    """i32 → list of nd int8 planes (balanced base-256)."""
    planes = []
    for _ in range(nd):
        d = ((v + 128) & 255) - 128
        planes.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return planes


# ---------------------------------------------------------------------------
# Host weight tables (2D dot layouts)
# ---------------------------------------------------------------------------

def _fold_digits_2d(mat: np.ndarray, p: int, nd_in: int) -> np.ndarray:
    """[rows, cols] mod-p → int8 [nd_in·rows, NDIG·cols] with
    out[i·rows+r, d·cols+c] = digit_d(center(2^{8i}·mat[r,c]·2^60 mod p))."""
    rows, cols = mat.shape
    base = mat * pow(2, 60, p) % p
    out = np.zeros((nd_in * rows, NDIG * cols), dtype=np.int8)
    for i in range(nd_in):
        c = (base << (8 * i)) % p
        c = np.where(c > p // 2, c - p, c)
        dig = _np_digitize(c, NDIG)                  # [NDIG, rows, cols]
        for d in range(NDIG):
            out[i * rows : (i + 1) * rows, d * cols : (d + 1) * cols] = dig[d]
    return out


@functools.lru_cache(maxsize=None)
def _host_tables_mxu(primes: tuple[int, ...], n: int):
    """Numpy weight tables for the Pallas kernels (cached per basis/N).

    Returns dict with (all int8 unless noted):
      ua   [P, NDIG·n2, NDIG·n2]   step-A weights  ψ^{N1·n2·(1+2k2)}
      v0   [P, NDIG·n1, NDIG·n1]   step-B weights  ψ^{2·N2·n1·k1}
      tf   [P, n1, n2] int32       fwd twiddle ψ^{n1(1+2k2)}·R (Montgomery)
      wa   [P, NDIG·n1, NDIG·n1]   inv step-A      ψ^{-2·N2·n1·k1}
      w0   [P, NDIG·n2, NDIG·n2]   inv step-B      N^{-1}ψ^{-N1·n2·(1+2k2)}
      ti   [P, n1, n2] int32       inv twiddle ψ^{-n1(1+2k2)}·R
    """
    n1, n2 = _split(n)
    P = len(primes)
    i1 = np.arange(n1, dtype=np.int64)
    i2 = np.arange(n2, dtype=np.int64)
    out = {
        "ua": np.zeros((P, NDIG * n2, NDIG * n2), np.int8),
        "v0": np.zeros((P, NDIG * n1, NDIG * n1), np.int8),
        "wa": np.zeros((P, NDIG * n1, NDIG * n1), np.int8),
        "w0": np.zeros((P, NDIG * n2, NDIG * n2), np.int8),
        "tf": np.zeros((P, n1, n2), np.int32),
        "ti": np.zeros((P, n1, n2), np.int32),
    }
    for pi, p in enumerate(primes):
        pw = _psi_pows(p, 2 * n)
        ninv = pow(n, -1, p)
        # step A: rows n2 (input), cols k2
        e = (n1 * i2[:, None] * (1 + 2 * i2[None, :])) % (2 * n)
        out["ua"][pi] = _fold_digits_2d(pw[e], p, NDIG)
        # step B: rows n1, cols k1: ψ^{2·N2·n1·k1}
        e = (2 * n2 * i1[:, None] * i1[None, :]) % (2 * n)
        out["v0"][pi] = _fold_digits_2d(pw[e], p, NDIG)
        # fwd twiddle (Montgomery): [n1, k2]
        e = (i1[:, None] * (1 + 2 * i2[None, :])) % (2 * n)
        out["tf"][pi] = (pw[e] * R % p).astype(np.int32)
        # inverse step A: rows k1, cols n1: ψ^{-2·N2·n1·k1}
        e = (-2 * n2 * i1[:, None] * i1[None, :]) % (2 * n)
        out["wa"][pi] = _fold_digits_2d(pw[e], p, NDIG)
        # inverse step B: rows k2, cols n2: N^{-1}·ψ^{-N1·n2·(1+2k2)}
        e = (-n1 * i2[None, :] * (1 + 2 * i2[:, None])) % (2 * n)
        out["w0"][pi] = _fold_digits_2d(pw[e] * ninv % p, p, NDIG)
        # inverse twiddle: ψ^{-n1(1+2k2)}·R, [n1, k2]
        e = (-i1[:, None] * (1 + 2 * i2[None, :])) % (2 * n)
        out["ti"][pi] = (pw[e] * R % p).astype(np.int32)
    return out


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _dot8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _dot8_digits(lhs, tab, w: int):
    """Per-digit int8 MXU dots against tab's NDIG column blocks of width w.

    Deliberately NOT one dot followed by lane slices: Mosaic miscompiles
    lane-offset slices of an int8 dot's i32 accumulator on real hardware —
    sparse wrong values (772/98304 at bench shapes) that survive even a
    VMEM scratch roundtrip, while slicing a plain VMEM ref and the dot
    itself are each exact, and interpret mode never reproduces it
    (tools/probes/_mxu_repro10/11/12, 2026-08-21).  Splitting the dot by
    table column block keeps every consumed tensor in a layout Mosaic
    handles correctly."""
    return [_dot8(lhs, tab[:, d * w: (d + 1) * w]) for d in range(NDIG)]


def _kernel_fwd(n, n1, n2, primes, qinvs, nd_in, tr,
                x_ref, ua_ref, v0_ref, tf_ref, o_ref):
    # o_ref: [Tr, P, n2, n1] — row axis MAJOR so Mosaic pipelines the
    # output blocks through VMEM (a full leading P axis with the grid dim
    # inner forces the whole result into scoped VMEM → compile-time OOM at
    # bench shapes).
    x = x_ref[...]                                   # [Tr, n2, n1]
    xt = jnp.swapaxes(x, 1, 2)                       # [Tr, n1, n2]
    planes = _digit_planes(xt, nd_in)
    lhs_a = jnp.concatenate(planes, axis=-1).reshape(tr * n1, nd_in * n2)
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        # split dots per digit block — NOT one dot + lane slices
        # (Mosaic miscompile, see _dot8_digits)
        pas = [t.reshape(tr, n1, n2)
               for t in _dot8_digits(lhs_a, ua_ref[pi, : nd_in * n2], n2)]
        a = _assemble_redc(*pas, p, qinv)            # [Tr, n1, k2]
        a = _mont_mul_pk(a, tf_ref[pi][None], p, qinv)
        at = jnp.swapaxes(a, 1, 2)                   # [Tr, k2, n1]
        pl_b = _digit_planes(at, NDIG)
        lhs_b = jnp.concatenate(pl_b, axis=-1).reshape(tr * n2, NDIG * n1)
        pbs = [t.reshape(tr, n2, n1)
               for t in _dot8_digits(lhs_b, v0_ref[pi], n1)]
        o_ref[:, pi] = _assemble_redc(*pbs, p, qinv)  # [Tr, k2, k1]


def _kernel_inv(n, n1, n2, primes, qinvs, tr,
                y_ref, wa_ref, w0_ref, ti_ref, o_ref):
    # y_ref/o_ref: [Tr, P, n2, n1] — row-major blocks (see _kernel_fwd).
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        y = y_ref[:, pi]                             # [Tr, k2, k1]
        planes = _digit_planes(y, NDIG)
        lhs_a = jnp.concatenate(planes, axis=-1).reshape(tr * n2, NDIG * n1)
        pas = [t.reshape(tr, n2, n1)
               for t in _dot8_digits(lhs_a, wa_ref[pi], n1)]
        b = _assemble_redc(*pas, p, qinv)            # [Tr, k2, n1]
        bt = jnp.swapaxes(b, 1, 2)                   # [Tr, n1, k2]
        bt = _mont_mul_pk(bt, ti_ref[pi][None], p, qinv)
        pl_b = _digit_planes(bt, NDIG)
        lhs_b = jnp.concatenate(pl_b, axis=-1).reshape(tr * n1, NDIG * n2)
        pbs = [t.reshape(tr, n1, n2)
               for t in _dot8_digits(lhs_b, w0_ref[pi], n2)]
        xx = _assemble_redc(*pbs, p, qinv)           # [Tr, n1, n2]
        o_ref[:, pi] = jnp.swapaxes(xx, 1, 2)        # [Tr, n2, n1]


@functools.lru_cache(maxsize=None)
def _fwd_fn(n: int, primes: tuple[int, ...], nd_in: int, tr: int):
    n1, n2 = _split(n)
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    tabs = _host_tables_mxu(primes, n)
    kernel = functools.partial(
        _kernel_fwd, n, n1, n2, primes, qinvs, nd_in, tr
    )

    def fn(x):  # [Rows, N] i32 limbs → [Rows, P, N] i32 σ-order residues
        rows = x.shape[0]
        grid = (rows // tr,)
        x = x.reshape(rows, n2, n1)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tr, n2, n1), lambda bi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, NDIG * n2, NDIG * n2),
                                 lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, NDIG * n1, NDIG * n1),
                                 lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, n1, n2), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (tr, P, n2, n1), lambda bi: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((rows, P, n2, n1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(x, jnp.asarray(tabs["ua"]), jnp.asarray(tabs["v0"]),
              jnp.asarray(tabs["tf"]))
        return out.reshape(rows, P, n)

    return fn


@functools.lru_cache(maxsize=None)
def _inv_fn(n: int, primes: tuple[int, ...], tr: int):
    n1, n2 = _split(n)
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    tabs = _host_tables_mxu(primes, n)
    kernel = functools.partial(_kernel_inv, n, n1, n2, primes, qinvs, tr)

    def fn(y):  # [Rows, P, N] σ-order residues → [Rows, P, N] coefficients
        rows = y.shape[0]
        grid = (rows // tr,)
        y = y.reshape(rows, P, n2, n1)
        with jax.enable_x64(False):
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tr, P, n2, n1), lambda bi: (bi, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, NDIG * n1, NDIG * n1),
                                 lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, NDIG * n2, NDIG * n2),
                                 lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((P, n1, n2), lambda bi: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (tr, P, n2, n1), lambda bi: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((rows, P, n2, n1), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(y, jnp.asarray(tabs["wa"]), jnp.asarray(tabs["w0"]),
              jnp.asarray(tabs["ti"]))
        return out.reshape(rows, P, n)

    return fn


# ---------------------------------------------------------------------------
# Wrappers (match mxu_ntt4 call conventions)
# ---------------------------------------------------------------------------

def pallas_mxu4_forward_limbs(t: NttTables, x, nd_in: int = NDIG,
                              tr: int = 32):
    """int limbs [..., N] (int32 range) → σ-order residues [..., P, N] i32.
    Bit-exact twin of mxu_ntt4.mxu4_ntt_forward_limbs."""
    n = t.n
    P = t.basis.nprimes
    lead = x.shape[:-1]
    xm = x.reshape(-1, n).astype(jnp.int32)
    rows = xm.shape[0]
    pad = (-rows) % tr
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    out = _fwd_fn(n, t.basis.primes, nd_in, tr)(xm)   # [rows', P, N]
    return out[:rows].reshape(lead + (P, n))


def pallas_mxu4_inverse(t: NttTables, y, tr: int = 32):
    """σ-order residues [..., P, N] → coefficient residues, bit-exact twin
    of mxu_ntt4.mxu4_ntt_inverse."""
    n = t.n
    P = t.basis.nprimes
    lead = y.shape[:-2]
    ym = y.reshape(-1, P, n).astype(jnp.int32)
    rows = ym.shape[0]
    pad = (-rows) % tr
    if pad:
        ym = jnp.pad(ym, ((0, pad), (0, 0), (0, 0)))
    out = _inv_fn(n, t.basis.primes, tr)(ym)          # [rows', P, N]
    return out[:rows].reshape(lead + (P, n))
