"""Four-step matmul NTT on the MXU (int8 digits, twiddles folded in).

The dense matmul NTT (mxu_ntt.py) pays N²·digits MACs per transform — at
N=2048 that lands at VPU-butterfly parity.  The classic four-step
factorization N = N1·N2 cuts the MAC count to ~N·(N1+N2)·digits while
keeping every stage MXU-shaped, and *all* twiddles (ψ negacyclic folding,
the inter-step twiddle, N^{-1}) are folded into the weight tensors
host-side, so the only elementwise work is the digitize/assemble epilogue
between stages (fused by XLA into the matmuls) instead of ~420 VPU ops per
element for the 11-stage butterfly pipeline.

Math (per prime; ψ = 2N-th root, ω = ψ², n = n1 + N1·n2, k = k2 + N2·k1):

    Y[k] = Σ_n x[n]·ψ^{n(2k+1)}                        (negacyclic NTT)
         = Σ_{n1} ψ^{n1(1+2k)} · A[k2, n1]             (step B, contract n1)
    A[k2, n1] = Σ_{n2} x[n1+N1·n2]·ψ^{N1·n2·(1+2k2)}   (step A, contract n2)

    x[n] = N^{-1}·Σ_k Y[k]·ψ^{-n(2k+1)}
         = Σ_{k2} N^{-1}ψ^{-n(1+2k2)} · B[k2, n1]      (step B, contract k2)
    B[k2, n1] = Σ_{k1} Y[k2+N2·k1]·ψ^{-2N2·n1·k1}      (step A, contract k1)

Outputs are produced in "σ order": memory position (k2·N1 + k1) holds
frequency k = k2 + N2·k1.  σ is an internal convention — the NTT domain is
only used pointwise — and `sigma_from_hal` converts prepared operands from
the butterfly backends' order (computed by matching evaluation exponents,
so it stays correct whatever order hal.ntt uses internally).

Each step is an exact int8 einsum with reduction folding exactly as in
mxu_ntt.py: weights store digit_d(2^{8i}·W·2^60 mod p), one einsum yields
NDIG int32 partials per element, and assemble+double-REDC produce the
canonical residue.  Weight tables total ~10 MiB at N=2048 (vs 256 MiB for
the dense matrix), small enough to ship as program constants.

Bit-exactness vs hal.ntt: tests/test_mxu4.py (forward equals
ntt_forward∘to_residues up to the σ relabeling; inverse is its exact
inverse at the residue level; the full gadget product matches the jnp
pipeline limb-for-limb).

Reference parity: replaces the transform kernels of both reference DFT
families (poulpy-cpu-ref/src/reference/fft64/reim/fft_ref.rs:25-43,
reference/ntt120/ntt.rs:558,617) with a systolic-array evaluation
(PAPERS.md: multi-precision NTTs on AI ASICs, arXiv 2606.19866).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.backends.mxu_ntt import NDIG, _assemble, _np_digitize
from poulpy_tpu.hal.ntt import NttTables
from poulpy_tpu.hal.primes import psi_2n


def _split(n: int) -> tuple[int, int]:
    """(N1, N2), N1 = step-B contraction size (lane-sized when possible)."""
    n1 = min(128, max(2, n // 8))
    return n1, n // n1


def digitize_planes(x, nd: int, axis: int = 1):
    """int array → int8 balanced base-256 planes stacked at `axis`.

    The plane axis must NOT be minor-most: a trailing length-nd axis wastes
    125/128 lanes of every tile (measured 1.6 ms for one digitize at bench
    shapes).  Values must be int32-range; arithmetic runs in int32."""
    v = x if x.dtype == jnp.int32 else x.astype(jnp.int32)
    planes = []
    for _ in range(nd):
        d = ((v + 128) & 255) - 128
        planes.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return jnp.stack(planes, axis=axis)


def _assemble_ax(partials, axis: int, p, qinv):
    """int32 partials with a length-NDIG axis at `axis` → canonical
    residues int32 (v = Σ_d P_d·2^{8d}, then REDC²·center — the folded-2^60
    epilogue).  `p`/`qinv` must broadcast against the reduced result."""
    from poulpy_tpu.backends.mxu_ntt import _redc2

    o = jnp.moveaxis(partials, axis, -1).astype(jnp.int64)
    v = o[..., 0] + (o[..., 1] << 8) + (o[..., 2] << 16) + (o[..., 3] << 24)
    return _redc2(v, p, qinv).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _psi_pows(p: int, two_n: int) -> np.ndarray:
    """[2N] int64: ψ^i mod p."""
    psi = psi_2n(p, two_n)
    out = np.empty(two_n, dtype=np.int64)
    acc = 1
    for i in range(two_n):
        out[i] = acc
        acc = acc * psi % p
    return out


def _digits_folded(mat: np.ndarray, p: int) -> np.ndarray:
    """[rows, cols] mod-p matrix → int8 [rows, NDIG(i), NDIG(d), cols] with
    entry digit_d(center(2^{8i}·mat·2^60 mod p)) — the reduction-folded
    digit planes for one exact-matmul stage."""
    rows, cols = mat.shape
    base = mat * pow(2, 60, p) % p
    out = np.zeros((rows, NDIG, NDIG, cols), dtype=np.int8)
    for i in range(NDIG):
        c = (base << (8 * i)) % p
        c = np.where(c > p // 2, c - p, c)
        out[:, i] = _np_digitize(c, NDIG).transpose(1, 0, 2)
    return out


class Mxu4Weights:
    """Device weight tensors + σ permutation for one (basis, N)."""

    def __init__(self, t: NttTables):
        n = t.n
        primes = t.basis.primes
        P = len(primes)
        n1, n2 = _split(n)
        self.n, self.n1, self.n2 = n, n1, n2
        D = NDIG

        ua = np.zeros((P, n2, D, D, n2), dtype=np.int8)      # [p,n2,i,d,k2]
        vb = np.zeros((P, n1, D, D, n2, n1), dtype=np.int8)  # [p,n1,j,d,k2,k1]
        wa = np.zeros((P, n1, D, D, n1), dtype=np.int8)      # [p,k1,i,d,n1]
        wb = np.zeros((P, n1, D, D, n2, n2), dtype=np.int8)  # [p,n1,j,d,k2,n2]
        i2 = np.arange(n2, dtype=np.int64)
        i1 = np.arange(n1, dtype=np.int64)
        for pi, p in enumerate(primes):
            pw = _psi_pows(p, 2 * n)
            ninv = pow(n, -1, p)
            # UA[n2, k2] = ψ^{N1·n2·(1+2·k2)}
            e = (n1 * i2[:, None] * (1 + 2 * i2[None, :])) % (2 * n)
            ua[pi] = _digits_folded(pw[e], p)
            # VB[n1, (k2, k1)] = ψ^{n1·(1+2(k2+N2·k1))}
            k = i2[:, None] + n2 * i1[None, :]               # [k2, k1]
            e = (i1[:, None, None] * (1 + 2 * k[None])) % (2 * n)
            vb[pi] = _digits_folded(
                pw[e].reshape(n1, n2 * n1), p
            ).reshape(n1, D, D, n2, n1)
            # WA[k1, n1] = ψ^{-2·N2·n1·k1}
            e = (-2 * n2 * i1[:, None] * i1[None, :]) % (2 * n)
            wa[pi] = _digits_folded(pw[e], p)
            # WB[n1, (k2, n2)] = N^{-1}·ψ^{-(n1+N1·n2)(1+2·k2)}
            e = (-(i1[:, None, None] + n1 * i2[None, None, :])
                 * (1 + 2 * i2[None, :, None])) % (2 * n)
            m = pw[e].reshape(n1, n2 * n2) * ninv % p
            wb[pi] = _digits_folded(m, p).reshape(n1, D, D, n2, n2)

        # einsum operand layouts (axis names in forward/inverse below).
        # Kept as NUMPY so the lru-cached weights never capture tracers:
        # get_weights4 may first run inside a jit trace, and a jnp array
        # created there would leak out through the cache.
        self.ua = np.ascontiguousarray(np.transpose(ua, (1, 2, 0, 3, 4)))
        #   [n2, i, P, dA, k2]
        self.vb = np.ascontiguousarray(np.transpose(vb, (1, 0, 2, 4, 3, 5)))
        #   [n1, P, j, k2, dB, k1]
        self.wa = wa                             # [P, k1, i, dA, n1]
        self.wb = np.ascontiguousarray(np.transpose(wb, (0, 1, 2, 4, 3, 5)))
        #   [P, n1, j, k2, dB, n2]


@functools.lru_cache(maxsize=None)
def _weights(primes: tuple[int, ...], n: int) -> Mxu4Weights:
    from poulpy_tpu.hal.primes import PrimeBasis

    return Mxu4Weights(NttTables(PrimeBasis(primes), n))


def get_weights4(t: NttTables) -> Mxu4Weights:
    return _weights(t.basis.primes, t.n)


def _np_hal_ntt_probe(p: int, n: int) -> np.ndarray:
    """hal.ntt.ntt_forward of the monomial X, replicated host-side in numpy
    (same psi tables, same stage schedule — pure host so it can run inside
    an enclosing jit trace)."""
    from poulpy_tpu.hal.ntt import _host_tables

    psi_t, _, _ = _host_tables((p,), n)
    r_inv = pow(1 << 30, -1, p)                 # tables are Montgomery-form
    src = psi_t[0] * r_inv % p
    logn = n.bit_length() - 1
    x = np.zeros(n, dtype=np.int64)
    x[1] = 1
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        w = src[m : 2 * m]
        xr = x.reshape(m, 2, half)
        lo, hi = xr[:, 0, :], xr[:, 1, :]
        v = hi * w[:, None] % p
        x = np.stack([(lo + v) % p, (lo - v) % p], axis=1).reshape(n)
    return x


@functools.lru_cache(maxsize=None)
def sigma_from_hal(primes: tuple[int, ...], n: int) -> np.ndarray:
    """π with mxu4_forward(x) == ntt_forward(x)[..., π] for every x.

    Built by matching evaluation exponents: hal's output at position q is
    the evaluation at ψ^{2τ(q)+1} for some structural (prime-independent)
    permutation τ; probing with x = X recovers τ, and π[pos] = τ^{-1}(σ(pos))
    with σ(k2·N1+k1) = k2 + N2·k1.  Verified on a second prime."""
    n1, n2 = _split(n)
    vals = np.stack(
        [_np_hal_ntt_probe(p, n) for p in primes]
    )                                           # [P, N]: hal NTT of X
    # τ from prime 0: value at q is ψ^{2τ(q)+1}
    pw = _psi_pows(primes[0], 2 * n)
    lookup = {int(pw[2 * k + 1]): k for k in range(n)}
    tau = np.array([lookup[int(v)] for v in vals[0]], dtype=np.int64)
    tau_inv = np.empty(n, dtype=np.int64)
    tau_inv[tau] = np.arange(n)
    pos = np.arange(n)
    k_of_pos = (pos % n1) * n2 + pos // n1      # σ: pos = k2·N1+k1 → k
    pi = tau_inv[k_of_pos]
    # verify on every other prime
    for idx in range(1, len(primes)):
        pwq = _psi_pows(primes[idx], 2 * n)
        want = pwq[(2 * k_of_pos + 1) % (2 * n)]
        np.testing.assert_array_equal(vals[idx][pi], want)
    return pi


def mxu4_ntt_forward_limbs(t: NttTables, x, nd_in: int = NDIG):
    """int limbs [..., N] (int32-range, covered by nd_in digit planes) →
    σ-order residues [..., P, N] int32.

    Every intermediate keeps an N1- or k1-sized (128-lane) axis minor-most;
    the digit-plane axis sits at position 1 (see digitize_planes)."""
    w = get_weights4(t)
    n, n1, n2 = w.n, w.n1, w.n2
    P = t.basis.nprimes
    lead = x.shape[:-1]
    v = x.reshape((-1, n2, n1))                            # [R, n2, n1]
    d = digitize_planes(v, nd_in)                          # [R, i, n2, n1]
    pa = jnp.einsum(
        "rimn,mipdk->rpdkn", d, w.ua[:, :nd_in],
        preferred_element_type=jnp.int32,
    )                                                      # [R, P, dA, k2, n1]
    a = _assemble_ax(pa, 2, t.p[:, None, None], t.qinv[:, None, None])
    da = digitize_planes(a, NDIG)                          # [R, j, P, k2, n1]
    pb = jnp.einsum(
        "rjpkn,npjkbl->rpkbl", da, w.vb,
        preferred_element_type=jnp.int32,
    )                                                      # [R, P, k2, dB, k1]
    y = _assemble_ax(pb, -2, t.p[:, None, None], t.qinv[:, None, None])
    return y.reshape(lead + (P, n))                        # [R, P, k2, k1]


def mxu4_ntt_inverse(t: NttTables, y):
    """σ-order residues [..., P, N] → coefficient residues [..., P, N]
    (canonical [0, p), == ntt_inverse of the same values)."""
    w = get_weights4(t)
    n, n1, n2 = w.n, w.n1, w.n2
    P = t.basis.nprimes
    lead = y.shape[:-2]
    v = y.reshape((-1, P, n2, n1))                         # [R, P, k2, k1]
    d = digitize_planes(v, NDIG)                           # [R, i, P, k2, k1]
    pa = jnp.einsum(
        "ripkl,plidn->rpdkn", d, w.wa,
        preferred_element_type=jnp.int32,
    )                                                      # [R, P, dA, k2, n1]
    a = _assemble_ax(pa, 2, t.p[:, None, None], t.qinv[:, None, None])
    da = digitize_planes(a, NDIG)                          # [R, j, P, k2, n1]
    pb = jnp.einsum(
        "rjpkn,pnjkbm->rpbmn", da, w.wb,
        preferred_element_type=jnp.int32,
    )                                                      # [R, P, dB, n2, n1]
    xx = _assemble_ax(pb, 2, t.p[:, None, None], t.qinv[:, None, None])
    return xx.reshape(lead + (P, n))                       # [R, P, n2, n1]
