"""Dense matmul NTT on the MXU (int8 digit decomposition).

The butterfly NTT kernels (pallas_ntt.py / pallas_fused.py) are VPU-bound:
~420 elementwise i32 ops per transformed element (11 stages of Montgomery
butterflies).  The MXU sits idle.  This module moves the transform onto the
systolic array (ROADMAP.md perf item "MXU matmul NTT"; technique family:
multi-precision digit decomposition for exact NTTs on AI matrix units,
PAPERS.md arXiv 2606.19866):

  * The negacyclic NTT is a fixed linear map: y = W·x (mod p), with W the
    exact [N, N] matrix of `hal.ntt.ntt_forward` (psi-folding, bit-reversed
    frequency order, N^{-1} for the inverse — all absorbed into W, built by
    transforming the identity basis with the *same code path*).
  * Exact integer matmul on the MXU via balanced base-256 digits: int8×int8
    products accumulate exactly in int32 (|Σ| ≤ 4N·2^14 < 2^31 for N ≤ 2^16).
  * **Reduction folding**: instead of 4×4 digit-pair matmuls + per-pair
    recombination, the weight matrix stores C[i·N+n, d·N+k] =
    digit_d(2^{8i}·W[n,k]·2^60 mod p), so ONE int8 matmul per (input-digit
    plane set, output-digit plane set) yields 4 partials P_d with
    Σ_d P_d·2^{8d} ≡ NTT(x)·2^60 (mod p), |v| < 2^52.  The VPU epilogue is
    just assemble + double-REDC (÷2^60 cancels the folded 2^60) + two
    conditional corrections — ~35 ops/element instead of ~420.

Bit-exactness: the epilogue returns the canonical residue in [0, p), i.e.
exactly `ntt_forward` / `ntt_inverse` output (tests/test_mxu.py).

Reference parity: this replaces the reim FFT / NTT120 NTT transform kernels
(poulpy-cpu-ref/src/reference/fft64/reim/fft_ref.rs:25-43,
 reference/ntt120/ntt.rs:558,617) — same linear map, MXU-native evaluation.

Memory: weights are [4N, 4N] int8 per (prime, direction) — 64 MiB at
N=2048.  They live in HBM and are streamed through the MXU once per batched
call, so the batch axis amortizes them (the TPU throughput model,
CLAUDE.md).  `use_mxu()` gates the path to TPU + N ≥ MXU_MIN_N.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from poulpy_tpu.hal.ntt import NttTables, _host_tables
from poulpy_tpu.hal.primes import MASK30, R

NDIG = 4          # balanced base-256 digit planes: covers |v| < 2^31
MXU_MIN_N = 512   # below this the dense matmul loses to the VPU butterflies


@functools.lru_cache(maxsize=1)
def use_mxu() -> bool:
    """Opt-in (POULPY_TPU_MXU=1) until it beats the fused VPU kernels on the
    headline bench — at N=2048 the dense matmul's N²·digits MAC tax lands
    close to the VPU butterfly cost (BENCH_NOTES.md)."""
    return os.environ.get("POULPY_TPU_MXU") == "1"


# ---------------------------------------------------------------------------
# Host-side weight construction (numpy, exact)
# ---------------------------------------------------------------------------

def _np_digitize(v: np.ndarray, nd: int) -> np.ndarray:
    """Balanced base-256 digits (int8), highest axis first: [...,] → [nd, ...].

    Exact: Σ_d out[d]·2^{8d} == v for |v| < 128·(2^{8nd}−1)/255 + 1."""
    out = np.zeros((nd,) + v.shape, dtype=np.int8)
    v = v.astype(np.int64).copy()
    for d in range(nd):
        dig = ((v + 128) & 255) - 128
        out[d] = dig.astype(np.int8)
        v = (v - dig) >> 8
    assert not v.any(), "value out of digit range"
    return out


def _np_ntt_matrix(primes: tuple[int, ...], n: int, inverse: bool) -> np.ndarray:
    """Exact [P, N, N] int64 matrix of ntt_forward/ntt_inverse: out = x @ W.

    Built by running the same butterfly schedule as hal.ntt (same psi tables,
    same stage order) on the identity basis, vectorized in numpy int64
    (products < 2^60 stay exact in signed i64)."""
    psi_t, psi_inv_t, n_inv = _host_tables(primes, n)
    logn = n.bit_length() - 1
    P = len(primes)
    w_all = np.zeros((P, n, n), dtype=np.int64)
    for pi, p in enumerate(primes):
        # plain (non-Montgomery) twiddles: tables store w·R mod p
        r_inv = pow(R, -1, p)
        src = (psi_inv_t if inverse else psi_t)[pi] * r_inv % p
        x = np.eye(n, dtype=np.int64)          # rows = basis vectors
        if not inverse:
            for s in range(logn):
                m = 1 << s
                half = n >> (s + 1)
                w = src[m : 2 * m]             # [m]
                xr = x.reshape(n, m, 2, half)
                lo = xr[:, :, 0, :]
                hi = xr[:, :, 1, :]
                v = hi * w[None, :, None] % p
                xr = np.stack([(lo + v) % p, (lo - v) % p], axis=2)
                x = xr.reshape(n, n)
        else:
            for s in range(logn - 1, -1, -1):
                m = 1 << s
                half = n >> (s + 1)
                w = src[m : 2 * m]
                xr = x.reshape(n, m, 2, half)
                lo = xr[:, :, 0, :]
                hi = xr[:, :, 1, :]
                u = (lo + hi) % p
                d = (lo - hi) % p
                v = d * w[None, :, None] % p
                xr = np.stack([u, v], axis=2)
                x = xr.reshape(n, n)
            x = x * (int(n_inv[pi]) * pow(R, -1, p) % p) % p
        w_all[pi] = x
    return w_all


@functools.lru_cache(maxsize=None)
def _np_weights(primes: tuple[int, ...], n: int, inverse: bool) -> np.ndarray:
    """Digitized reduction-folded weights.

    Returns int8 [P, NDIG·N, NDIG·N]: rows (i-major: i·N+n), cols (d-major:
    d·N+k), entry digit_d(centered(2^{8i}·W[n,k]·2^60 mod p))."""
    w = _np_ntt_matrix(primes, n, inverse)     # [P, N, N]
    P = len(primes)
    out = np.zeros((P, NDIG * n, NDIG * n), dtype=np.int8)
    for pi, p in enumerate(primes):
        wf = w[pi] * (pow(2, 60, p)) % p       # fold ÷2^60 compensation
        for i in range(NDIG):
            c = (wf << (8 * i)) % p            # [N, N] in [0, p)
            c = np.where(c > p // 2, c - p, c) # center → |c| ≤ p/2
            dig = _np_digitize(c, NDIG)        # [NDIG, N, N]
            for d in range(NDIG):
                out[pi, i * n : (i + 1) * n, d * n : (d + 1) * n] = dig[d]
    return out


class MxuWeights:
    """Device-resident digitized NTT matrices for one (basis, N)."""

    def __init__(self, primes: tuple[int, ...], n: int):
        self.primes = primes
        self.n = n
        P = len(primes)
        fwd = _np_weights(primes, n, False)    # [P, 4N, 4N]
        inv = _np_weights(primes, n, True)
        # forward lhs (limb digits) is prime-independent → stack primes into
        # columns for a single matmul: [4N, P·4N].  Numpy (not jnp) so the
        # lru-cached weights never capture tracers when first built inside a
        # jit trace.
        self.fwd = np.ascontiguousarray(
            np.transpose(fwd, (1, 0, 2)).reshape(NDIG * n, P * NDIG * n)
        )
        self.inv = inv                         # [P, 4N, 4N]


@functools.lru_cache(maxsize=None)
def get_weights(primes: tuple[int, ...], n: int) -> MxuWeights:
    return MxuWeights(primes, n)


# ---------------------------------------------------------------------------
# Device-side digitize / epilogue (plain jnp; XLA fuses around the matmuls)
# ---------------------------------------------------------------------------

def digitize(x, nd: int = NDIG):
    """[..., N] int → int8 [..., nd·N] balanced base-256 planes (i-major)."""
    v = x.astype(jnp.int64) if x.dtype != jnp.int64 else x
    planes = []
    for _ in range(nd):
        d = ((v + 128) & 255) - 128
        planes.append(d.astype(jnp.int8))
        v = (v - d) >> 8
    return jnp.concatenate(planes, axis=-1)


def _redc2(v, p, qinv):
    """Exact v·2^{-60} mod p in [0, p) for −2^52 < v < 2^52 (int64)."""
    m = ((v & MASK30) * qinv) & MASK30
    v = (v + m * p) >> 30
    m = ((v & MASK30) * qinv) & MASK30
    v = (v + m * p) >> 30
    v = jnp.where(v < 0, v + p, v)
    return jnp.where(v >= p, v - p, v)


def _assemble(partials, p, qinv):
    """int32 [..., NDIG, N] matmul partials → canonical residues int32."""
    o = partials.astype(jnp.int64)
    v = (
        o[..., 0, :]
        + (o[..., 1, :] << 8)
        + (o[..., 2, :] << 16)
        + (o[..., 3, :] << 24)
    )
    return _redc2(v, p, qinv).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Public transforms (bit-exact vs hal.ntt)
# ---------------------------------------------------------------------------

def _dot_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def mxu_ntt_forward_limbs(t: NttTables, x):
    """int64 limbs [..., N] (|x| < 2^31) → forward-NTT residues
    [..., P, N] int32 == ntt_forward(to_residues(x)).

    Fuses the residue projection: digits of the signed limb represent the
    same class mod every prime, so no per-prime reduction is needed on the
    way in (replaces reduce_i64 + the butterfly stages)."""
    n = t.n
    P = t.basis.nprimes
    w = get_weights(t.basis.primes, n)
    lead = x.shape[:-1]
    a8 = digitize(x.reshape(-1, n))                  # [R, 4N]
    out = _dot_i8(a8, w.fwd)                         # [R, P·4N] i32
    out = out.reshape((-1, P, NDIG, n))
    p = t.p[:, None]                                 # [P, 1]
    qinv = t.qinv[:, None]
    res = _assemble(out, p, qinv)                    # [R, P, N]
    return res.reshape(lead + (P, n))


def mxu_ntt_inverse(t: NttTables, r):
    """Residues [..., P, N] → ntt_inverse(r), bit-exact, int32 out."""
    n = t.n
    P = t.basis.nprimes
    w = get_weights(t.basis.primes, n)
    lead = r.shape[:-2]
    outs = []
    for pi in range(P):
        a8 = digitize(r[..., pi, :].reshape(-1, n))  # [R, 4N]
        o = _dot_i8(a8, w.inv[pi]).reshape(-1, NDIG, n)
        outs.append(_assemble(o, t.p[pi], t.qinv[pi]))
    return jnp.stack(outs, axis=-2).reshape(lead + (P, n))


def mxu_ntt_forward(t: NttTables, r):
    """Residue-in variant ([..., P, N] → [..., P, N]), for call sites that
    already hold per-prime residues (drop-in for ntt_forward)."""
    n = t.n
    P = t.basis.nprimes
    w = get_weights(t.basis.primes, n)
    wf = w.fwd.reshape(NDIG * n, P, NDIG * n)
    lead = r.shape[:-2]
    outs = []
    for pi in range(P):
        a8 = digitize(r[..., pi, :].reshape(-1, n))
        o = _dot_i8(a8, wf[:, pi, :]).reshape(-1, NDIG, n)
        outs.append(_assemble(o, t.p[pi], t.qinv[pi]))
    return jnp.stack(outs, axis=-2).reshape(lead + (P, n))
