"""Limb-vector ("vec_znx") operations and encode/decode.

jnp equivalents of poulpy-cpu-ref/src/reference/vec_znx/ (add, sub, negate,
rotate, automorphism, mul_xp_minus_one, lsh/rsh, switch_ring, sampling) and
the encode/decode routines of poulpy-hal/src/layouts/encoding.rs.

A vec_znx is `[..., size, N]` int64 (limb 0 = most significant); ops
broadcast over leading axes.  Differing-size operands follow the reference
rule (vec_znx/add.rs:27-58): sum over common limbs, copy the longer tail,
zero beyond.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.hal import znx
from poulpy_tpu.hal.normalization import vec_znx_normalize, vec_znx_normalize_full


def _pad_to(x, res_size: int):
    size = x.shape[-2]
    if size == res_size:
        return x
    if size > res_size:
        return x[..., :res_size, :]
    pads = [(0, 0)] * x.ndim
    pads[-2] = (0, res_size - size)
    return jnp.pad(x, pads)


def vec_znx_add(a, b, res_size: int | None = None):
    if res_size is None:
        res_size = max(a.shape[-2], b.shape[-2])
    return _pad_to(a, res_size) + _pad_to(b, res_size)


def vec_znx_sub(a, b, res_size: int | None = None):
    if res_size is None:
        res_size = max(a.shape[-2], b.shape[-2])
    return _pad_to(a, res_size) - _pad_to(b, res_size)


def vec_znx_negate(a):
    return -a


def vec_znx_rotate(p, a):
    """Multiply every limb by X^p (vec_znx/rotate.rs). `p` may be traced or
    batched (see znx.znx_rotate)."""
    return znx.znx_rotate(p, a)


def vec_znx_automorphism(p: int, a):
    """X → X^p on every limb (vec_znx/automorphism.rs)."""
    return znx.znx_automorphism(p, a)


def vec_znx_mul_xp_minus_one(p, a):
    """res = (X^p − 1)·a (vec_znx/mul_xp_minus_one.rs) — the CMux-free blind
    rotation update term."""
    return znx.znx_rotate(p, a) - a


def vec_znx_switch_ring(n_out: int, a):
    return znx.znx_switch_ring(n_out, a)


def vec_znx_lsh(base2k: int, k: int, a, res_size: int | None = None):
    """a · 2^k, renormalized (vec_znx/shift.rs:16-66): the CKKS rescale
    primitive."""
    if res_size is None:
        res_size = a.shape[-2]
    return vec_znx_normalize_full(res_size, base2k, k, a, base2k)


def vec_znx_rsh(base2k: int, k: int, a, res_size: int | None = None):
    """a · 2^{-k}, renormalized (vec_znx/shift.rs:186-343)."""
    if res_size is None:
        res_size = a.shape[-2]
    return vec_znx_normalize_full(res_size, base2k, -k, a, base2k)


def vec_znx_normalize_op(base2k: int, a, res_size: int | None = None):
    if res_size is None or res_size == a.shape[-2]:
        return vec_znx_normalize(base2k, a)
    return vec_znx_normalize_full(res_size, base2k, 0, a, base2k)


# --------------------------------------------------------------------------
# Encode / decode (poulpy-hal/src/layouts/encoding.rs)
# --------------------------------------------------------------------------

def encode_vec_i64(base2k: int, k: int, size: int, data):
    """Encode integer coefficients at torus precision 2^-k into a normalized
    `size`-limb vector (encoding.rs:18-59: place data at limb
    ceil(k/base2k)-1, normalize with fused lsh = (base2k - k % base2k) %
    base2k)."""
    data = jnp.asarray(data, jnp.int64)
    enc_size = -(-k // base2k)
    assert enc_size <= size, f"k={k} needs {enc_size} limbs > size={size}"
    n = data.shape[-1]
    a = jnp.zeros(data.shape[:-1] + (size, n), jnp.int64)
    a = a.at[..., enc_size - 1, :].set(data)
    k_rem = (base2k - (k % base2k)) % base2k
    if enc_size == size:
        return vec_znx_normalize(base2k, a, lsh=k_rem)
    head = vec_znx_normalize(base2k, a[..., :enc_size, :], lsh=k_rem)
    return jnp.concatenate([head, a[..., enc_size:, :]], axis=-2)


def _div_round(x, sh: int):
    """div_round_i64(x, 2^sh) (encoding.rs:311-320): truncating division with
    round-half-away-from-zero adjustment."""
    if sh == 0:
        return x
    trunc = jnp.where(x >= 0, x >> sh, -((-x) >> sh))
    r = x - (trunc << sh)
    bump = jnp.where(2 * jnp.abs(r) >= (1 << sh), jnp.sign(x), jnp.int64(0))
    return trunc + bump


def decode_vec_i64(base2k: int, k: int, a):
    """Decode limbs back to integers at precision k (encoding.rs:165-200)."""
    size = -(-k // base2k)
    rem = base2k - (k % base2k) if k % base2k != 0 else base2k
    data = a[..., 0, :]
    if k < base2k:
        return _div_round(data, base2k - k)
    for i in range(1, size):
        if i == size - 1 and rem != base2k:
            k_rem = base2k - rem
            data = (data << k_rem) + _div_round(a[..., i, :], rem)
        else:
            data = (data << base2k) + a[..., i, :]
    return data


def decode_vec_float(base2k: int, a) -> np.ndarray:
    """Decode to float64 torus values in [-0.5, 0.5) (host-side; the
    reference's arbitrary-precision Stats analogue for tests)."""
    a = np.asarray(a, dtype=np.float64)
    size = a.shape[-2]
    scale = np.array(
        [2.0 ** (-(j + 1) * base2k) for j in range(size)], dtype=np.float64
    )
    return np.tensordot(np.moveaxis(a, -2, -1), scale, axes=([-1], [0]))


def vec_znx_split_ring(n_out: int, a):
    """Split a degree-N vector into N/n_out degree-n_out vectors
    (vec_znx_split_ring, poulpy-cpu-ref/src/reference/vec_znx/split_ring.rs):
    part i = switch_ring(a · X^{-i}).  Returns [parts, ..., size, n_out]."""
    n_in = a.shape[-1]
    assert n_out < n_in and n_in % n_out == 0
    parts = []
    for i in range(n_in // n_out):
        src = a if i == 0 else znx.znx_rotate(-i, a)
        parts.append(znx.znx_switch_ring(n_out, src))
    return jnp.stack(parts, axis=0)


def vec_znx_merge_rings(parts):
    """Inverse of split: merge [k, ..., size, n_in] into degree k·n_in
    (vec_znx_merge_rings, reference/vec_znx/merge_rings.rs): embed each part,
    rotate by X^{-1} between parts, final rotate by X^{k}."""
    k, n_in = parts.shape[0], parts.shape[-1]
    n_out = k * n_in
    res = jnp.zeros(parts.shape[1:-1] + (n_out,), parts.dtype)
    for i in range(k):
        res = res + znx.znx_switch_ring(n_out, parts[i])
        res = znx.znx_rotate(-1, res)
    return znx.znx_rotate(k, res)


def decode_vec_i128(base2k: int, k: int, a) -> list:
    """Arbitrary-precision decode (encoding.rs decode_vec_i128): host-side
    Python-int reconstruction for k beyond 63 bits."""
    size = -(-k // base2k)
    arr = np.asarray(a)
    n = arr.shape[-1]
    rem = base2k - (k % base2k) if k % base2k != 0 else base2k
    out = []
    for c in range(n):
        v = int(arr[..., 0, c])
        for i in range(1, size):
            if i == size - 1 and rem != base2k:
                x = int(arr[..., i, c])
                half = 1 << (rem - 1)
                q = (x + half) >> rem if x >= 0 else -((-x + half) >> rem)
                v = (v << (base2k - rem)) + q
            else:
                v = (v << base2k) + int(arr[..., i, c])
        out.append(v)
    return out


def encode_vec_i128(base2k: int, k: int, size: int, data: list):
    """Encode arbitrary-precision Python ints (encoding.rs encode_vec_i128):
    host-side digit decomposition, then the standard normalize."""
    n = len(data)
    enc_size = -(-k // base2k)
    digits = np.zeros((size, n), dtype=np.int64)
    half = 1 << (base2k - 1)
    for c, v0 in enumerate(data):
        v = int(v0)
        for j in range(enc_size - 1, -1, -1):
            d = ((v + half) % (1 << base2k)) - half
            digits[j, c] = d
            v = (v - d) >> base2k
    k_rem = (base2k - (k % base2k)) % base2k
    out = vec_znx_normalize(base2k, jnp.asarray(digits), lsh=k_rem)
    return out
