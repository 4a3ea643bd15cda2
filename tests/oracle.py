"""Exact Python big-int oracles for the kernel layer.

The reference uses cross-backend equivalence plus arbitrary-precision
(dashu FBig) checks as its test oracles (SURVEY.md §4).  Without a Rust
toolchain in this image, the arbitrary-precision oracle is Python's native
big int: exact negacyclic convolution, exact limb re-composition, exact
windowed normalization.
"""

from __future__ import annotations

import numpy as np


def negacyclic_mul(a: list[int], b: list[int]) -> list[int]:
    """Exact product in Z[X]/(X^N+1).

    Fast path: the native C++ __int128 kernel (poulpy_tpu/native) when the
    result provably fits 128 bits; exact Python big ints otherwise."""
    n = len(a)
    try:
        from poulpy_tpu import native

        if native.available():
            return native.negacyclic_mul_exact(a, b)
    except (OverflowError, ImportError):
        pass
    out = [0] * n
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] += ai * bj
            else:
                out[k - n] -= ai * bj
    return out


def limbs_to_int(limbs: np.ndarray, base2k: int) -> list[int]:
    """Compose limb vector [size, N] into exact integers scaled by
    2^{size·base2k} (i.e. value·2^{size·base2k}, one big int per coeff)."""
    size, n = limbs.shape
    out = []
    for c in range(n):
        v = 0
        for j in range(size):
            v = (v << base2k) + int(limbs[j, c])
        out.append(v)
    return out


def int_to_balanced_limbs(vals: list[int], base2k: int, size: int) -> np.ndarray:
    """Exact balanced base-2^k digits of vals·2^{-size·base2k} mod 1.

    Mirrors the normalization contract: digits in [-2^{k-1}, 2^{k-1}),
    value preserved mod 2^{size·base2k} (torus wrap).
    """
    n = len(vals)
    out = np.zeros((size, n), dtype=np.int64)
    half = 1 << (base2k - 1)
    mod = 1 << (size * base2k)
    for c, v in enumerate(vals):
        v = v % mod
        if v >= mod // 2:
            v -= mod
        digits = []
        for _ in range(size):
            d = ((v + half) % (1 << base2k)) - half
            digits.append(d)
            v = (v - d) >> base2k
        for j in range(size):
            out[size - 1 - j, c] = digits[j]
    return out


def vec_value_mod1(limbs: np.ndarray, base2k: int) -> list:
    """Exact torus value·2^{size·base2k} as centered big ints."""
    vals = limbs_to_int(limbs, base2k)
    mod = 1 << (limbs.shape[0] * base2k)
    out = []
    for v in vals:
        v %= mod
        if v >= mod // 2:
            v -= mod
        out.append(v)
    return out
