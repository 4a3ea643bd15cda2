"""Deterministic ChaCha8 randomness source.

Equivalent of the reference `Source` (poulpy-hal/src/source.rs:18-97): a
ChaCha8 keystream seeded by 32 bytes, with u32/u64 draws, branchable
substreams, bounded sampling and f64 conversion.  Implemented host-side in
numpy with vectorized block generation (whole key/noise tensors are sampled
in one call, then shipped to device) — the reference samples coefficient by
coefficient in scalar Rust loops.

Layout matches ChaCha8Rng (rand_chacha): 128-bit constant "expand 32-byte k",
8 key words (seed, LE), 64-bit block counter starting at 0, 64-bit stream 0;
keystream words are the 16 post-round-added u32 state words per 64-byte
block, consumed in order; `next_u64` = lo word then hi word.  The normal
sampler uses Box–Muller over `next_f64` pairs instead of rand_distr's
ziggurat (statistically equivalent, deterministic within this library; exact
cross-matching of Rust noise streams is not required because comparisons
happen at the decrypted-noise level, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

_CONSTANTS = np.array(
    [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], dtype=np.uint32
)

MAXF64 = 9007199254740992.0  # 2^53 (source.rs:8)


def _rotl(x, n):
    return (x << np.uint32(n)) | (x >> np.uint32(32 - n))


def _chacha_blocks(
    key_words: np.ndarray, counters: np.ndarray, double_rounds: int = 4
) -> np.ndarray:
    """ChaCha blocks for an array of counters. Returns [B, 16] uint32.

    double_rounds=4 is ChaCha8 (the library's Source).  The parameter exists
    so the test suite can run the SAME permutation core at 10 double-rounds
    (ChaCha20) against an external known-answer anchor (OpenSSL via pyca
    `cryptography`, tests/test_hal.py::test_chacha_core_openssl_kat) —
    anchoring the constants, state layout, quarter-round, and final
    feed-forward addition to an independent, widely-validated
    implementation."""
    b = counters.shape[0]
    state = np.zeros((b, 16), dtype=np.uint32)
    state[:, 0:4] = _CONSTANTS
    state[:, 4:12] = key_words
    state[:, 12] = (counters & 0xFFFFFFFF).astype(np.uint32)
    state[:, 13] = (counters >> 32).astype(np.uint32)
    # words 14,15 = stream id = 0
    x = state.copy()

    def qr(a, bb, c, d):
        x[:, a] += x[:, bb]
        x[:, d] = _rotl(x[:, d] ^ x[:, a], 16)
        x[:, c] += x[:, d]
        x[:, bb] = _rotl(x[:, bb] ^ x[:, c], 12)
        x[:, a] += x[:, bb]
        x[:, d] = _rotl(x[:, d] ^ x[:, a], 8)
        x[:, c] += x[:, d]
        x[:, bb] = _rotl(x[:, bb] ^ x[:, c], 7)

    with np.errstate(over="ignore"):
        for _ in range(double_rounds):  # ChaCha8 = 4 double-rounds
            qr(0, 4, 8, 12)
            qr(1, 5, 9, 13)
            qr(2, 6, 10, 14)
            qr(3, 7, 11, 15)
            qr(0, 5, 10, 15)
            qr(1, 6, 11, 12)
            qr(2, 7, 8, 13)
            qr(3, 4, 9, 14)
        x += state
    return x


class Source:
    """Deterministic, branchable pseudorandom source (not for key secrecy in
    production — mirrors the reference's reproducibility contract)."""

    def __init__(self, seed: bytes | np.ndarray):
        seed = np.frombuffer(bytes(seed), dtype=np.uint8)
        if seed.size != 32:
            raise ValueError("Source seed must be 32 bytes")
        self._key = seed.view(np.uint32).copy()
        self._counter = 0
        self._buf = np.zeros(0, dtype=np.uint32)
        self._pos = 0

    # -- keystream ---------------------------------------------------------

    def _refill(self, min_words: int):
        nblocks = max(4, -(-min_words // 16))
        from poulpy_tpu import native

        if native.available():
            # bit-exact C++ keystream (tests/test_native.py)
            fresh = native.chacha8_blocks(
                self._key, self._counter, nblocks
            ).reshape(-1)
        else:
            counters = np.arange(
                self._counter, self._counter + nblocks, dtype=np.uint64
            )
            fresh = _chacha_blocks(self._key, counters).reshape(-1)
        self._counter += nblocks
        left = self._buf[self._pos :]
        self._buf = np.concatenate([left, fresh]) if left.size else fresh
        self._pos = 0

    def _take_u32(self, count: int) -> np.ndarray:
        if self._buf.size - self._pos < count:
            self._refill(count - (self._buf.size - self._pos))
        out = self._buf[self._pos : self._pos + count]
        self._pos += count
        return out

    # -- draws -------------------------------------------------------------

    def next_u32(self) -> int:
        return int(self._take_u32(1)[0])

    def next_u64(self) -> int:
        w = self._take_u32(2)
        return int(w[0]) | (int(w[1]) << 32)

    def u64_array(self, count: int) -> np.ndarray:
        w = self._take_u32(2 * count).reshape(count, 2).astype(np.uint64)
        return w[:, 0] | (w[:, 1] << np.uint64(32))

    def fill_bytes(self, count: int) -> bytes:
        words = self._take_u32(-(-count // 4))
        return words.tobytes()[:count]

    def new_seed(self) -> bytes:
        return self.fill_bytes(32)

    def branch(self) -> tuple[bytes, "Source"]:
        """Derive an independent child source (source.rs:37-42)."""
        seed = self.new_seed()
        return seed, Source(seed)

    def next_u64n(self, max_: int, mask: int) -> int:
        """Uniform u64 in [0, max) by masked rejection (source.rs:57-63)."""
        x = self.next_u64() & mask
        while x >= max_:
            x = self.next_u64() & mask
        return x

    def next_f64(self, lo: float = 0.0, hi: float = 1.0) -> float:
        return lo + ((self.next_u64() & ((1 << 53) - 1)) / MAXF64) * (hi - lo)

    # -- vectorized samplers ----------------------------------------------

    def uniform_digits(self, base2k: int, shape) -> np.ndarray:
        """Balanced uniform digits in [-2^{k-1}, 2^{k-1}), int64.

        Mirrors znx_fill_uniform_ref
        (poulpy-cpu-ref/src/reference/znx/sampling.rs:5-12): one u64 draw per
        coefficient, masked to base2k bits (the mask is tight so rejection
        never triggers), then centered.
        """
        count = int(np.prod(shape))
        u = self.u64_array(count) & np.uint64((1 << base2k) - 1)
        x = u.astype(np.int64) - (1 << (base2k - 1))
        return x.reshape(shape)

    def normal_f64(self, shape, sigma: float, bound: float) -> np.ndarray:
        """Rounded Gaussian with rejection beyond `bound`
        (znx_fill_normal_f64_ref, reference/znx/sampling.rs:34-44)."""
        count = int(np.prod(shape))
        out = np.zeros(count, dtype=np.float64)
        need = np.arange(count)
        while need.size:
            m = need.size
            u = self.u64_array(2 * ((m + 1) // 2 * 2))
            f = (u & np.uint64((1 << 53) - 1)).astype(np.float64) / MAXF64
            f = f.reshape(-1, 2)
            u1 = np.maximum(f[:, 0], 1e-300)
            r = np.sqrt(-2.0 * np.log(u1)) * sigma
            theta = 2.0 * np.pi * f[:, 1]
            z = (r * np.cos(theta))[:m]
            out[need] = z
            need = need[np.abs(z) > bound]
        return np.rint(out).reshape(shape)

    def ternary_prob(self, shape, prob: float = 0.5) -> np.ndarray:
        """Ternary secret coefficients: 0 w.p. 1-prob, else ±1
        (ScalarZnx::fill_ternary_prob, poulpy-hal/src/layouts/scalar_znx.rs:92)."""
        count = int(np.prod(shape))
        u = self.u64_array(count)
        f = (u & np.uint64((1 << 53) - 1)).astype(np.float64) / MAXF64
        sign = np.where((u >> np.uint64(63)).astype(np.int64) == 0, 1, -1)
        x = np.where(f < prob, sign, 0).astype(np.int64)
        return x.reshape(shape)

    def ternary_hw(self, n: int, hw: int) -> np.ndarray:
        """Fixed-Hamming-weight ternary vector
        (fill_ternary_hw, scalar_znx.rs:118-140)."""
        x = np.zeros(n, dtype=np.int64)
        signs = self.u64_array(hw)
        x[:hw] = np.where((signs >> np.uint64(63)).astype(np.int64) == 0, 1, -1)
        # Fisher-Yates with next_u64n
        for i in range(n - 1, 0, -1):
            mask = (1 << (i + 1).bit_length()) - 1
            j = self.next_u64n(i + 1, mask)
            x[i], x[j] = x[j], x[i]
        return x

    def binary_prob(self, shape, prob: float = 0.5) -> np.ndarray:
        count = int(np.prod(shape))
        u = self.u64_array(count)
        f = (u & np.uint64((1 << 53) - 1)).astype(np.float64) / MAXF64
        return (f < prob).astype(np.int64).reshape(shape)

    def binary_block(self, n: int, block_size: int) -> np.ndarray:
        """Block-binary secret (fill_binary_block, scalar_znx.rs): one
        uniformly-placed 1 (or none) per block of `block_size`."""
        assert n % block_size == 0
        nblocks = n // block_size
        x = np.zeros(n, dtype=np.int64)
        for b in range(nblocks):
            mask = (1 << (block_size + 1).bit_length()) - 1
            j = self.next_u64n(block_size + 1, mask)
            if j < block_size:
                x[b * block_size + j] = 1
        return x
