"""GLWE trace and slot packing (poulpy-core/src/glwe_trace.rs,
glwe_packing.rs).

Trace: res = Σ Galois conjugates — projects onto the coefficient-0 subspace
(replicating it).  Packing: merges up to N ciphertexts' coefficient-0 slots
into one ciphertext via the recursion a ← a + b·X^t + φ(a − b·X^t), with the
implicit rsh-by-1 (no modswitch) trick documented in glwe_packing.rs:33-39.
"""

from __future__ import annotations

from poulpy_tpu.core.automorphism import glwe_automorphism, glwe_automorphism_add
from poulpy_tpu.core.layouts import GLWECiphertext
from poulpy_tpu.core.operations import (
    glwe_add,
    glwe_normalize_inplace,
    glwe_rotate,
    glwe_rsh,
    glwe_sub,
)
from poulpy_tpu.core.prepared import GLWEAutomorphismKeyPrepared
from poulpy_tpu.hal.module import Module


def trace_galois_elements(module: Module) -> list[int]:
    """glwe_trace.rs:34-45: -1 for level 0, else 5^{2^{i-1}} mod 2N."""
    out = []
    for i in range(module.log_n):
        out.append(-1 if i == 0 else module.galois_element(1 << (i - 1)))
    return out


def glwe_trace(
    module: Module,
    a: GLWECiphertext,
    keys: dict[int, GLWEAutomorphismKeyPrepared],
    skip: int = 0,
) -> GLWECiphertext:
    """glwe_trace_assign (glwe_trace.rs:129-176): per level, halve then add
    the conjugate.  `keys` maps galois elements (as produced by
    `trace_galois_elements`, with -1 allowed literally) to prepared keys."""
    res = a
    for i in range(skip, module.log_n):
        res = glwe_rsh(1, res)
        p = -1 if i == 0 else module.galois_element(1 << (i - 1))
        res = glwe_automorphism_add(module, res, keys[p])
    return res


def glwe_pack(
    module: Module,
    cts: dict[int, GLWECiphertext],
    keys: dict[int, GLWEAutomorphismKeyPrepared],
    log_gap_out: int = 0,
) -> GLWECiphertext:
    """glwe_pack (glwe_packing.rs:122-172): pack the coefficient-0 slots of
    `cts[j]` into coefficient j·2^{log_gap_out} of one output ciphertext.

    Tree merge: at level i, partner slots j and j+t (t = N/2^{i+1}) combine
    via a ← (a·X^{-t} + b)/2 − φ((a·X^{-t} − b)/2) then ·X^t; a final trace
    clears the remaining conjugate garbage.
    """
    log_n = module.log_n
    a = dict(cts)
    assert max(a) < module.n

    for i in range(log_n - log_gap_out):
        t = min(module.n, 1 << (log_n - 1 - i))
        p = -1 if i == 0 else module.galois_element(1 << (i - 1))
        key = keys[p]
        for j in range(t):
            lo = a.pop(j, None)
            hi = a.pop(j + t, None)
            merged = _pack_internal(module, lo, hi, i, key)
            if merged is not None:
                a[j] = merged

    return glwe_trace(module, a[0], keys, skip=log_n - log_gap_out)


def _pack_internal(
    module: Module,
    a: GLWECiphertext | None,
    b: GLWECiphertext | None,
    i: int,
    key: GLWEAutomorphismKeyPrepared,
) -> GLWECiphertext | None:
    """pack_internal (glwe_packing.rs:15-86)."""
    if a is None and b is None:
        return None
    if a is not None:
        t = 1 << (module.log_n - i - 1)
        if b is not None:
            a = glwe_rotate(-t, a)
            tmp = glwe_rsh(1, glwe_sub(a, b))
            a = glwe_rsh(1, glwe_add(a, b))
            tmp = glwe_normalize_inplace(tmp)
            tmp = glwe_automorphism(module, tmp, key, a.base2k, a.k)
            a = glwe_normalize_inplace(glwe_sub(a, tmp))
            return glwe_rotate(t, a)
        a = glwe_rsh(1, a)
        return glwe_automorphism_add(module, a, key)
    # a empty, b present (glwe_packing.rs:76-86)
    t = 1 << (module.log_n - i - 1)
    tmp = glwe_rsh(1, glwe_rotate(t, b))
    return glwe_sub(tmp, glwe_automorphism(module, tmp, key, b.base2k, b.k))


class GLWEPacker:
    """Streaming packer with log(N) memory (GLWEPacker,
    poulpy-core/src/glwe_packer.rs:20-113): ciphertexts are fed one at a
    time; a binary-counter tree of accumulators folds pairs with the same
    recursion as `glwe_pack`.  Output coefficient order is bit-reversed
    (glwe_packer.rs docstring)."""

    def __init__(self, module: Module, log_batch: int = 0):
        self.module = module
        self.log_batch = log_batch
        n_acc = module.log_n - log_batch
        self.accs: list = [(None, False)] * n_acc  # (value, control)
        self.counter = 0

    def add(self, ct: GLWECiphertext | None, keys) -> None:
        """Feed the next ciphertext (or None for an empty slot)
        (glwe_packer_add, glwe_packer.rs:120-139)."""
        assert self.counter < self.module.n >> self.log_batch, "packer full"
        self._pack_core(ct, 0, keys)
        self.counter += 1

    def _pack_core(self, a, j: int, keys) -> None:
        """pack_core (glwe_packer.rs:229-265): binary-counter fold."""
        if j == len(self.accs):
            return
        level = self.log_batch + j
        val, ctrl = self.accs[j]
        if not ctrl:
            self.accs[j] = (a, True)
            return
        p = -1 if level == 0 else self.module.galois_element(1 << (level - 1))
        merged = _pack_internal(self.module, val, a, level, keys[p])
        # keep the merged value in place (the reference combines in-place and
        # only marks the slot overridable, glwe_packer.rs:255-263) — the last
        # accumulator must still hold the result for flush()
        self.accs[j] = (merged, False)
        self._pack_core(merged, j + 1, keys)

    def flush(self) -> GLWECiphertext:
        """Return the packed result and reset (glwe_packer_flush)."""
        assert self.counter == self.module.n >> self.log_batch, "packer not full"
        out = self.accs[-1][0]
        self.accs = [(None, False)] * len(self.accs)
        self.counter = 0
        return out
