"""GLWE / LWE decryption (poulpy-core/src/decryption/glwe.rs:29-104).

pt = norm(ct[0] + Σ_i ct[i]·s_i) — the big accumulator collects the exact
NTT products before a single carry normalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from poulpy_tpu.core.layouts import GLWECiphertext, GLWEPlaintext, LWECiphertext, glwe_size
from poulpy_tpu.core.prepared import GLWESecretPrepared
from poulpy_tpu.hal import dft
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.normalization import vec_znx_normalize


@functools.partial(
    jax.jit, static_argnames=("module", "pt_base2k", "pt_k")
)
def glwe_decrypt(
    module: Module,
    ct: GLWECiphertext,
    sk: GLWESecretPrepared,
    pt_base2k: int | None = None,
    pt_k: int | None = None,
) -> GLWEPlaintext:
    pt_base2k = ct.base2k if pt_base2k is None else pt_base2k
    pt_k = ct.k if pt_k is None else pt_k
    pt_size = glwe_size(pt_base2k, pt_k)
    rank = ct.rank
    size = ct.size

    c0_big = jnp.zeros(ct.batch_shape + (size, module.n), jnp.int64)
    for i in range(1, rank + 1):
        ci_dft = dft.dft_apply(module, ct.data[..., i, :, :])
        ci_dft = dft.svp_apply(module, ci_dft, sk.data[i - 1])
        c0_big = c0_big + dft.idft_apply(module, ci_dft)
    c0_big = c0_big + ct.data[..., 0, :, :]

    pt = dft.big_normalize(module, pt_size, pt_base2k, c0_big, ct.base2k)
    return GLWEPlaintext(data=pt, base2k=pt_base2k, k=pt_k)


def lwe_decrypt(
    ct: LWECiphertext,
    sk_lwe,
    pt_base2k: int | None = None,
    pt_k: int | None = None,
):
    """pt limbs = norm(b + <a, s>) (poulpy-core/src/decryption/lwe.rs)."""
    pt_base2k = ct.base2k if pt_base2k is None else pt_base2k
    body = ct.data[..., :, 0]
    a = ct.data[..., :, 1:]
    acc = body + (a * jnp.asarray(sk_lwe)).sum(axis=-1)
    return vec_znx_normalize(ct.base2k, acc[..., None])[..., 0]
