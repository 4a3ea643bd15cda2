"""Scheme-switch bridges: GLWE↔LWE, GGLWE→GGSW
(poulpy-core/src/conversion/ and api/conversion.rs).

The LWE secret t is embedded as the rank-1 GLWE secret φ_{-1}(Σ t_j X^j)
(encryption/glwe_to_lwe_key.rs:88-96), which makes coefficient-0 extraction
a plain copy: lwe = (b_0, a_0, …, a_{n-1}).
"""

from __future__ import annotations

import jax.numpy as jnp

from poulpy_tpu.core.encryption import glwe_switching_key_encrypt_sk
from poulpy_tpu.core.keyswitching import glwe_keyswitch
from poulpy_tpu.core.layouts import (
    GGSWCiphertext,
    GLWECiphertext,
    GLWESecret,
    LWECiphertext,
    glwe_size,
)
from poulpy_tpu.core.operations import glwe_rotate
from poulpy_tpu.core.prepared import GGLWEPrepared
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.vec_znx import vec_znx_automorphism


def lwe_secret_as_glwe(module: Module, sk_lwe, dist: str = "ternary_prob") -> GLWESecret:
    """Embed an LWE secret (length ≤ N) as a rank-1 GLWE secret via φ_{-1}
    (glwe_to_lwe_key.rs:88-96)."""
    n = module.n
    data = jnp.zeros((1, n), jnp.int64).at[0, : sk_lwe.shape[-1]].set(
        jnp.asarray(sk_lwe)
    )
    return GLWESecret(data=vec_znx_automorphism(-1, data), dist=dist)


def lwe_sample_extract(a: GLWECiphertext, n_lwe: int, k: int | None = None) -> LWECiphertext:
    """Coefficient-0 extraction of a rank-1 GLWE (api/conversion.rs:19-40):
    lwe limb i = (body[i][0], mask[i][0..n_lwe])."""
    assert a.rank == 1
    k = a.k if k is None else k
    size = min(glwe_size(a.base2k, k), a.size)
    body = a.data[..., 0, :size, 0:1]
    mask = a.data[..., 1, :size, :n_lwe]
    data = jnp.concatenate([body, mask], axis=-1)
    return LWECiphertext(data=data, base2k=a.base2k, k=k)


def lwe_from_glwe(
    module: Module,
    a: GLWECiphertext,
    idx: int,
    key: GGLWEPrepared,
    n_lwe: int,
    lwe_base2k: int | None = None,
    lwe_k: int | None = None,
) -> LWECiphertext:
    """Extract coefficient `idx` as an LWE under the LWE secret
    (lwe_from_glwe_default, conversion/glwe_to_lwe.rs:46-128): rotate by
    X^{-idx}, keyswitch to the embedded LWE secret, extract coeff 0."""
    lwe_base2k = a.base2k if lwe_base2k is None else lwe_base2k
    lwe_k = a.k if lwe_k is None else lwe_k
    if idx != 0:
        a = glwe_rotate(-idx, a)
    ks = glwe_keyswitch(module, a, key, lwe_base2k, lwe_k)
    return lwe_sample_extract(ks, n_lwe, lwe_k)


def glwe_from_lwe(
    module: Module,
    lwe: LWECiphertext,
    key: GGLWEPrepared,
    res_base2k: int | None = None,
    res_k: int | None = None,
) -> GLWECiphertext:
    """Embed an LWE into a rank-1 GLWE then keyswitch to the GLWE secret
    (glwe_from_lwe_default, conversion/lwe_to_glwe.rs:46-118)."""
    n = module.n
    n_lwe = lwe.n_lwe
    size = lwe.size
    batch = lwe.data.shape[:-2]
    body = jnp.zeros(batch + (size, n), jnp.int64).at[..., :, 0].set(
        lwe.data[..., :, 0]
    )
    mask = jnp.zeros(batch + (size, n), jnp.int64).at[..., :, :n_lwe].set(
        lwe.data[..., :, 1:]
    )
    glwe = GLWECiphertext(
        data=jnp.stack([body, mask], axis=-3), base2k=lwe.base2k, k=lwe.k
    )
    return glwe_keyswitch(module, glwe, key, res_base2k, res_k)


def glwe_to_lwe_key_encrypt_sk(
    module: Module,
    sk_lwe,
    sk_glwe: GLWESecret,
    base2k: int,
    k: int,
    dnum: int,
    source_xe,
    source_xa,
    **kw,
) -> GGLWEPrepared:
    """GLWEToLWEKey: switching key sk_glwe → embedded sk_lwe."""
    from poulpy_tpu.core.prepared import gglwe_prepare, glwe_secret_prepare

    sk_emb = lwe_secret_as_glwe(module, sk_lwe)
    sk_emb_prep = glwe_secret_prepare(module, sk_emb)
    ksk = glwe_switching_key_encrypt_sk(
        module, sk_glwe, sk_emb_prep, base2k, k, dnum, source_xe, source_xa, **kw
    )
    return gglwe_prepare(module, ksk)


def lwe_to_glwe_key_encrypt_sk(
    module: Module,
    sk_lwe,
    sk_glwe_prepared,
    base2k: int,
    k: int,
    dnum: int,
    source_xe,
    source_xa,
    **kw,
) -> GGLWEPrepared:
    """LWEToGLWEKey: switching key embedded sk_lwe → sk_glwe."""
    from poulpy_tpu.core.prepared import gglwe_prepare

    sk_emb = lwe_secret_as_glwe(module, sk_lwe)
    ksk = glwe_switching_key_encrypt_sk(
        module, sk_emb, sk_glwe_prepared, base2k, k, dnum, source_xe, source_xa, **kw
    )
    return gglwe_prepare(module, ksk)


def gglwe_to_ggsw_key_encrypt_sk(
    module: Module,
    sk: GLWESecret,
    sk_prepared,
    base2k: int,
    k: int,
    dnum: int,
    source_xe,
    source_xa,
    dsize: int = 1,
    **kw,
) -> list[GGLWEPrepared]:
    """GGLWEToGGSWKey (layouts/gglwe_to_ggsw_key.rs:33, encryption in
    encryption/gglwe_to_ggsw_key.rs): keys[j] is a GGLWE with rank_in = rank
    encrypting (s_j·s_0, …, s_j·s_{rank-1}) under s."""
    from poulpy_tpu.core.encryption import gglwe_encrypt_sk
    from poulpy_tpu.core.prepared import gglwe_prepare
    from poulpy_tpu.hal import dft

    rank = sk.rank
    keys = []
    for j in range(rank):
        sj_p = dft.svp_prepare(module, sk.data[j])
        pts = []
        for i in range(rank):
            si_dft = dft.dft_apply(module, sk.data[i][None, :])
            pts.append(dft.idft_apply(module, dft.svp_apply(module, si_dft, sj_p))[0])
        pt = jnp.stack(pts, axis=0)
        key = gglwe_encrypt_sk(
            module, pt, sk_prepared, base2k, k, dnum,
            source_xe, source_xa, dsize=dsize, **kw,
        )
        keys.append(gglwe_prepare(module, key))
    return keys


def ggsw_from_gglwe(
    module: Module,
    a,                      # GGLWECiphertext with rank_in == 1
    tsk: list[GGLWEPrepared],
) -> GGSWCiphertext:
    """GGLWE → GGSW expansion (ggsw_expand_row,
    conversion/gglwe_to_ggsw.rs:116-320): column 0 of each row is the GGLWE
    row itself; column j ≥ 1 = iDFT(gglwe_product(row mask, tsk[j-1])) with
    the row's body added into column j, normalized."""
    from poulpy_tpu.core.keyswitching import gglwe_product_dft
    from poulpy_tpu.hal import dft

    rank = a.rank_out
    assert len(tsk) == rank
    dnum = a.dnum
    base2k, k, dsize = a.base2k, a.k, a.dsize
    size = a.size
    rows_out = []
    for r in range(dnum):
        row_glwe = a.data[..., r, 0, :, :, :]  # [rank+1, size, N]
        a_dft = dft.dft_apply(module, row_glwe[..., 1:, :, :])
        cols = [row_glwe]
        for col in range(1, rank + 1):
            key = tsk[col - 1]
            prod = gglwe_product_dft(module, a_dft, key)
            big = dft.idft_apply(module, prod)
            big = big.at[..., col, :, :].add(
                dft._align_limbs(
                    row_glwe[..., 0, :, :], big[..., col, :, :],
                    big.shape[-2], limb_axis=-2,
                )[0]
            )
            cols.append(dft.big_normalize(module, size, base2k, big, key.base2k))
        rows_out.append(jnp.stack(cols, axis=-4))
    data = jnp.stack(rows_out, axis=-5)
    return GGSWCiphertext(data=data, base2k=base2k, k=k, dsize=dsize)
