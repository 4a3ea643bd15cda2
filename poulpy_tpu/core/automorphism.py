"""GLWE automorphisms (poulpy-core/src/automorphism/glwe_ct.rs).

φ_p(ct): keyswitch with the automorphism key (which encrypts φ_{p^{-1}}(s)
under s), then apply the coefficient permutation X → X^p to every column.
"""

from __future__ import annotations

from poulpy_tpu.core.keyswitching import glwe_keyswitch
from poulpy_tpu.core.layouts import GLWECiphertext
from poulpy_tpu.core.operations import glwe_add
from poulpy_tpu.core.prepared import GLWEAutomorphismKeyPrepared
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.vec_znx import vec_znx_automorphism


def glwe_automorphism(
    module: Module,
    a: GLWECiphertext,
    key: GLWEAutomorphismKeyPrepared,
    res_base2k: int | None = None,
    res_k: int | None = None,
) -> GLWECiphertext:
    """glwe_automorphism_default (automorphism/glwe_ct.rs:47-68):
    keyswitch then permute."""
    ks = glwe_keyswitch(module, a, key.key, res_base2k, res_k)
    return ks.replace(data=vec_znx_automorphism(key.p, ks.data))


def ggsw_automorphism(
    module: Module,
    a,                        # GGSWCiphertext
    key: GLWEAutomorphismKeyPrepared,
    tsk,                      # GGLWEToGGSWKey (list[GGLWEPrepared])
):
    """GGSW-ciphertext automorphism (ggsw_automorphism_default,
    automorphism/ggsw_ct.rs:32-61): φ_p on column 0 of every gadget row
    (one batched keyswitch+permute over the dnum axis), then regenerate
    columns 1..rank via the GGLWE→GGSW row expansion."""
    from poulpy_tpu.core.conversion import ggsw_from_gglwe
    from poulpy_tpu.core.layouts import GGLWECiphertext, GLWECiphertext

    col0 = GLWECiphertext(
        data=a.data[..., :, 0, :, :, :], base2k=a.base2k, k=a.k
    )
    auto = glwe_automorphism(module, col0, key)
    gglwe = GGLWECiphertext(
        data=auto.data[..., :, None, :, :, :],
        base2k=auto.base2k,
        k=auto.k,
        dsize=a.dsize,
    )
    return ggsw_from_gglwe(module, gglwe, tsk)


def glwe_automorphism_key_automorphism(
    module: Module,
    a,                        # GGLWECiphertext (the ATK for element a_p)
    a_p: int,
    key: GLWEAutomorphismKeyPrepared,
):
    """Automorphism-key automorphism
    (glwe_automorphism_key_automorphism_default, automorphism/
    gglwe_atk.rs:42-115): composes ATK(a_p) with ATK(key.p) into
    ATK(a_p·key.p).  Per sub-ciphertext: φ_{a_p} turns
    (−φ_{a_p^{-1}}(s)·a + s, a) into (−s·a + φ_{a_p}(s), a); the keyswitch
    moves it under φ_{key.p^{-1}}(s); φ_{a_p^{-1}} lands back on
    (−φ_{(a_p·key.p)^{-1}}(s)·a + s, a).  Returns (GGLWE, p_out)."""
    from poulpy_tpu.core.layouts import GGLWECiphertext, GLWECiphertext

    order = 2 * module.n
    p = int(a_p) % order
    p_inv = pow(p, -1, order)
    tmp = vec_znx_automorphism(p, a.data)
    ks = glwe_keyswitch(
        module, GLWECiphertext(data=tmp, base2k=a.base2k, k=a.k), key.key
    )
    out = vec_znx_automorphism(p_inv, ks.data)
    p_out = (p * key.p) % order
    return (
        GGLWECiphertext(data=out, base2k=ks.base2k, k=ks.k, dsize=a.dsize),
        p_out,
    )


def glwe_automorphism_add(
    module: Module,
    res: GLWECiphertext,
    key: GLWEAutomorphismKeyPrepared,
) -> GLWECiphertext:
    """res += φ_p(res) (glwe_automorphism_add_assign) — the trace step."""
    return glwe_add(res, glwe_automorphism(module, res, key, res.base2k, res.k))
