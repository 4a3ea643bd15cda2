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


def glwe_automorphism_add(
    module: Module,
    res: GLWECiphertext,
    key: GLWEAutomorphismKeyPrepared,
) -> GLWECiphertext:
    """res += φ_p(res) (glwe_automorphism_add_assign) — the trace step."""
    return glwe_add(res, glwe_automorphism(module, res, key, res.base2k, res.k))
