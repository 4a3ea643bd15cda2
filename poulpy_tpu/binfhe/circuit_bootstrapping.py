"""Circuit bootstrapping: LWE → GGSW
(poulpy-bin-fhe/src/circuit_bootstrapping/circuit.rs:220-421).

One blind rotation with a multi-digit LUT produces all gadget digits of the
message packed `gap` coefficients apart; per digit, a full trace isolates
coefficient 0 into a GGLWE row; the GGLWE is expanded to a GGSW through the
GGLWEToGGSWKey tensor keys.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from poulpy_tpu.binfhe.blind_rotation import (
    BlindRotationKeyPrepared,
    blind_rotation_dispatch,
    blind_rotation_key_encrypt_sk,
)
from poulpy_tpu.binfhe.lut import lookup_table_new
from poulpy_tpu.core import encryption as enc
from poulpy_tpu.core.conversion import gglwe_to_ggsw_key_encrypt_sk, ggsw_from_gglwe
from poulpy_tpu.core.layouts import (
    GGLWECiphertext,
    GGSWCiphertext,
    GLWECiphertext,
    LWECiphertext,
    glwe_size,
)
from poulpy_tpu.core.operations import glwe_rotate
from poulpy_tpu.core.packing import glwe_trace, trace_galois_elements
from poulpy_tpu.core.prepared import (
    GLWEAutomorphismKeyPrepared,
    gglwe_prepare,
    glwe_secret_prepare,
)
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.source import Source


@dataclass
class CircuitBootstrappingKey:
    """{brk, atk, tsk} bundle (circuit_bootstrapping/key.rs:181-185).
    block_size > 1 declares the LWE secret block-binary, routing the CBT
    blind rotation through the batched block path (key.block_size() in the
    reference)."""

    brk: BlindRotationKeyPrepared
    atk: dict[int, GLWEAutomorphismKeyPrepared]
    tsk: list  # GGLWEPrepared per rank column (GGLWEToGGSWKey)
    block_size: int = 1


def circuit_bootstrapping_keygen(
    module: Module,
    sk_lwe,
    sk_glwe,
    sk_glwe_prepared,
    base2k: int,
    k_brk: int,
    dnum_brk: int,
    k_atk: int,
    dnum_atk: int,
    k_tsk: int,
    dnum_tsk: int,
    source_xe: Source,
    source_xa: Source,
    block_size: int = 1,
) -> CircuitBootstrappingKey:
    brk = blind_rotation_key_encrypt_sk(
        module, jnp.asarray(sk_lwe), sk_glwe_prepared,
        base2k, k_brk, dnum_brk, source_xe, source_xa,
    )
    atk = {}
    for p in trace_galois_elements(module):
        key, _ = enc.glwe_automorphism_key_encrypt_sk(
            module, p, sk_glwe, base2k, k_atk, dnum_atk, source_xe, source_xa
        )
        atk[p] = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(module, key), p=p)
    tsk = gglwe_to_ggsw_key_encrypt_sk(
        module, sk_glwe, sk_glwe_prepared, base2k, k_tsk, dnum_tsk,
        source_xe, source_xa,
    )
    return CircuitBootstrappingKey(
        brk=brk, atk=atk, tsk=tsk, block_size=block_size
    )


def circuit_bootstrap(
    module: Module,
    lwe: LWECiphertext,
    log_domain: int,
    key: CircuitBootstrappingKey,
    dnum_res: int,
    k_res: int,
    to_exponent: bool = False,
    extension_factor: int = 1,
) -> GGSWCiphertext:
    """circuit_bootstrap_core (circuit.rs:220-369).

    to_constant (default): GGSW encrypting the constant j = dec(lwe).
    to_exponent: GGSW encrypting X^j.

    `extension_factor` spreads the LUT over that many degree-N polynomials
    (effective domain N·ext, circuit.rs:288-299); key.block_size routes the
    blind rotation through the block-binary path.  Both compose with each
    other and with either encoding.
    """
    if module.mesh is not None:
        from poulpy_tpu.parallel.auto import dp_shard

        return dp_shard(
            module,
            lambda l: circuit_bootstrap(
                module.local, l, log_domain, key, dnum_res, k_res,
                to_exponent, extension_factor,
            ),
            lwe,
        )
    base2k = key.brk.base2k
    res_base2k = base2k
    alpha = 1 << (dnum_res - 1).bit_length() if dnum_res > 1 else 1
    n = module.n

    f = np.zeros(((1 << log_domain) * alpha,), dtype=np.int64)
    if to_exponent:
        for i in range(dnum_res):
            f[i] = 1 << (res_base2k * (dnum_res - 1 - i))
    else:
        for j in range(1 << log_domain):
            for i in range(dnum_res):
                f[j * alpha + i] = j * (1 << (res_base2k * (dnum_res - 1 - i)))

    lut_k = res_base2k * dnum_res
    lut = lookup_table_new(
        n, base2k, lut_k, f, lut_k,
        extension_factor=extension_factor,
        rot_dir="right" if to_exponent else "left",
    )

    acc_data = blind_rotation_dispatch(
        module, lwe, lut, key.brk, key.block_size
    )
    acc = GLWECiphertext(data=acc_data, base2k=base2k, k=lut.size * base2k)

    # digit spacing in the N-ring: the full-domain step folds by ext
    # (circuit.rs:333)
    gap = 2 * lut.drift // extension_factor
    assert gap > 0, (lut.drift, extension_factor)
    log_gap_in = (gap * alpha - 1).bit_length()

    rows = []
    for i in range(dnum_res):
        if to_exponent:
            row = _post_process(
                module, acc, log_gap_in, 0, log_domain, key.atk
            )
        else:
            row = glwe_trace(module, acc, key.atk, skip=0)
        rows.append(row.data)
        if i + 1 < dnum_res:
            acc = glwe_rotate(-gap, acc)

    # [..., dnum, 1, rank+1, size, N] — batch axes (if any) stay leading, so
    # one call bootstraps a whole batch of LWEs (the FheUint preparation path)
    gglwe_data = jnp.expand_dims(jnp.stack(rows, axis=-4), axis=-4)
    gglwe = GGLWECiphertext(
        data=gglwe_data, base2k=base2k, k=acc.k, dsize=1
    )
    return ggsw_from_gglwe(module, gglwe, key.tsk)


def _post_process(
    module: Module,
    a: GLWECiphertext,
    log_gap_in: int,
    log_gap_out: int,
    log_domain: int,
    atk,
) -> GLWECiphertext:
    """circuit.rs:374-421: partial trace then (optionally) repack with a
    different coefficient gap."""
    from poulpy_tpu.core.packing import glwe_pack

    if log_gap_in != log_gap_out:
        a_trace = glwe_trace(module, a, atk, skip=module.log_n - log_gap_in + 1)
        cts = {}
        cur = a_trace
        for i in range(1 << log_domain):
            if i != 0:
                cur = glwe_rotate(-(1 << log_gap_in), cur)
            cts[i * (1 << log_gap_out)] = cur
        return glwe_pack(module, cts, atk, log_gap_out)
    return glwe_trace(module, a, atk, skip=module.log_n - log_gap_in + 1)
