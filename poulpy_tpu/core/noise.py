"""Closed-form noise-variance model (poulpy-core/src/noise/mod.rs).

Used for parameter selection and as the oracle in keyswitch / external
product tests (the reference asserts measured noise ≤ predicted + 0.5 bits,
poulpy-core/src/test_suite/keyswitch/).
"""

from __future__ import annotations

import math


def var_noise_gglwe_product(
    n: float,
    base2k: int,
    var_xs: float,
    var_msg: float,
    var_a_err: float,
    var_gct_err_lhs: float,
    var_gct_err_rhs: float,
    rank_in: float,
    a_logq: int,
    b_logq: int,
) -> float:
    """noise/mod.rs:18-46."""
    a_logq = min(a_logq, b_logq)
    b_scale = 2.0 ** b_logq
    a_scale = 2.0 ** (b_logq - a_logq)
    a_cols = -(-a_logq // base2k)
    base = 2.0 ** base2k
    var_base = base * base / 12.0
    noise = a_cols * n * var_base * (var_gct_err_lhs + var_xs * var_gct_err_rhs)
    noise += var_msg * var_a_err * a_scale * a_scale * n
    noise *= rank_in
    noise /= b_scale * b_scale
    return noise


def log2_std_noise_gglwe_product(
    n: float,
    base2k: int,
    var_xs: float,
    var_msg: float,
    var_a_err: float,
    var_gct_err_lhs: float,
    var_gct_err_rhs: float,
    rank_in: float,
    a_logq: int,
    b_logq: int,
) -> float:
    """log2 std of the keyswitch/external-product output noise
    (noise/mod.rs log2_std_noise_gglwe_product)."""
    v = var_noise_gglwe_product(
        n, base2k, var_xs, var_msg, var_a_err,
        var_gct_err_lhs, var_gct_err_rhs, rank_in, a_logq, b_logq,
    )
    return 0.5 * math.log2(max(v, 1e-300))


def var_sigma(sigma: float, k: int) -> float:
    """Variance of fresh encryption noise at torus scale 2^-k."""
    return (sigma / 2.0 ** k) ** 2


XS_VAR = {"ternary_prob": 0.5, "binary_prob": 0.25, "binary_block": 0.25}


def var_noise_keyswitch(
    n: float, base2k: int, k_ct: int, k_ksk: int, dnum: int, dsize: int,
    rank_in: int, sigma_key: float = 3.2, var_xs: float = XS_VAR["ternary_prob"],
) -> float:
    """Output noise variance of a GLWE keyswitch (the var_noise_gglwe_product
    instantiation used by test_suite/keyswitch, noise/mod.rs:48-75 v2 form)."""
    base = 2.0 ** (dsize * base2k)
    var_base = base * base / 12.0
    scale = 2.0 ** k_ksk
    var_gct = sigma_key * sigma_key
    noise = dnum * n * var_base * var_gct
    noise *= rank_in
    noise /= scale * scale
    return noise


def var_noise_external_product(
    n: float, base2k: int, k_ct: int, k_ggsw: int, dnum: int, dsize: int,
    rank: int, sigma_key: float = 3.2, var_xs: float = XS_VAR["ternary_prob"],
) -> float:
    """Output noise variance of a GLWE×GGSW external product
    (noise/ggsw.rs): rank+1 input columns pass through the gadget."""
    return var_noise_keyswitch(
        n, base2k, k_ct, k_ggsw, dnum, dsize, rank + 1, sigma_key, var_xs
    )


def log2_std(v: float) -> float:
    return 0.5 * math.log2(max(v, 1e-300))


# --------------------------------------------------------------------------
# Measured noise (poulpy-core/src/noise/{glwe,gglwe,ggsw}.rs)
# --------------------------------------------------------------------------

def glwe_noise(module, ct, pt_want, sk_prepared):
    """Measured noise Stats of a GLWE ciphertext against the expected
    plaintext: decrypt, subtract, normalize, stats
    (poulpy-core/src/noise/glwe.rs:28-46 glwe_noise)."""
    from poulpy_tpu.core.decryption import glwe_decrypt
    from poulpy_tpu.hal import vec_znx
    from poulpy_tpu.hal.normalization import vec_znx_normalize
    from poulpy_tpu.utils.stats import vec_znx_stats

    assert pt_want.base2k == ct.base2k, "pt_want must share the ct base2k"
    pt_have = glwe_decrypt(module, ct, sk_prepared)
    d = vec_znx.vec_znx_sub(pt_have.data, pt_want.data)
    d = vec_znx_normalize(ct.base2k, d)
    return vec_znx_stats(ct.base2k, d)


def _gadget_plaintext(gadget, row: int, pt_scalar):
    """Expected plaintext limbs of gadget row `row`: the scalar placed at
    limb (dsize-1) + row·dsize (noise/gglwe.rs:71 add_scalar placement)."""
    import jax.numpy as jnp

    limb = (gadget.dsize - 1) + row * gadget.dsize
    pt = jnp.zeros(
        pt_scalar.shape[:-1] + (gadget.size, gadget.n), jnp.int64
    )
    return pt.at[..., limb, :].set(pt_scalar)


def gglwe_noise(module, gglwe, row: int, col: int, pt_want_scalar, sk_prepared):
    """Measured noise of GGLWE gadget row (row, col) against the scalar it
    should encrypt at that digit (noise/gglwe.rs:31-76 gglwe_noise).
    `pt_want_scalar` is the [N] scalar polynomial of input column `col`."""
    from poulpy_tpu.core.layouts import GLWECiphertext, GLWEPlaintext

    ct = GLWECiphertext(
        data=gglwe.data[..., row, col, :, :, :],
        base2k=gglwe.base2k,
        k=gglwe.k,
    )
    pt = GLWEPlaintext(
        data=_gadget_plaintext(gglwe, row, pt_want_scalar),
        base2k=gglwe.base2k,
        k=gglwe.k,
    )
    return glwe_noise(module, ct, pt, sk_prepared)


def ggsw_noise(module, ggsw, row: int, col: int, pt_want_scalar, sk_prepared):
    """Measured noise of GGSW row (row, col): expected value is m·s_col·2^-…
    with s_0 = 1, so for col > 0 the digit plaintext is multiplied by
    sk[col-1] in the DFT domain first (noise/ggsw.rs:64-103 ggsw_noise)."""
    from poulpy_tpu.core.layouts import GLWECiphertext, GLWEPlaintext
    from poulpy_tpu.hal import dft

    pt_limbs = _gadget_plaintext(ggsw, row, pt_want_scalar)
    if col > 0:
        pt_dft = dft.dft_apply(module, pt_limbs)
        pt_dft = dft.svp_apply(module, pt_dft, sk_prepared.data[col - 1])
        pt_big = dft.idft_apply(module, pt_dft)
        pt_limbs = dft.big_normalize(
            module, ggsw.size, ggsw.base2k, pt_big, ggsw.base2k
        )
    ct = GLWECiphertext(
        data=ggsw.data[..., row, col, :, :, :],
        base2k=ggsw.base2k,
        k=ggsw.k,
    )
    pt = GLWEPlaintext(data=pt_limbs, base2k=ggsw.base2k, k=ggsw.k)
    return glwe_noise(module, ct, pt, sk_prepared)
