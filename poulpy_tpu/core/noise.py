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
