"""Leveled CKKS over the torus (poulpy-ckks).

Ciphertexts are GLWEs with a `CKKSMeta{log_delta, log_budget}` bit-level
scale/capacity tracker (poulpy-ckks/src/layouts/ciphertext.rs:18-24);
rescaling is a pure limb bit-shift (no modulus switching).
"""

from poulpy_tpu.ckks.layouts import CKKSCiphertext, CKKSMeta  # noqa: F401
from poulpy_tpu.ckks.encoder import Encoder  # noqa: F401
from poulpy_tpu.ckks.plaintext import (  # noqa: F401
    CKKSPlaintextCstRnx,
    CKKSPlaintextCstZnx,
    CKKSPlaintextVecRnx,
    cst_rnx_to_znx,
    mul_cst_rnx,
    mul_cst_znx,
    mul_plain_rnx,
    vec_rnx_from_znx,
    vec_rnx_to_znx,
)
