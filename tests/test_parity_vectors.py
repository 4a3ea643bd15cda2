"""Golden-vector ingestion against the Rust reference (docs/parity.md).

Without a dump (`POULPY_PARITY_VECTORS` unset) only the wire-format
round-trip self-tests run; with one, every case directory is executed
through the public API and compared bit-exactly at the normalized-limb
boundary — the reference's own cross-backend equivalence point
(poulpy-hal/src/test_suite/mod.rs:35-95).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from poulpy_tpu.utils.reference_io import (
    load_vec_znx,
    read_vec_znx,
    write_vec_znx,
)

VEC_DIR = os.environ.get("POULPY_PARITY_VECTORS")


def test_vecznx_wire_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(-(2**40), 2**40, size=(2, 3, 16), dtype=np.int64)
    blob = write_vec_znx(arr)
    back, end = read_vec_znx(blob)
    assert end == len(blob)
    assert np.array_equal(back, arr)


def test_vecznx_wire_layout_is_limb_major_column_minor():
    """Byte-level pin of the reference layout (vec_znx.rs:25-26: limb j of
    column i starts at scalar offset N·(j·cols + i))."""
    n, cols, size = 4, 2, 3
    arr = np.arange(cols * size * n, dtype=np.int64).reshape(cols, size, n)
    blob = write_vec_znx(arr)
    hdr = np.frombuffer(blob[:40], dtype="<u8")
    assert list(hdr) == [n, cols, size, size, n * cols * size * 8]
    flat = np.frombuffer(blob[40:], dtype="<i8")
    for j in range(size):
        for i in range(cols):
            seg = flat[n * (j * cols + i): n * (j * cols + i + 1)]
            assert np.array_equal(seg, arr[i, j]), (i, j)


def test_vecznx_wire_rejects_inconsistent_header():
    blob = bytearray(write_vec_znx(np.zeros((1, 1, 4), dtype=np.int64)))
    blob[32:40] = (999).to_bytes(8, "little")   # corrupt len field
    with pytest.raises(ValueError, match="inconsistent"):
        read_vec_znx(bytes(blob))


def _cases():
    if not VEC_DIR:
        return []
    return sorted(p for p in Path(VEC_DIR).iterdir() if p.is_dir())


@pytest.mark.skipif(not VEC_DIR, reason="POULPY_PARITY_VECTORS not set")
@pytest.mark.parametrize("case", _cases(), ids=lambda p: p.name)
def test_reference_vector_case(case):
    from poulpy_tpu.core.automorphism import glwe_automorphism
    from poulpy_tpu.core.external_product import glwe_external_product
    from poulpy_tpu.core.keyswitching import glwe_keyswitch
    from poulpy_tpu.core.layouts import GLWECiphertext
    from poulpy_tpu.core.prepared import (
        GGLWEPrepared,
        GGSWPrepared,
        GLWEAutomorphismKeyPrepared,
    )
    from poulpy_tpu.hal import dft
    from poulpy_tpu.hal.module import get_module

    params = json.loads((case / "params.json").read_text())
    op = params["op"]
    m = get_module(params["n"], params.get("nprimes", 4))
    base2k = params["base2k"]

    if op == "big_normalize":
        big = jnp.asarray(load_vec_znx(case / "in.vecznx"))
        want = load_vec_znx(case / "out.vecznx")
        have = dft.big_normalize(
            m, params["res_size"], params["res_base2k"], big,
            params["a_base2k"], res_offset=params.get("offset", 0),
        )
        assert np.array_equal(np.asarray(have), want)
        return

    ct_arr = load_vec_znx(case / "in.vecznx")
    want = load_vec_znx(case / "out.vecznx")
    kfiles = sorted(case.glob("key_r*_c*.vecznx"))
    rows = 1 + max(int(f.name.split("_r")[1].split("_")[0]) for f in kfiles)
    cis = 1 + max(int(f.stem.split("_c")[1]) for f in kfiles)
    key_rows = [
        [load_vec_znx(case / f"key_r{i}_c{j}.vecznx") for j in range(cis)]
        for i in range(rows)
    ]
    mat = jnp.asarray(np.stack(
        [np.stack(r, axis=0) for r in key_rows], axis=0
    ))                                      # [rows, ci, co, size, N]
    pmat = dft.vmp_prepare(m, mat)
    ct = GLWECiphertext(
        data=jnp.asarray(ct_arr), base2k=base2k,
        k=ct_arr.shape[-2] * base2k,
    )
    k_key = mat.shape[-2] * base2k

    if op == "keyswitch":
        key = GGLWEPrepared(
            pmat=pmat, base2k=base2k, k=k_key, dsize=params.get("dsize", 1)
        )
        have = glwe_keyswitch(m, ct, key).data
    elif op == "external_product":
        key = GGSWPrepared(
            pmat=pmat, base2k=base2k, k=k_key, dsize=params.get("dsize", 1)
        )
        have = glwe_external_product(m, ct, key).data
    elif op == "automorphism":
        key = GLWEAutomorphismKeyPrepared(
            key=GGLWEPrepared(
                pmat=pmat, base2k=base2k, k=k_key,
                dsize=params.get("dsize", 1),
            ),
            p=params["p"],
        )
        have = glwe_automorphism(m, ct, key).data
    else:
        pytest.fail(f"unknown case op {op!r}")
    assert np.array_equal(np.asarray(have), want)
