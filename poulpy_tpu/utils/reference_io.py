"""Reader/writer for the REFERENCE's own wire formats (parity on-ramp).

The reference serializes a `VecZnx` as five little-endian u64 header
fields (n, cols, size, max_size, byte_len) followed by the raw i64
coefficient payload in **limb-major, column-minor** order — limb j of
column i starts at scalar offset N·(j·cols + i)
(poulpy-hal/src/layouts/vec_znx.rs:339-398, WriterTo/ReaderFrom).

This module converts between that format and the repo's `[cols, size, N]`
int64 layout so that the day a Rust toolchain (or a vector dump produced
by one) exists, bit-exact parity against poulpy-cpu-ref is ONE command:

    POULPY_PARITY_VECTORS=/path/to/dump python -m pytest \
        tests/test_parity_vectors.py -q

See docs/parity.md for the dump directory contract and exactly which
reference functions each repo oracle mirrors.
"""

from __future__ import annotations

import struct as _struct

import numpy as np

__all__ = ["read_vec_znx", "write_vec_znx", "load_vec_znx"]


def read_vec_znx(buf: bytes, offset: int = 0):
    """Parse one reference VecZnx record.

    Returns (array [cols, size, n] int64, end_offset).  Validates the
    header the same way the reference reader does (n·cols·size·8 == len).
    """
    n, cols, size, max_size, blen = _struct.unpack_from(
        "<QQQQQ", buf, offset
    )
    if n * cols * size * 8 != blen:
        raise ValueError(
            f"VecZnx metadata inconsistent: n={n} cols={cols} size={size} "
            f"-> {n * cols * size * 8} != len={blen}"
        )
    off = offset + 40
    flat = np.frombuffer(buf, dtype="<i8", count=n * cols * size,
                         offset=off)
    # reference layout: [size, cols, n] (limb-major, column-minor)
    arr = flat.reshape(size, cols, n).transpose(1, 0, 2)
    return np.ascontiguousarray(arr.astype(np.int64)), off + blen


def write_vec_znx(arr) -> bytes:
    """Serialize a [cols, size, n] int64 array in the reference's VecZnx
    wire format (max_size = size)."""
    arr = np.asarray(arr, dtype=np.int64)
    assert arr.ndim == 3, arr.shape
    cols, size, n = arr.shape
    out = bytearray()
    out += _struct.pack("<QQQQQ", n, cols, size, size, n * cols * size * 8)
    out += arr.transpose(1, 0, 2).astype("<i8").tobytes()
    return bytes(out)


def load_vec_znx(path):
    """Read a file holding exactly one VecZnx record."""
    with open(path, "rb") as f:
        buf = f.read()
    arr, end = read_vec_znx(buf)
    if end != len(buf):
        raise ValueError(f"{path}: trailing bytes ({len(buf) - end})")
    return arr
