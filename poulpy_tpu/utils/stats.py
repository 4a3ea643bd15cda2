"""Noise/statistics helpers (poulpy-hal/src/layouts/stats.rs:7-60).

The reference uses arbitrary-precision decoded values; host-side float64 is
ample for the ≤ 2^-120 magnitudes that matter in tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from poulpy_tpu.hal.vec_znx import decode_vec_float


@dataclass(frozen=True)
class Stats:
    """Summary statistics of a decoded torus polynomial."""

    mean: float
    std: float
    max_abs: float

    @property
    def log2_std(self) -> float:
        return float(np.log2(max(self.std, 1e-300)))

    @property
    def log2_max(self) -> float:
        return float(np.log2(max(self.max_abs, 1e-300)))


def vec_znx_stats(base2k: int, limbs) -> Stats:
    """Stats of a limb vector's torus values (VecZnx::stats)."""
    v = decode_vec_float(base2k, np.asarray(limbs))
    return Stats(
        mean=float(v.mean()), std=float(v.std()), max_abs=float(np.abs(v).max())
    )


def noise_stats(base2k: int, pt_have, pt_want_float) -> Stats:
    """Torus distance statistics between a decoded plaintext and the ideal
    value (the decrypt-and-compare oracle of the reference test suites)."""
    v = decode_vec_float(base2k, np.asarray(pt_have)) - np.asarray(pt_want_float)
    v -= np.round(v)
    return Stats(
        mean=float(v.mean()), std=float(v.std()), max_abs=float(np.abs(v).max())
    )
