"""Optimized TPU kernel backends (Pallas).

The jnp int64 implementations in poulpy_tpu/hal are the reference backend
(the analogue of poulpy-cpu-ref); the Pallas kernels here are the optimized
backend (the analogue of poulpy-cpu-avx), cross-checked bit-exactly against
the jnp path by tests/test_pallas.py — the cross_backend_test_suite pattern
(poulpy-hal/src/test_suite/mod.rs:35-95).

Dispatch: `use_pallas()` — defaults to True on TPU (the analogue of the AVX
backend's runtime CPUID check, poulpy-cpu-avx/src/lib.rs:40-45), overridable
with POULPY_TPU_BACKEND=jnp|pallas.
"""

import functools
import os


@functools.lru_cache(maxsize=1)
def use_pallas() -> bool:
    import jax

    env = os.environ.get("POULPY_TPU_BACKEND")
    if env == "jnp":
        return False
    if env == "pallas":
        return True
    return jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=1)
def use_fused() -> bool:
    """Fused external-product/keyswitch mega-kernels (pallas_fused.py).

    On by default whenever the Pallas backend is active; POULPY_TPU_FUSED=0
    falls back to the stage-by-stage kernels.
    """
    if os.environ.get("POULPY_TPU_FUSED") == "0":
        return False
    return use_pallas()


@functools.lru_cache(maxsize=1)
def use_fused_mxu() -> bool:
    """MXU-transform mega-kernels (pallas_fused_mxu.py): the four-step
    matmul NTTs fused into the same single-kernel pipeline so the transform
    FLOPs run on the systolic array.  Opt-in (POULPY_TPU_FUSED_MXU=1):
    measured 27.4k ext-products/s at the N=2048 headline config vs 51k+ for
    the VPU mega-kernel — the digitize/assemble/transpose epilogues around
    each int8 matmul stage outweigh the systolic transform gain at P=2
    primes (BENCH_NOTES.md 2026-08-19)."""
    return os.environ.get("POULPY_TPU_FUSED_MXU") == "1"
