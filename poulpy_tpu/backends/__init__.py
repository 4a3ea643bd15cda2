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
