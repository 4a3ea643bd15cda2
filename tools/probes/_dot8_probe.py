"""Minimal on-device reproducer for the MXU mega-kernel mismatch
(_mxu_crossover 2026-08-20: fused_mxu != fused VPU on the real chip while
interpret-mode tests pass).

Hypothesis ladder, each a single Pallas kernel vs an exact jnp oracle:
  1. int8 x int8 -> int32 dot_general (the _dot8 primitive itself)
  2. the digitize -> dot -> assemble/REDC^2 residue pipeline stage
Run: timeout 1700 python _dot8_probe.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)


def dot8_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def main():
    rng = np.random.default_rng(0)
    m, k, n = 256, 512, 256
    a = rng.integers(-128, 128, size=(m, k), dtype=np.int8)
    b = rng.integers(-128, 128, size=(k, n), dtype=np.int8)
    want = a.astype(np.int64) @ b.astype(np.int64)

    with jax.enable_x64(False):
        f = pl.pallas_call(
            dot8_kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )
        have = np.asarray(jax.block_until_ready(
            jax.jit(f)(jnp.asarray(a), jnp.asarray(b))))
    exact = np.array_equal(have, want.astype(np.int64))
    bad = int((have != want).sum())
    print(f"int8 dot_general on device: exact={exact} "
          f"mismatches={bad}/{m * n} "
          f"max_abs_err={int(np.abs(have.astype(np.int64) - want).max())}",
          flush=True)

    if exact:
        # stage 2: digitize -> dot -> assemble on a small residue block
        from poulpy_tpu.backends.pallas_mxu import (
            _assemble_redc, _digit_planes, _dot8,
        )
        from poulpy_tpu.backends.mxu_ntt import NDIG
        p = 268369921
        qinv = (-pow(p, -1, 1 << 30)) % (1 << 30)
        x = rng.integers(0, p, size=(8, 128), dtype=np.int64)
        w = rng.integers(0, p, size=(128, 128), dtype=np.int64)
        wd = np.zeros((4 * 128, NDIG * 128), dtype=np.int8)
        base = w * pow(2, 60, p) % p
        for i in range(4):
            c = (base << (8 * i)) % p
            c = np.where(c > p // 2, c - p, c)
            for d in range(NDIG):
                dd = ((c + 128) & 255) - 128
                wd[i * 128:(i + 1) * 128, d * 128:(d + 1) * 128] = \
                    dd.astype(np.int8)
                c = (c - dd) >> 8

        def stage_kernel(x_ref, w_ref, o_ref):
            planes = _digit_planes(x_ref[...], 4)
            lhs = jnp.concatenate(planes, axis=-1)
            pa = _dot8(lhs, w_ref[...])
            pas = [pa[:, d * 128:(d + 1) * 128] for d in range(NDIG)]
            o_ref[...] = _assemble_redc(*pas, p, qinv)

        with jax.enable_x64(False):
            g = pl.pallas_call(
                stage_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )
            got = np.asarray(jax.block_until_ready(jax.jit(g)(
                jnp.asarray(x, dtype=jnp.int32), jnp.asarray(wd))))
        ref = (x @ w) % p
        # _assemble_redc folds 2^60 * 2^-60; result is canonical-ish mod p
        ok = ((got.astype(np.int64) - ref) % p == 0).all()
        print(f"digitize->dot->assemble stage: congruent mod p = {bool(ok)}",
              flush=True)


if __name__ == "__main__":
    main()
