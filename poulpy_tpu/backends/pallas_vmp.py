"""Fused vector-matrix product (VMP) Pallas kernel.

The hot contraction of keyswitching / external products
(vmp_apply_dft_to_dft, poulpy-cpu-ref/src/reference/fft64/vmp.rs:144-264):

    res[b, m, :, :] = Σ_k a[b, k, :, :] · pm[k, m, :, :]   (mod p, per prime)

with k = (col_in, gadget_row) and m = (col_out, output_limb) flattened.
Transpose-free on the batch side: `a` is the hal's `[..., ci, r, P, N]`
tensor viewed flat; only the small prepared matrix is re-laid-out per call.
The jnp path materializes one HBM round trip per gadget row; this kernel
holds the a-tile, the whole prepared matrix and the output tile in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends.pallas_ntt import _add_mod, mont_mul_i32
from poulpy_tpu.hal.module import Module


def _vmp_kernel(kdim: int, mdim: int,
                a_ref, pm_ref, p_ref, qinv_ref, o_ref):
    # vectorize over every output column at once: each k-step is one
    # [rows, M, P·N] broadcasted Montgomery product (full-tile VPU work)
    p = p_ref[0][None, None, :]    # [1, 1, P·N]
    qinv = qinv_ref[0][None, None, :]
    a = a_ref[...]                 # [rows, K, P·N]
    pm = pm_ref[...]               # [K, M, P·N]
    rows, _, pn = a.shape
    mdim_ = pm.shape[1]

    def slab(k):
        a_k = a[:, k, :].reshape(rows, 1, pn)
        pm_k = pm[k].reshape(1, mdim_, pn)
        return mont_mul_i32(a_k, pm_k, p, qinv)

    acc = slab(0)
    for k in range(1, kdim):
        acc = _add_mod(acc, slab(k), p)
    o_ref[...] = acc


@functools.lru_cache(maxsize=None)
def _vmp_fn(n: int, primes: tuple, kdim: int, mdim: int, rows_block: int):
    from poulpy_tpu.hal.primes import R

    P = len(primes)
    pn = P * n
    p_np = np.repeat(np.array(primes, dtype=np.int32), n)[None, :]
    qinv_np = np.repeat(
        np.array([(-pow(q, -1, R)) % R for q in primes], dtype=np.int32), n
    )[None, :]
    kernel = functools.partial(_vmp_kernel, kdim, mdim)

    def fn(a, pm):  # a: [B, K, P·N] i32 ; pm: [K, M, P·N] i32
        b_tot = a.shape[0]
        grid = (pl.cdiv(b_tot, rows_block),)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (rows_block, kdim, pn),
                        lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (kdim, mdim, pn),
                        lambda bi: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec((1, pn), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, pn), lambda bi: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (rows_block, mdim, pn),
                    lambda bi: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (a.shape[0], mdim, pn), jnp.int32
                ),
                # large-N shapes exceed the 16 MiB default scoped-VMEM
                # limit (N=8192: 17.82M request, bench_sweep 2026-08-21);
                # same bump the fused mega-kernels carry
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(a, pm, jnp.asarray(p_np), jnp.asarray(qinv_np))

    return fn


def pallas_vmp_apply(
    module: Module,
    a_dft,                   # [..., cols_in, size_a, P, N]
    pmat,                    # [rows, cols_in, cols_out, psize, P, N] Montgomery
    limb_offset: int = 0,
    res_size: int | None = None,
    rows_block: int = 4,
):
    """Drop-in equivalent of hal.dft.vmp_apply (bit-exact, same layout)."""
    n = module.n
    P = module.nprimes
    rows, cols_in, cols_out, psize = pmat.shape[:4]
    a_size = a_dft.shape[-3]
    if res_size is None:
        res_size = psize
    rmax = min(rows, a_size)
    out_cols = max(0, min(psize - limb_offset, res_size))
    lead = a_dft.shape[:-4]
    if out_cols == 0 or rmax == 0:
        return jnp.zeros(lead + (cols_out, res_size, P, n), a_dft.dtype)

    kdim = cols_in * rmax
    mdim = cols_out * out_cols
    # a: [..., ci, r, P, N] → [B, ci·r, P·N] (pure reshape, no transpose)
    a = a_dft[..., :, :rmax, :, :].reshape((-1, kdim, P * n)).astype(jnp.int32)
    b_tot = a.shape[0]
    pad = (-b_tot) % rows_block
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
    # pm: [r, ci, co, j, P, N] → [(ci·r), (co·j), P·N] (small, per-call)
    pm = pmat[:rmax, :, :, limb_offset : limb_offset + out_cols]
    pm = jnp.moveaxis(pm, 0, 1).reshape((kdim, mdim, P * n)).astype(jnp.int32)

    out = _vmp_fn(n, module.basis.primes, kdim, mdim, rows_block)(a, pm)
    if pad:
        out = out[:b_tot]
    out = out.reshape(lead + (cols_out, out_cols, P, n)).astype(a_dft.dtype)
    if out_cols < res_size:
        pads = [(0, 0)] * out.ndim
        pads[-3] = (0, res_size - out_cols)
        out = jnp.pad(out, pads)
    return out
