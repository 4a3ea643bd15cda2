"""Single-kernel MXU mega-pipeline: four-step matmul NTTs fused with the
VMP, Garner, and normalization tail.

Round-1 measurements (BENCH_NOTES.md) showed the four-step MXU transforms
(pallas_mxu.py) lose end-to-end because the four separate kernels pay three
inter-stage HBM round trips.  This kernel is the roadmap follow-up: the
COMPLETE gadget product per batch tile in one Pallas kernel,

  limbs ──digitize──► int8 planes ──MXU dot UA──► assemble/REDC²
        ──⊙ twiddle──digitize──► MXU dot V0──► σ-order residues   (forward)
  ──VPU VMP (σ-order pmat) [+ X^a rotate − id per block]──►       (product)
  ──MXU dot WA──► assemble ──⊙ twiddle──► MXU dot W0──►           (inverse)
  ──Garner → centering → (+acc | +small) → normalize──►           (tail)

so the transform FLOPs run on the systolic array (int8 digit matmuls,
PAPERS.md arXiv 2606.19866) while intermediates never leave VMEM.  The VMP
stays on the VPU: it is a per-lane contraction over only cols·rmax terms —
MXU-shaped batching over the N lanes would need [N, T, K]×[N, K, M]
micro-matmuls far below systolic efficiency.

Mosaic layout rule: reshapes inside the kernel may only reorganize leading
(non-lane) axes, so every tensor keeps the four-step factorization
N = n2·n1 as explicit trailing axes `[..., n2, n1]` for the whole kernel;
the flat [..., N] views exist only host-side in the wrappers.

Bit-exactness: every step is the same exact integer computation as the jnp
reference pipeline (same Montgomery constants, same Garner recurrence, same
window/carry schedule); the NTT domain differs from hal.ntt only by the σ
position relabeling (mxu_ntt4.sigma_from_hal), which cancels between the
forward transform, the σ-permuted prepared operands, and the inverse.
Verified limb-for-limb in tests/test_fused_mxu.py.

Preconditions (same as pallas_fused.fused_glwe_product):
  * res_base2k + ceil(log2(psize + 1)) ≤ 31 and res_base2k ≤ 26;
  * dsize == 1;
  * input limbs int32-range (digitized into 4 balanced base-256 planes —
    unlike the VPU mega-kernel there is no 2^29 magnitude precondition).

Reference parity: the fused hot region of SURVEY.md §3.2
(vec_znx_dft_apply → vmp_apply_dft_to_dft → vec_znx_idft_apply_consume →
vec_znx_big_normalize, poulpy-cpu-ref/src/reference/fft64/{vec_znx_dft.rs:
160, vmp.rs:144, vec_znx_big.rs:241}) and the block-binary CGGI step
(poulpy-bin-fhe/src/blind_rotation/algorithms/cggi/algorithm.rs:275-368).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split, sigma_from_hal
from poulpy_tpu.backends.pallas_fused import (
    _add64,
    _pick_tile,
    fused_supported,
    garner_center_pairs,
    normalize_windows,
    pm_kernel_layout,
)
from poulpy_tpu.backends.pallas_mxu import (
    _assemble_redc,
    _digit_planes,
    _dot8_digits,
    _host_tables_mxu,
)
from poulpy_tpu.backends.pallas_ntt import _add_mod, _sub_mod, mont_mul_i32
from poulpy_tpu.hal.module import Module
from poulpy_tpu.hal.primes import R


def _fwd_rows(x, ua_ref, v0_ref, tf_ref, primes, qinvs, nd_in, n1, n2):
    """[rows, n2, n1] i32 limbs → per-prime σ-order residues
    (list of [rows, n2(k2), n1(k1)]).

    The digit planes of the input are shared across primes (computed once).
    """
    rows = x.shape[0]
    xt = jnp.swapaxes(x, 1, 2)                           # [rows, n1, n2]
    planes = _digit_planes(xt, nd_in)
    lhs_a = jnp.concatenate(planes, axis=-1).reshape(rows * n1, nd_in * n2)
    out = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        # split dots per digit block — NOT one dot + lane slices
        # (Mosaic miscompile, see _dot8_digits)
        pas = [t.reshape(rows, n1, n2)
               for t in _dot8_digits(lhs_a, ua_ref[pi, : nd_in * n2], n2)]
        a = _assemble_redc(*pas, p, qinv)                # [rows, n1, k2]
        a = mont_mul_i32(a, tf_ref[pi][None], p, qinv)
        at = jnp.swapaxes(a, 1, 2)                       # [rows, k2, n1]
        pl_b = _digit_planes(at, NDIG)
        lhs_b = jnp.concatenate(pl_b, axis=-1).reshape(rows * n2, NDIG * n1)
        pbs = [t.reshape(rows, n2, n1)
               for t in _dot8_digits(lhs_b, v0_ref[pi], n1)]
        out.append(_assemble_redc(*pbs, p, qinv))        # [rows, k2, k1]
    return out


def _inv_rows(y, pi, wa_ref, w0_ref, ti_ref, p, qinv, n1, n2):
    """[rows, n2(k2), n1(k1)] σ-order residues of prime pi → coefficient
    residues [rows, n2, n1]."""
    rows = y.shape[0]
    planes = _digit_planes(y, NDIG)
    lhs_a = jnp.concatenate(planes, axis=-1).reshape(rows * n2, NDIG * n1)
    pas = [t.reshape(rows, n2, n1)
           for t in _dot8_digits(lhs_a, wa_ref[pi], n1)]
    b = _assemble_redc(*pas, p, qinv)                    # [rows, k2, n1]
    bt = jnp.swapaxes(b, 1, 2)                           # [rows, n1, k2]
    bt = mont_mul_i32(bt, ti_ref[pi][None], p, qinv)
    pl_b = _digit_planes(bt, NDIG)
    lhs_b = jnp.concatenate(pl_b, axis=-1).reshape(rows * n1, NDIG * n2)
    pbs = [t.reshape(rows, n1, n2)
           for t in _dot8_digits(lhs_b, w0_ref[pi], n2)]
    xx = _assemble_redc(*pbs, p, qinv)                   # [rows, n1, n2]
    return jnp.swapaxes(xx, 1, 2)                        # [rows, n2, n1]


def _kernel_pipe_mxu(n, n1, n2, primes, qinvs, basis,
                     t_tile, cols, size_a, rmax, co, psize,
                     res_size, kr, ka, offset, block, rotate, add_acc,
                     s_size, nd_in, *refs):
    it = iter(refs)
    a_ref = next(it)
    ua_ref = next(it)
    v0_ref = next(it)
    tf_ref = next(it)
    wa_ref = next(it)
    w0_ref = next(it)
    ti_ref = next(it)
    pm_ref = next(it)
    xp_ref = next(it) if rotate else None
    sm_ref = next(it) if s_size else None
    o_ref = next(it)

    kk = cols * rmax
    mdim = co * psize
    x = a_ref[...]                      # [T·cols·size_a, n2, n1] small limbs
    if size_a == rmax:
        xf = x
    else:
        xf = x.reshape(t_tile, cols, size_a, n2, n1)[:, :, :rmax].reshape(
            t_tile * kk, n2, n1
        )

    rs = _fwd_rows(xf, ua_ref, v0_ref, tf_ref, primes, qinvs, nd_in, n1, n2)

    ys = []
    for pi, p in enumerate(primes):
        qinv = qinvs[pi]
        r4 = rs[pi].reshape(t_tile, kk, n2, n1)
        add = None
        for bi in range(block):
            acc = None
            for k in range(kk):
                term = mont_mul_i32(
                    r4[:, k][:, None], pm_ref[pi, bi * kk + k][None],
                    p, qinv,
                )                       # [T, M, n2, n1]
                acc = term if acc is None else _add_mod(acc, term, p)
            if rotate:
                xp = xp_ref[pi, bi]     # [T, n2, n1] Mont NTT(X^{a_i}−1) (σ)
                acc = mont_mul_i32(acc, xp[:, None], p, qinv)
            add = acc if add is None else _add_mod(add, acc, p)
        y = add.reshape(t_tile * mdim, n2, n1)
        ys.append(_inv_rows(y, pi, wa_ref, w0_ref, ti_ref, p, qinv, n1, n2))

    hi, lo = garner_center_pairs(ys, primes, qinvs, basis)
    hi = hi.reshape(t_tile, co, psize, n2, n1)
    lo = lo.reshape(t_tile, co, psize, n2, n1)
    his = [[hi[:, c, j] for j in range(psize)] for c in range(co)]
    los = [[lo[:, c, j] for j in range(psize)] for c in range(co)]

    if add_acc:
        x5 = x.reshape(t_tile, cols, size_a, n2, n1)
        for c in range(min(cols, co)):
            for j in range(min(size_a, psize)):
                sj = x5[:, c, j]
                his[c][j], los[c][j] = _add64(his[c][j], los[c][j],
                                              sj >> 31, sj)
    if s_size:
        sm = sm_ref[...].reshape(t_tile, s_size, n2, n1)
        for j in range(min(s_size, psize)):
            sj = sm[:, j]
            his[0][j], los[0][j] = _add64(his[0][j], los[0][j], sj >> 31, sj)

    out_rows = []
    for c in range(co):
        out_rows.extend(
            normalize_windows(his[c], los[c], psize, res_size, kr, ka, offset)
        )
    o_ref[...] = jnp.stack(out_rows, axis=1).reshape(
        t_tile * co * res_size, n2, n1
    )


@functools.lru_cache(maxsize=None)
def _pipe_mxu_fn(n: int, primes: tuple, t_tile: int, cols: int, size_a: int,
                 rmax: int, co: int, psize: int, res_size: int, kr: int,
                 ka: int, offset: int, block: int, rotate: bool, s_size: int,
                 add_acc: bool, nd_in: int):
    n1, n2 = _split(n)
    P = len(primes)
    kk = cols * rmax
    mdim = co * psize
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    tabs = _host_tables_mxu(primes, n)
    from poulpy_tpu.hal.primes import PrimeBasis

    basis = PrimeBasis(primes)
    kernel = functools.partial(
        _kernel_pipe_mxu, n, n1, n2, primes, qinvs, basis,
        t_tile, cols, size_a, rmax, co, psize,
        res_size, kr, ka, offset, block, rotate, add_acc, s_size, nd_in,
    )
    rows_a = cols * size_a

    def fn(a, pm, xp=None, sm=None):
        # a:  [Bp·cols·size_a, n2, n1] i32 limbs
        # pm: [P, block·KK, M, n2, n1] i32 σ-order Montgomery
        # xp: [P, block, Bp, n2, n1] i32 σ-order; sm: [Bp·s_size, n2, n1]
        bp = a.shape[0] // rows_a
        grid = (bp // t_tile,)
        in_specs = [
            pl.BlockSpec((t_tile * rows_a, n2, n1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NDIG * n2, NDIG * n2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NDIG * n1, NDIG * n1), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, n1, n2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NDIG * n1, NDIG * n1), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, NDIG * n2, NDIG * n2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, n1, n2), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, block * kk, mdim, n2, n1),
                         lambda bi: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [
            a,
            jnp.asarray(tabs["ua"]), jnp.asarray(tabs["v0"]),
            jnp.asarray(tabs["tf"]),
            jnp.asarray(tabs["wa"]), jnp.asarray(tabs["w0"]),
            jnp.asarray(tabs["ti"]),
            pm,
        ]
        if rotate:
            in_specs.append(
                pl.BlockSpec((P, block, t_tile, n2, n1),
                             lambda bi: (0, 0, bi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(xp)
        if s_size:
            in_specs.append(
                pl.BlockSpec((t_tile * s_size, n2, n1),
                             lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            args.append(sm)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (t_tile * co * res_size, n2, n1), lambda bi: (bi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (bp * co * res_size, n2, n1), jnp.int32
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(*args)

    return fn


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------

def fused_mxu_supported(module: Module, psize: int, res_base2k: int) -> bool:
    """Static validity: kernel-B window arithmetic + a four-step split with
    a lane-sized N1 (n ≥ 256 keeps both matmul stages MXU-shaped)."""
    return fused_supported(module, psize, res_base2k) and module.n >= 256


def _sigma_perm(module: Module):
    return sigma_from_hal(module.basis.primes, module.n)


def fused_mxu_glwe_product(
    module: Module,
    a_data,                  # [..., ci, size_a, N] i64 limbs (i32 range)
    pmat,                    # [rows, ci, co, psize, P, N] Montgomery
    res_size: int,
    res_base2k: int,
    pm_base2k: int,
    small=None,              # [..., s_size, N] i64 body to add at col 0
    t_tile: int = 8,
):
    """MXU-transform twin of pallas_fused.fused_glwe_product (same contract,
    bit-exact same outputs)."""
    n = module.n
    P = module.nprimes
    n1, n2 = _split(n)
    rows, ci, co, psize = pmat.shape[:4]
    lead = a_data.shape[:-3]
    a_size = a_data.shape[-2]
    rmax = min(rows, a_size)
    assert fused_mxu_supported(module, psize, res_base2k)

    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = _pick_tile(n, P, ci, rmax, rmax, co, psize, 1, b_tot, t_tile)
    a32 = a_data[..., :rmax, :].reshape(b_tot, ci * rmax, n).astype(jnp.int32)
    pad = (-b_tot) % t_tile
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0), (0, 0)))
    bp = b_tot + pad

    pi_sigma = jnp.asarray(_sigma_perm(module))
    pm = pm_kernel_layout(pmat[..., pi_sigma], rmax)      # [P, KK, M, N]
    pm = pm.reshape(P, ci * rmax, co * psize, n2, n1)

    s_size = 0
    sm = None
    if small is not None:
        s_size = small.shape[-2]
        sm = small.reshape(b_tot, s_size, n).astype(jnp.int32)
        if pad:
            sm = jnp.pad(sm, ((0, pad), (0, 0), (0, 0)))
        sm = sm.reshape(bp * s_size, n2, n1)

    out = _pipe_mxu_fn(
        n, module.basis.primes, t_tile, ci, rmax, rmax, co, psize,
        res_size, res_base2k, pm_base2k, 0, 1, False, s_size, False, NDIG,
    )(a32.reshape(bp * ci * rmax, n2, n1), pm, sm=sm)

    out = out.reshape(bp, co, res_size, n)[:b_tot]
    return out.reshape(lead + (co, res_size, n)).astype(jnp.int64)


def fused_mxu_br_block_step(
    module: Module,
    acc,                     # [..., cols, size, N] i64 normalized
    pm_k,                    # [P, block, KK, M, N] i32 σ-order kernel pmats
    xp,                      # [..., block, P, N] Montgomery NTT(X^a) σ-order
    res_size: int,
    base2k: int,
    t_tile: int = 8,
):
    """MXU-transform twin of pallas_fused.fused_br_block_step; pm_k and xp
    must already be in σ order (prepared once per key / x-power table)."""
    n = module.n
    P = module.nprimes
    n1, n2 = _split(n)
    block = pm_k.shape[1]
    lead = acc.shape[:-3]
    cols, size_a = acc.shape[-3], acc.shape[-2]
    kk, mdim = pm_k.shape[2], pm_k.shape[3]
    rmax = kk // cols
    psize = mdim // cols
    assert fused_mxu_supported(module, psize, base2k)

    b_tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
    t_tile = _pick_tile(n, P, cols, size_a, rmax, cols, psize, block,
                        b_tot, t_tile)
    a32 = acc.reshape(b_tot, cols * size_a, n).astype(jnp.int32)
    xp32 = xp.reshape(b_tot, block, P, n).astype(jnp.int32)
    xp32 = jnp.transpose(xp32, (2, 1, 0, 3))      # [P, block, B, N]
    pad = (-b_tot) % t_tile
    if pad:
        a32 = jnp.pad(a32, ((0, pad), (0, 0), (0, 0)))
        xp32 = jnp.pad(xp32, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bp = b_tot + pad

    out = _pipe_mxu_fn(
        n, module.basis.primes, t_tile, cols, size_a, rmax, cols, psize,
        res_size, base2k, base2k, 0, block, True, 0, True, NDIG,
    )(
        a32.reshape(bp * cols * size_a, n2, n1),
        pm_k.reshape(P, block * kk, mdim, n2, n1),
        xp=xp32.reshape(P, block, bp, n2, n1),
    )

    out = out.reshape(bp, cols, res_size, n)[:b_tot]
    return out.reshape(lead + (cols, res_size, n)).astype(jnp.int64)
