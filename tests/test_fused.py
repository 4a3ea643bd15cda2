"""Fused mega-kernel equivalence vs the jnp reference backend.

Same cross-backend contract as tests/test_pallas.py: the fused Pallas
pipeline (backends/pallas_fused.py) must reproduce the stage-by-stage jnp
path bit-exactly — the cross_backend_test_suite analogue
(poulpy-hal/src/test_suite/mod.rs:35-95) for the fused external product /
keyswitch kernels.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from poulpy_tpu.backends import pallas_fused as pf
from poulpy_tpu.hal import dft
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.normalization import vec_znx_normalize_full
from poulpy_tpu.hal.ntt import garner_lift

RNG = np.random.default_rng(7)


def _rand_residues(basis, shape):
    """Random standard-form residues [..., P, N]."""
    out = np.zeros(shape, dtype=np.int64)
    for i, p in enumerate(basis.primes):
        out[..., i, :] = RNG.integers(0, p, size=shape[:-2] + shape[-1:])
    return jnp.asarray(out)


def _rand_mont(basis, shape):
    """Random Montgomery-form prepared values (any residue is valid)."""
    return _rand_residues(basis, shape)


@pytest.mark.parametrize("nprimes", [2, 4])
@pytest.mark.parametrize(
    "psize,res_size,kr,ka,offset,s_size",
    [
        (4, 3, 17, 17, 0, 0),
        (4, 3, 17, 17, 0, 3),
        (3, 5, 13, 19, 0, 0),
        (2, 2, 17, 17, -5, 0),
        (5, 2, 21, 17, 4, 2),
    ],
)
def test_garner_normalize_kernel(nprimes, psize, res_size, kr, ka, offset, s_size):
    n = 128
    m = get_module(n, nprimes)
    P = nprimes
    bq = 5
    x = _rand_residues(m.basis, (bq, psize, P, n))
    # jnp reference path
    big = garner_lift(m.tables, x)                       # [bq, psize, n] i64
    sm = None
    if s_size:
        sm = jnp.asarray(
            RNG.integers(-(2**20), 2**20, size=(bq, s_size, n), dtype=np.int64)
        )
        upto = min(s_size, psize)
        big = big.at[..., :upto, :].add(sm[..., :upto, :])
    want = vec_znx_normalize_full(res_size, kr, offset, big, ka)

    # fused kernel B: input [P, bq·psize, N] i32
    xk = jnp.moveaxis(x, -2, 0).reshape(P, bq * psize, n).astype(jnp.int32)
    fn = pf._kernel_b_fn(
        n, m.basis.primes, psize, s_size, res_size, kr, ka, offset, tb=1
    )
    with pltpu.force_tpu_interpret_mode():
        if s_size:
            have = fn(xk, sm.reshape(bq * s_size, n).astype(jnp.int32))
        else:
            have = fn(xk)
    have = have.reshape(bq, res_size, n).astype(jnp.int64)
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.parametrize(
    "nprimes,prime_bits",
    [
        (2, 30),
        pytest.param(4, 30, marks=pytest.mark.slow),
        (2, 28),
    ],
)
@pytest.mark.parametrize(
    "ci,co,rows,size_a,psize,batch",
    [
        (2, 2, 3, 3, 4, 4),     # rank-1 external product (bench config shape)
        pytest.param(1, 2, 4, 4, 4, 3, marks=pytest.mark.slow),  # ks mask
        pytest.param(3, 3, 2, 3, 3, 1, marks=pytest.mark.slow),  # rank-2
        pytest.param(2, 2, 4, 3, 4, 5, marks=pytest.mark.slow),  # rows>a
    ],
)
def test_fused_glwe_product_matches_jnp(nprimes, prime_bits, ci, co, rows,
                                        size_a, psize, batch):
    # prime_bits=28 exercises the lazy-reduction VMP/NTT fast path
    n = 128
    m = get_module(n, nprimes, prime_bits)
    P = nprimes
    kr, ka = 17, 17
    res_size = 3
    a = jnp.asarray(
        RNG.integers(-(2**26), 2**26, size=(batch, ci, size_a, n), dtype=np.int64)
    )
    pmat = _rand_mont(m.basis, (rows, ci, co, psize, P, n))

    # jnp reference pipeline (dft → vmp → idft → normalize)
    a_dft = dft.dft_apply(m, a)
    res_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, res_dft)
    want = dft.big_normalize(m, res_size, kr, big, ka)

    with pltpu.force_tpu_interpret_mode():
        have = pf.fused_glwe_product(m, a, pmat, res_size, kr, ka, t_tile=2)
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.parametrize("prime_bits", [30, 28])
@pytest.mark.parametrize(
    "dsize,rows,size_a",
    [
        (2, 3, 6),
        pytest.param(2, 3, 5, marks=pytest.mark.slow),
        pytest.param(3, 2, 6, marks=pytest.mark.slow),
        pytest.param(2, 4, 3, marks=pytest.mark.slow),
    ],
)
def test_fused_glwe_product_dsize_matches_jnp(prime_bits, dsize, rows,
                                              size_a):
    """dsize > 1 grouped-limb product: the host-side pm_kernel_layout_dsize
    rearrangement must reproduce the (step, offset) subsampled
    vmp-with-limb_offset accumulation exactly."""
    n = 128
    m = get_module(n, 2, prime_bits)
    P, ci, co, psize, batch = 2, 2, 2, 4, 3
    kr = 17
    res_size = 3
    a = jnp.asarray(
        RNG.integers(-(2**26), 2**26, size=(batch, ci, size_a, n),
                     dtype=np.int64)
    )
    pmat = _rand_mont(m.basis, (rows, ci, co, psize, P, n))

    # jnp reference: per-digit subsampled VMP accumulation
    a_dft = dft.dft_apply(m, a)
    res_dft = None
    for di in range(dsize):
        ai_size = min((size_a + di) // dsize, rows)
        if ai_size == 0:
            continue
        ai = dft.dft_copy(a_dft, step=dsize, offset=dsize - 1 - di,
                          res_size=ai_size)
        part = dft.vmp_apply(m, ai, pmat, limb_offset=di)
        res_dft = part if res_dft is None else dft.dft_add(m, res_dft, part)
    big = dft.idft_apply(m, res_dft)
    want = dft.big_normalize(m, res_size, kr, big, kr)

    with pltpu.force_tpu_interpret_mode():
        have = pf.fused_glwe_product(
            m, a, pmat, res_size, kr, kr, t_tile=2, dsize=dsize
        )
    assert np.array_equal(np.asarray(have), np.asarray(want))


def test_fused_keyswitch_small_add_matches_jnp():
    n = 128
    m = get_module(n, 2)
    P, ci, co, rows, size_a, psize, batch = 2, 1, 2, 3, 3, 4, 3
    kr = 17
    res_size = 3
    a = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, ci, size_a, n), dtype=np.int64)
    )
    body = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, size_a, n), dtype=np.int64)
    )
    pmat = _rand_mont(m.basis, (rows, ci, co, psize, P, n))

    a_dft = dft.dft_apply(m, a)
    res_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, res_dft)
    big = big.at[..., 0, : size_a, :].add(body)
    want = dft.big_normalize(m, res_size, kr, big, kr)

    with pltpu.force_tpu_interpret_mode():
        have = pf.fused_glwe_product(
            m, a, pmat, res_size, kr, kr, small=body, t_tile=2
        )
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.parametrize("prime_bits", [30, 28])
@pytest.mark.parametrize(
    "s64_size", [4, pytest.param(7, marks=pytest.mark.slow)]
)
def test_fused_product_small64_matches_jnp(prime_bits, s64_size):
    """Per-column 64-bit add terms (tensor-relinearize linear parts): the
    fused kernel must reproduce idft → per-column aligned big add →
    big_normalize exactly, including s64 limb counts LONGER than the
    product's psize."""
    n = 128
    m = get_module(n, 2, prime_bits)
    P, ci, co, rows, size_a, psize, batch = 2, 1, 2, 3, 3, 4, 3
    kr = 17
    res_size = 6
    a = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, ci, size_a, n),
                     dtype=np.int64)
    )
    big64 = jnp.asarray(
        RNG.integers(-(2**48), 2**48, size=(batch, co, s64_size, n),
                     dtype=np.int64)
    )
    pmat = _rand_mont(m.basis, (rows, ci, co, psize, P, n))

    a_dft = dft.dft_apply(m, a)
    res_dft = dft.vmp_apply(m, a_dft, pmat)
    big = dft.idft_apply(m, res_dft)          # [batch, co, psize, n]
    mx = max(psize, s64_size)
    cols = []
    for c in range(co):
        col, add = dft._align_limbs(
            big[..., c, :, :], big64[..., c, :, :], mx, limb_axis=-2
        )
        cols.append(col + add)
    want = dft.big_normalize(m, res_size, kr, jnp.stack(cols, axis=-3), kr)

    with pltpu.force_tpu_interpret_mode():
        have = pf.fused_glwe_product(
            m, a, pmat, res_size, kr, kr, t_tile=2, small64=big64
        )
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.parametrize(
    "nprimes,prime_bits,batch",
    [
        (2, 30, 3),
        pytest.param(4, 30, 1, marks=pytest.mark.slow),
        pytest.param(2, 28, 3, marks=pytest.mark.slow),
    ],
)
@pytest.mark.parametrize("rot_mode", [0, 1, 2])
def test_fused_br_block_step_matches_jnp(nprimes, prime_bits, batch,
                                         rot_mode):
    """One fused block-binary CGGI step vs the stage-by-stage jnp math
    (blind_rotation_execute_block's block_step, algorithm.rs:275-368)."""
    from poulpy_tpu.backends.pallas_fused import (
        fused_br_block_step,
        pm_kernel_layout,
    )
    from poulpy_tpu.backends.pallas_ntt import lazy_ok
    from poulpy_tpu.binfhe.blind_rotation import (
        _xpow_minus1_shoup_table,
        _xpow_minus1_table,
        _xpow_table,
    )
    from poulpy_tpu.hal.ntt import mont_mul

    n = 128
    m = get_module(n, nprimes, prime_bits)
    if rot_mode and not lazy_ok(m.basis.primes):
        pytest.skip("input-side rotate needs lazy primes")
    P = nprimes
    base2k, cols, size, rows, psize, block = 17, 2, 3, 3, 4, 4
    t = m.tables
    acc = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, cols, size, n),
                     dtype=np.int64)
    )
    pmats = _rand_mont(m.basis, (block, rows, cols, cols, psize, P, n))
    a_vals = jnp.asarray(
        RNG.integers(0, 2 * n, size=(batch, block), dtype=np.int64)
    )
    with pltpu.force_tpu_interpret_mode():
        xpow = _xpow_table(n, m.basis.primes)

        # jnp reference block step
        acc_dft = dft.dft_apply(m, acc)
        add_dft = None
        for i in range(block):
            vmp = dft.vmp_apply(m, acc_dft, pmats[i])
            xp = jnp.take(xpow, a_vals[:, i], axis=0)      # [batch, P, N]
            rot = mont_mul(vmp, xp[:, None, None], t.p[:, None],
                           t.qinv[:, None])
            term = dft.dft_sub(m, rot, vmp)
            add_dft = term if add_dft is None else dft.dft_add(m, add_dft, term)
        big = dft.idft_apply(m, add_dft)
        big = big + dft._align_limbs(acc, big, big.shape[-2], limb_axis=-2)[0]
        want = dft.big_normalize(m, size, base2k, big, base2k)

        # fused kernel
        rmax = min(rows, size)
        pm_k = jnp.swapaxes(pm_kernel_layout(pmats, rmax), 0, 1)
        if rot_mode == 1:
            xpm1 = _xpow_minus1_shoup_table(n, m.basis.primes)
        else:
            xpm1 = _xpow_minus1_table(n, m.basis.primes)
        xp_in = jnp.take(xpm1, a_vals, axis=0).astype(jnp.int32)
        have = fused_br_block_step(m, acc, pm_k, xp_in, size, base2k,
                                   t_tile=2, rot_mode=rot_mode)
    assert np.array_equal(np.asarray(have), np.asarray(want))


def test_fused_crypto_roundtrip():
    """End-to-end: fused external product on a real encrypted GGSW selector
    decrypts to the same plaintext as the unfused path (bit-exact cts)."""
    from poulpy_tpu.core.encryption import (
        ggsw_encrypt_sk,
        glwe_encrypt_sk,
        secret_new,
    )
    from poulpy_tpu.core.layouts import GLWEPlaintext
    from poulpy_tpu.core.prepared import ggsw_prepare, glwe_secret_prepare
    from poulpy_tpu.hal import vec_znx
    from poulpy_tpu.hal.source import Source

    n = 128
    m = get_module(n, 2)
    base2k, k_ct, k_ggsw, dnum = 17, 51, 68, 3
    sk = secret_new(m, rank=1, source=Source(b"\x0b" * 32), dist="ternary_prob")
    skp = glwe_secret_prepare(m, sk)
    msg = jnp.asarray(RNG.integers(-(2**15), 2**15, size=n, dtype=np.int64))
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(base2k, 34, 3, msg), base2k=base2k, k=34
    )
    ct = glwe_encrypt_sk(m, pt, skp, base2k, k_ct, Source(b"\x01" * 32), Source(b"\x02" * 32))
    ggsw = ggsw_encrypt_sk(
        m, jnp.zeros((n,), jnp.int64).at[0].set(1), skp,
        base2k, k_ggsw, dnum, Source(b"\x03" * 32), Source(b"\x04" * 32),
    )
    ggsw_p = ggsw_prepare(m, ggsw)

    from poulpy_tpu.core.external_product import glwe_external_product

    want = glwe_external_product(m, ct, ggsw_p)  # jnp path (CPU dispatch)
    with pltpu.force_tpu_interpret_mode():
        have = pf.fused_glwe_product(
            m, ct.data, ggsw_p.pmat, want.size, base2k, base2k, t_tile=2
        )
    assert np.array_equal(np.asarray(have), np.asarray(want.data))


@pytest.mark.parametrize(
    "prime_bits", [pytest.param(30, marks=pytest.mark.slow), 28]
)
def test_tensor_relinearize_fused_matches_jnp(monkeypatch, prime_bits):
    """The rank-1 relinearize fast path must reproduce the stage-by-stage
    jnp path bit-exactly — prime_bits=28 routes the tensor product through
    the fused tensor kernel, 30 through the jnp conv + fused relinearize."""
    from poulpy_tpu import backends
    from poulpy_tpu.core import encryption as enc
    from poulpy_tpu.core.layouts import GLWEPlaintext
    from poulpy_tpu.core.operations import glwe_tensor_relinearize
    from poulpy_tpu.core.prepared import (
        glwe_secret_prepare,
        glwe_tensor_key_prepare,
    )
    from poulpy_tpu.hal import vec_znx
    from poulpy_tpu.hal.source import Source

    n, base2k = 128, 17
    m = get_module(n, 2, prime_bits)
    sk = enc.secret_new(m, 1, Source(b"\x21" * 32))
    skp = glwe_secret_prepare(m, sk)
    xe, xa = Source(b"\x22" * 32), Source(b"\x23" * 32)
    data = RNG.integers(-(2**12), 2**12, size=n, dtype=np.int64)
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(base2k, 30, 3, jnp.asarray(data)),
        base2k=base2k, k=30,
    )
    ct = enc.glwe_encrypt_sk(m, pt, skp, base2k, 51, xe, xa)
    tk = glwe_tensor_key_prepare(
        m, enc.glwe_tensor_key_encrypt_sk(m, sk, skp, base2k, 68, 4, xe, xa)
    )

    want = glwe_tensor_relinearize(m, ct, ct, tk)       # jnp path (CPU)

    monkeypatch.setattr(backends, "use_fused", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        have = glwe_tensor_relinearize(m, ct, ct, tk)
    assert have.base2k == want.base2k and have.k == want.k
    assert np.array_equal(np.asarray(have.data), np.asarray(want.data))


def test_fused_tensor_product_matches_jnp():
    """Rank-1 fused tensor product vs glwe_tensor_product_big: quad digits
    and 64-bit linear terms must match the jnp path exactly."""
    from poulpy_tpu.core import encryption as enc
    from poulpy_tpu.core.layouts import GLWEPlaintext
    from poulpy_tpu.core.operations import glwe_tensor_product_big
    from poulpy_tpu.core.prepared import glwe_secret_prepare
    from poulpy_tpu.hal import vec_znx
    from poulpy_tpu.hal.source import Source

    n, base2k = 128, 17
    m = get_module(n, 2, 28)         # lazy primes (kernel precondition)
    sk = enc.secret_new(m, 1, Source(b"\x31" * 32))
    skp = glwe_secret_prepare(m, sk)
    xe, xa = Source(b"\x32" * 32), Source(b"\x33" * 32)
    data = RNG.integers(-(2**12), 2**12, size=(2, n), dtype=np.int64)
    cts = []
    for i in range(2):
        pt = GLWEPlaintext(
            data=vec_znx.encode_vec_i64(base2k, 30, 3, jnp.asarray(data[i])),
            base2k=base2k, k=30,
        )
        cts.append(enc.glwe_encrypt_sk(m, pt, skp, base2k, 51, xe, xa))
    a, b = cts
    conv_size = a.size + b.size - 1
    dnum = 4

    lin, quad = glwe_tensor_product_big(m, a, b, conv_size)
    d_want = dft.big_normalize(m, dnum, base2k, quad[(0, 0)], base2k)
    lin_want = jnp.stack(lin, axis=-3)

    with pltpu.force_tpu_interpret_mode():
        d_have, lin_have = pf.fused_tensor_product(
            m, a.data, b.data, conv_size, dnum, base2k, base2k, t_tile=1
        )
    assert np.array_equal(np.asarray(d_have), np.asarray(d_want))
    assert np.array_equal(np.asarray(lin_have), np.asarray(lin_want))


@pytest.mark.parametrize("rot_mode", [0, 1, 2])
def test_fused_br_block_two_steps_matches_sequential(rot_mode):
    """steps=2 (two whole block steps chained in ONE kernel launch, acc
    held in VMEM) must equal two sequential single-step launches."""
    from poulpy_tpu.backends.pallas_fused import (
        fused_br_block_step,
        pm_kernel_layout,
    )
    from poulpy_tpu.binfhe.blind_rotation import (
        _xpow_minus1_shoup_table,
        _xpow_minus1_table,
    )

    n = 128
    m = get_module(n, 2, 28)
    P = 2
    base2k, cols, size, rows, psize, block, batch = 17, 2, 3, 3, 4, 4, 3
    acc = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, cols, size, n),
                     dtype=np.int64)
    )
    pmats = _rand_mont(m.basis, (2, block, rows, cols, cols, psize, P, n))
    a_vals = jnp.asarray(
        RNG.integers(0, 2 * n, size=(batch, 2, block), dtype=np.int64)
    )
    rmax = min(rows, size)
    tab = (_xpow_minus1_shoup_table if rot_mode == 1
           else _xpow_minus1_table)(n, m.basis.primes)
    with pltpu.force_tpu_interpret_mode():
        # sequential reference: two single-step launches
        want = acc
        for st in range(2):
            pm_k = jnp.swapaxes(pm_kernel_layout(pmats[st], rmax), 0, 1)
            xp = jnp.take(tab, a_vals[:, st], axis=0).astype(jnp.int32)
            want = fused_br_block_step(m, want, pm_k, xp, size, base2k,
                                       t_tile=1, rot_mode=rot_mode)
        # chained: one launch, steps=2
        pm2 = pm_kernel_layout(
            pmats.reshape((2 * block,) + pmats.shape[2:]), rmax
        )
        pm2 = jnp.swapaxes(pm2, 0, 1)       # [P, 2·block, KK, M, N]
        xp2 = jnp.take(
            tab, a_vals.reshape(batch, 2 * block), axis=0
        ).astype(jnp.int32)
        have = fused_br_block_step(m, acc, pm2, xp2, size, base2k,
                                   t_tile=1, rot_mode=rot_mode, steps=2)
    assert np.array_equal(np.asarray(have), np.asarray(want))


def test_fused_br_block16_matches_jnp():
    """block=16 kernel-shape generalization (the --blocks sweep configs):
    the fused step must stay bit-exact vs the jnp math when the per-launch
    pmat carries 16 block elements (4x the tested-everywhere block=4)."""
    from poulpy_tpu.backends.pallas_fused import (
        fused_br_block_step,
        pm_kernel_layout,
    )
    from poulpy_tpu.binfhe.blind_rotation import (
        _xpow_minus1_table,
        _xpow_table,
    )
    from poulpy_tpu.hal.ntt import mont_mul

    n = 128
    m = get_module(n, 2, 28)
    P = 2
    base2k, cols, size, rows, psize, block, batch = 17, 2, 2, 2, 4, 16, 2
    t = m.tables
    acc = jnp.asarray(
        RNG.integers(-(2**16), 2**16, size=(batch, cols, size, n),
                     dtype=np.int64)
    )
    pmats = _rand_mont(m.basis, (block, rows, cols, cols, psize, P, n))
    a_vals = jnp.asarray(
        RNG.integers(0, 2 * n, size=(batch, block), dtype=np.int64)
    )
    with pltpu.force_tpu_interpret_mode():
        xpow = _xpow_table(n, m.basis.primes)
        acc_dft = dft.dft_apply(m, acc)
        add_dft = None
        for i in range(block):
            vmp = dft.vmp_apply(m, acc_dft, pmats[i])
            xp = jnp.take(xpow, a_vals[:, i], axis=0)
            rot = mont_mul(vmp, xp[:, None, None], t.p[:, None],
                           t.qinv[:, None])
            term = dft.dft_sub(m, rot, vmp)
            add_dft = term if add_dft is None else dft.dft_add(m, add_dft, term)
        big = dft.idft_apply(m, add_dft)
        big = big + dft._align_limbs(acc, big, big.shape[-2], limb_axis=-2)[0]
        want = dft.big_normalize(m, size, base2k, big, base2k)

        rmax = min(rows, size)
        pm_k = jnp.swapaxes(pm_kernel_layout(pmats, rmax), 0, 1)
        xpm1 = _xpow_minus1_table(n, m.basis.primes)
        xp_in = jnp.take(xpm1, a_vals, axis=0).astype(jnp.int32)
        have = fused_br_block_step(m, acc, pm_k, xp_in, size, base2k,
                                   t_tile=2, rot_mode=2)
    assert np.array_equal(np.asarray(have), np.asarray(want))
