"""Sharded-execution tests on the 8-device virtual CPU mesh: the (dp, tp)
sharded external product must match the single-device path bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poulpy_tpu.core import encryption as enc
from poulpy_tpu.core.external_product import glwe_external_product
from poulpy_tpu.core.layouts import GLWECiphertext, GLWEPlaintext, glwe_size
from poulpy_tpu.core.prepared import ggsw_prepare, glwe_secret_prepare
from poulpy_tpu.hal import vec_znx
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.source import Source
from poulpy_tpu.parallel.mesh import make_mesh
from poulpy_tpu.parallel.sharded import shard_batch, sharded_external_product_fn

BASE2K, K_CT, K_KEY = 17, 51, 68


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_external_product_matches(tp):
    m = get_module(64, 2)
    src = Source(bytes(32))
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    sk = enc.secret_new(m, 1, src)
    skp = glwe_secret_prepare(m, sk)
    batch = 8
    data = np.random.default_rng(0).integers(
        -(2**10), 2**10, size=(batch, 64), dtype=np.int64
    )
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(BASE2K, 34, 3, jnp.asarray(data)),
        base2k=BASE2K, k=34,
    )
    ct = enc.glwe_encrypt_sk(
        m, pt, skp, BASE2K, K_CT, xe, xa, batch_shape=(batch,)
    )
    ptg = np.zeros(64, dtype=np.int64)
    ptg[1] = 1
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    ggswp = ggsw_prepare(m, ggsw)

    want = glwe_external_product(m, ct, ggswp).data

    mesh = make_mesh(8, tp=tp)
    fn = sharded_external_product_fn(
        m, mesh, BASE2K, glwe_size(BASE2K, K_CT), ggswp.base2k
    )
    ct_sharded = shard_batch(mesh, ct.data)
    have = fn(ct_sharded, ggswp.pmat)
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ring_external_product_matches():
    """N split over `sp` (one transform across chips): bit-exact vs the
    single-device external product."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from poulpy_tpu.parallel.sharded import sharded_external_product_ring_fn

    n, dp, sp = 256, 2, 4
    m = get_module(n, 2)
    src = Source(bytes(32))
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    sk = enc.secret_new(m, 1, src)
    skp = glwe_secret_prepare(m, sk)
    batch = 4
    data = np.random.default_rng(0).integers(
        -(2**10), 2**10, size=(batch, n), dtype=np.int64
    )
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(BASE2K, 34, 3, jnp.asarray(data)),
        base2k=BASE2K, k=34,
    )
    ct = enc.glwe_encrypt_sk(
        m, pt, skp, BASE2K, K_CT, xe, xa, batch_shape=(batch,)
    )
    ptg = np.zeros(n, dtype=np.int64)
    ptg[1] = 1
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    ggswp = ggsw_prepare(m, ggsw)
    want = glwe_external_product(m, ct, ggswp).data

    mesh = jax.make_mesh((dp, sp), ("dp", "sp"))
    fn = sharded_external_product_ring_fn(
        m, mesh, BASE2K, glwe_size(BASE2K, K_CT), ggswp.base2k
    )
    ct_in = jax.device_put(
        ct.data, NamedSharding(mesh, P("dp", None, None, "sp"))
    )
    pm_in = jax.device_put(
        ggswp.pmat,
        NamedSharding(mesh, P(None, None, None, None, None, "sp")),
    )
    have = fn(ct_in, pm_in)
    assert np.array_equal(np.asarray(have), np.asarray(want))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_gate_bootstrap_matches():
    """dp-sharded batched NAND bootstrap == single-device, bit-exact."""
    from poulpy_tpu.binfhe import gates
    from poulpy_tpu.hal.source import Source as Src
    from poulpy_tpu.parallel.sharded import sharded_gate_bootstrap_fn

    params = gates.GateParams(
        n_glwe=64, n_lwe=16, base2k=17, k_ct=34, k_brk=68,
        dnum_brk=4, k_ksk=51, dnum_ksk=2, nprimes=4,
    )
    keys, sk = gates.keygen(params)
    xe, xa = Src(b"\x05" * 32), Src(b"\x06" * 32)
    rng = np.random.default_rng(7)
    b1 = rng.integers(0, 2, size=16)
    b2 = rng.integers(0, 2, size=16)
    c1 = gates.encrypt_bit(params, b1, sk, xe, xa)
    c2 = gates.encrypt_bit(params, b2, sk, xe, xa)

    want = gates.gate_nand(keys, c1, c2)
    assert np.array_equal(
        gates.decrypt_bit(want, sk), 1 - (b1 & b2)
    )

    mesh = make_mesh(8, tp=1)
    fn = sharded_gate_bootstrap_fn(keys, mesh, "nand")
    have = fn(shard_batch(mesh, c1.data), shard_batch(mesh, c2.data))
    assert np.array_equal(np.asarray(have), np.asarray(want.data))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ntt_matches_single_device():
    """N-sharded NTT with all_to_all stage exchange == single-device NTT."""
    from jax.sharding import PartitionSpec as P

    from poulpy_tpu.hal.ntt import ntt_forward, ntt_inverse, to_residues
    from poulpy_tpu.parallel.sharded_ntt import (
        sharded_ntt_forward,
        sharded_ntt_inverse,
    )

    n, d = 256, 8
    m = get_module(n, 2)
    t = m.tables
    primes = m.basis.primes
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(2**40), 2**40, size=(3, n), dtype=np.int64))
    r = to_residues(t, x).astype(jnp.int64)   # [3, P, N]

    mesh = jax.make_mesh((d,), ("sp",))
    fwd = jax.jit(
        jax.shard_map(
            lambda xl: sharded_ntt_forward(primes, n, d, "sp", xl),
            mesh=mesh,
            in_specs=P(None, None, "sp"),
            out_specs=P(None, None, "sp"),
            check_vma=False,
        )
    )
    inv = jax.jit(
        jax.shard_map(
            lambda xl: sharded_ntt_inverse(primes, n, d, "sp", xl),
            mesh=mesh,
            in_specs=P(None, None, "sp"),
            out_specs=P(None, None, "sp"),
            check_vma=False,
        )
    )
    have_f = fwd(r)
    want_f = ntt_forward(t, r)
    assert np.array_equal(np.asarray(have_f), np.asarray(want_f))
    back = inv(have_f)
    assert np.array_equal(np.asarray(back), np.asarray(r))


def test_sharded_brk_blind_rotation_matches():
    """BRK sharded over kp (4 devices) × dp=2 batch: bit-exact vs the
    single-device block-binary path, and the LUT values decode."""
    from poulpy_tpu.binfhe.blind_rotation import (
        blind_rotation_execute_block,
        blind_rotation_key_encrypt_sk,
    )
    from poulpy_tpu.binfhe.lut import lookup_table_new
    from poulpy_tpu.core import decryption as dec
    from poulpy_tpu.core import encryption as enc
    from poulpy_tpu.core.layouts import GLWECiphertext
    from poulpy_tpu.core.prepared import glwe_secret_prepare
    from poulpy_tpu.hal import vec_znx
    from poulpy_tpu.hal.source import Source as Src
    from poulpy_tpu.parallel.sharded import sharded_blind_rotation_block_fn

    m = get_module(64, 4)
    src = Src(bytes(32))
    xe, xa = Src(b"\x01" * 32), Src(b"\x02" * 32)
    n_lwe, block = 16, 4
    sk_lwe = src.binary_block(n_lwe, block)
    sk_glwe = enc.secret_new(m, 1, src)
    skp = glwe_secret_prepare(m, sk_glwe)
    brk = blind_rotation_key_encrypt_sk(
        m, jnp.asarray(sk_lwe), skp, 17, 68, 4, xe, xa
    )
    base2k = 17
    f = np.arange(32, dtype=np.int64)
    lut = lookup_table_new(m.n, base2k, 34, f, f_k=10)
    msgs = np.array([0, 5, 21, 31, 7, 12, 25, 30], dtype=np.int64)
    pt = np.zeros((8, 2, 1), dtype=np.int64)
    pt[:, 0, 0] = msgs << (base2k - 6)
    lwe = enc.lwe_encrypt_sk(
        None, jnp.asarray(pt), jnp.asarray(sk_lwe), base2k, 34, xe, xa
    )

    want = blind_rotation_execute_block(m, lwe, lut, brk, block)

    mesh = jax.make_mesh((2, 4), ("dp", "kp"))
    fn = sharded_blind_rotation_block_fn(m, mesh, lut, brk, block)
    have = fn(lwe)
    assert np.array_equal(np.asarray(have), np.asarray(want))

    glwe = GLWECiphertext(data=have, base2k=base2k, k=lut.size * base2k)
    vals = np.asarray(vec_znx.decode_vec_i64(
        base2k, 10, dec.glwe_decrypt(m, glwe, skp).data
    ))[:, 0]
    assert np.max(np.abs(vals - msgs)) <= 1, (msgs, vals)


def test_mesh_module_external_product_bit_exact():
    """A mesh-attached Module runs the PUBLIC external product dp-sharded
    and bit-exactly equal to the local path (parallel/auto.py)."""
    from poulpy_tpu.hal.module import module_with_mesh
    from poulpy_tpu.parallel.auto import shard_batch as auto_shard

    base2k, k_ct, k_key = 17, 51, 68
    m = get_module(64, 2)
    mesh = jax.make_mesh((8,), ("dp",))
    mm = module_with_mesh(m, mesh)

    src = Source(bytes(32))
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    sk = enc.secret_new(m, 1, src)
    skp = glwe_secret_prepare(m, sk)
    batch = 16
    rng = np.random.default_rng(3)
    data = rng.integers(-(2**10), 2**10, size=(batch, 64), dtype=np.int64)
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(base2k, 34, 3, jnp.asarray(data)),
        base2k=base2k, k=34,
    )
    ct = enc.glwe_encrypt_sk(
        m, pt, skp, base2k, k_ct, xe, xa, batch_shape=(batch,)
    )
    ptg = np.zeros(64, dtype=np.int64)
    ptg[1] = 1
    ggswp = ggsw_prepare(m, enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, base2k, k_key, dnum=3,
        source_xe=xe, source_xa=xa,
    ))

    want = glwe_external_product(m, ct, ggswp)
    ct_sh = ct.replace(data=auto_shard(mm, ct.data))
    have = glwe_external_product(mm, ct_sh, ggswp)
    assert "dp" in str(have.data.sharding.spec)
    assert np.array_equal(np.asarray(have.data), np.asarray(want.data))


def test_mesh_module_ckks_mul_bit_exact():
    """Public CKKS mul on a mesh-attached Module == local, bit-exact."""
    from poulpy_tpu.ckks import ops as ck
    from poulpy_tpu.ckks.encoder import Encoder
    from poulpy_tpu.core.prepared import glwe_tensor_key_prepare
    from poulpy_tpu.hal.module import module_with_mesh
    from poulpy_tpu.parallel.auto import shard_batch as auto_shard

    n, base2k, k_ct, k_key = 64, 17, 95, 95
    m = get_module(n, 2, 28)
    mesh = jax.make_mesh((8,), ("dp",))
    mm = module_with_mesh(m, mesh)
    src = Source(bytes(32))
    sk = enc.secret_new(m, 1, src)
    skp = glwe_secret_prepare(m, sk)
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    tsk = glwe_tensor_key_prepare(
        m,
        enc.glwe_tensor_key_encrypt_sk(
            m, sk, skp, base2k, k_key, dnum=6, source_xe=xe, source_xa=xa
        ),
    )
    encd = Encoder(n)
    rng = np.random.default_rng(5)
    batch = 8
    z = rng.normal(size=(batch, n // 2)) + 1j * rng.normal(
        size=(batch, n // 2)
    )
    pt = ck.encode(encd, z, base2k, k_ct, 22, 30)
    c1 = ck.encrypt_sk(m, pt, skp, k_ct, Source(b"\x03" * 32),
                       Source(b"\x04" * 32), batch_shape=(batch,))
    c2 = ck.encrypt_sk(m, pt, skp, k_ct, Source(b"\x05" * 32),
                       Source(b"\x06" * 32), batch_shape=(batch,))

    want = ck.mul(m, c1, c2, tsk)
    c1s = c1.replace(glwe=c1.glwe.replace(data=auto_shard(mm, c1.glwe.data)))
    have = ck.mul(mm, c1s, c2, tsk)
    assert np.array_equal(
        np.asarray(have.glwe.data), np.asarray(want.glwe.data)
    )
    assert have.meta == want.meta
