"""CKKS leveled-evaluator tests (mirroring poulpy-ckks test_suite:
add/sub/mul/mul_plain/rescale/rotate/conjugate/composite vs f64 reference
computation on the slots)."""

import numpy as np
import pytest

import jax.numpy as jnp

from poulpy_tpu.ckks import ops as ck
from poulpy_tpu.ckks.encoder import Encoder
from poulpy_tpu.core import encryption as enc
from poulpy_tpu.core.prepared import (
    GLWEAutomorphismKeyPrepared,
    gglwe_prepare,
    glwe_secret_prepare,
    glwe_tensor_key_prepare,
)
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.source import Source

N = 64
BASE2K = 17
K_CT = 119         # 7 limbs: must exceed the mul landing shift by a
                   # noise margin (reference params use k=95 vs eff=35,
                   # poulpy-ckks/examples/poly2.rs:48-61)
LOG_DELTA = 22
LOG_BUDGET = 30    # effective_k = 52
K_KEY = 119
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def ctx():
    m = get_module(N, 4)
    s = Source(bytes(32))
    sk = enc.secret_new(m, 1, s)
    skp = glwe_secret_prepare(m, sk)
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    tsk = glwe_tensor_key_prepare(
        m,
        enc.glwe_tensor_key_encrypt_sk(
            m, sk, skp, BASE2K, K_KEY, dnum=7, source_xe=xe, source_xa=xa
        ),
    )
    encd = Encoder(N)
    return m, sk, skp, tsk, encd


def rand_slots():
    return RNG.normal(size=N // 2) + 1j * RNG.normal(size=N // 2)


def enc_ct(ctx, z, log_budget=LOG_BUDGET):
    m, sk, skp, tsk, encd = ctx
    xe, xa = Source(b"\x03" * 32), Source(b"\x04" * 32)
    pt = ck.encode(encd, z, BASE2K, K_CT, LOG_DELTA, log_budget)
    return ck.encrypt_sk(m, pt, skp, K_CT, xe, xa)


def dec_slots(ctx, ct):
    m, sk, skp, tsk, encd = ctx
    return ck.decode(encd, ck.decrypt(m, ct, skp))


def test_encode_encrypt_roundtrip(ctx):
    z = rand_slots()
    got = dec_slots(ctx, enc_ct(ctx, z))
    assert np.abs(got - z).max() < 4e-6


def test_add_sub(ctx):
    z1, z2 = rand_slots(), rand_slots()
    c1, c2 = enc_ct(ctx, z1), enc_ct(ctx, z2)
    assert np.abs(dec_slots(ctx, ck.add(c1, c2)) - (z1 + z2)).max() < 4e-6
    assert np.abs(dec_slots(ctx, ck.sub(c1, c2)) - (z1 - z2)).max() < 4e-6
    assert np.abs(dec_slots(ctx, ck.negate(c1)) + z1).max() < 4e-6


def test_rescale_budget(ctx):
    z = rand_slots()
    c = enc_ct(ctx, z)
    r = ck.rescale(c, 5)
    assert r.log_budget == c.log_budget - 5
    assert np.abs(dec_slots(ctx, r) - z).max() < 4e-6


def test_mul(ctx):
    m, sk, skp, tsk, encd = ctx
    z1, z2 = rand_slots(), rand_slots()
    c1, c2 = enc_ct(ctx, z1), enc_ct(ctx, z2)
    prod = ck.mul(m, c1, c2, tsk)
    assert prod.log_delta == LOG_DELTA
    assert prod.log_budget == LOG_BUDGET - LOG_DELTA
    got = dec_slots(ctx, prod)
    assert np.abs(got - z1 * z2).max() < 1e-4, np.abs(got - z1 * z2).max()


def test_mul_plain(ctx):
    m, sk, skp, tsk, encd = ctx
    z1, z2 = rand_slots(), rand_slots()
    c1 = enc_ct(ctx, z1)
    pt2 = ck.encode(encd, z2, BASE2K, K_CT, LOG_DELTA, LOG_BUDGET)
    prod = ck.mul_plain(m, c1, pt2)
    got = dec_slots(ctx, prod)
    assert np.abs(got - z1 * z2).max() < 1e-4


def test_mul_add_budget_error(ctx):
    m, sk, skp, tsk, encd = ctx
    z = rand_slots()
    c = enc_ct(ctx, z, log_budget=10)  # budget < delta
    with pytest.raises(ck.CKKSError):
        ck.mul(m, c, c, tsk)


def test_rotate_conjugate(ctx):
    m, sk, skp, tsk, encd = ctx
    xe, xa = Source(b"\x05" * 32), Source(b"\x06" * 32)
    z = rand_slots()
    c = enc_ct(ctx, z)
    # rotation by one slot: galois element 5
    p = m.galois_element(1)
    key, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, p, sk, BASE2K, K_KEY, dnum=7, source_xe=xe, source_xa=xa
    )
    akp = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, key), p=p)
    rot = ck.rotate(m, c, akp)
    got = dec_slots(ctx, rot)
    want = np.roll(z, -1)
    assert np.abs(got - want).max() < 1e-4, np.abs(got - want).max()

    # conjugation: galois element -1
    pc = -1
    keyc, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, pc, sk, BASE2K, K_KEY, dnum=7, source_xe=xe, source_xa=xa
    )
    akc = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, keyc), p=pc)
    conj = ck.conjugate(m, c, akc)
    gotc = dec_slots(ctx, conj)
    assert np.abs(gotc - np.conj(z)).max() < 1e-4


def test_composite(ctx):
    m, sk, skp, tsk, encd = ctx
    z1, z2, z3 = rand_slots(), rand_slots(), rand_slots()
    c1, c2, c3 = enc_ct(ctx, z1), enc_ct(ctx, z2), enc_ct(ctx, z3)
    # mul_add: c1*c2 + c3 needs c3 aligned to the product's budget
    got = dec_slots(ctx, ck.mul_add(m, c1, c2, ck.rescale(c3, 0), tsk))
    # NOTE: add aligns budgets via rescale internally
    want = z1 * z2 + z3
    assert np.abs(got - want).max() < 1e-3


def test_error_taxonomy():
    """Typed composition errors mirror poulpy-ckks/src/error.rs variants."""
    from poulpy_tpu.ckks import ops

    with pytest.raises(ops.InsufficientHomomorphicCapacity):
        ops._checked_sub("rescale", 5, 10)
    with pytest.raises(ops.MissingAutomorphismKey):
        ops.rotate_by(None, None, {}, 3)
    assert issubclass(ops.PlaintextBase2KMismatch, ops.CKKSError)
    assert issubclass(ops.PlaintextAlignmentImpossible, ops.CKKSError)


def test_mul_div_pow2(ctx):
    """pow2 meta-aware scaling (leveled/default/pow2.rs:26-80)."""
    z = rand_slots()
    c = enc_ct(ctx, z)
    up = ck.mul_pow2(c, 3)
    assert up.meta.log_delta == c.meta.log_delta
    assert up.log_budget == c.log_budget
    assert np.abs(dec_slots(ctx, up) - 8 * z).max() < 4e-5

    dn = ck.div_pow2(c, 3)
    assert dn.meta.log_delta == c.meta.log_delta + 3
    assert dn.log_budget == c.log_budget - 3
    assert np.abs(dec_slots(ctx, dn) - z / 8).max() < 4e-6

    # mul_pow2 then div_pow2 round-trips the value (budget pays)
    rt = ck.div_pow2(ck.mul_pow2(c, 4), 4)
    assert np.abs(dec_slots(ctx, rt) - z).max() < 4e-6


def test_mul_chain_depth3_rank2():
    """Depth-3 multiply chain at rank 2 (the reference test_suite covers
    leveled composition; rank-2 exercises the full tensor-key triangle
    (0,0),(0,1),(1,1)).

    Parameter note: the first mul's landing shift is 2·eff − δ = 2·78 − 18
    = 138 bits, and the mask-wrap cross-terms (see CLAUDE.md / the
    big-rational oracle analysis in test_core) demand k_ct exceed it by a
    wide noise margin — hence k = 153 (9 limbs), mirroring the reference's
    k=95-vs-eff=35 headroom (poulpy-ckks/examples/poly2.rs:48-61)."""
    m = get_module(N, 4)
    k_ct = k_key = 153
    delta, log_budget = 18, 60   # 3 muls consume 3·18 = 54 budget bits
    s = Source(b"\x21" * 32)
    sk = enc.secret_new(m, 2, s)
    skp = glwe_secret_prepare(m, sk)
    xe, xa = Source(b"\x22" * 32), Source(b"\x23" * 32)
    tsk = glwe_tensor_key_prepare(
        m,
        enc.glwe_tensor_key_encrypt_sk(
            m, sk, skp, BASE2K, k_key, dnum=9, source_xe=xe, source_xa=xa
        ),
    )
    encd = Encoder(N)
    zs = [0.5 * rand_slots() for _ in range(4)]
    cts = []
    for z in zs:
        pt = ck.encode(encd, z, BASE2K, k_ct, delta, log_budget)
        cts.append(ck.encrypt_sk(m, pt, skp, k_ct, xe, xa))
    out = cts[0]
    want = zs[0]
    for i in range(1, 4):
        out = ck.mul(m, out, cts[i], tsk)
        want = want * zs[i]
    assert out.log_budget == log_budget - 3 * delta
    assert out.glwe.rank == 2
    pt = ck.decrypt(m, out, skp)
    got = ck.decode(encd, pt)
    assert np.abs(got - want).max() < 5e-4, np.abs(got - want).max()
