"""RLWE-core tests: encryption, keyswitch, external product, automorphism,
trace, packing, conversions — following the reference test strategy
(noise-budget assertions + functional checks, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poulpy_tpu.core import decryption as dec
from poulpy_tpu.core import encryption as enc
from poulpy_tpu.core.automorphism import glwe_automorphism
from poulpy_tpu.core.conversion import (
    gglwe_to_ggsw_key_encrypt_sk,
    ggsw_from_gglwe,
    glwe_from_lwe,
    glwe_to_lwe_key_encrypt_sk,
    lwe_from_glwe,
    lwe_to_glwe_key_encrypt_sk,
)
from poulpy_tpu.core.external_product import glwe_cmux, glwe_external_product
from poulpy_tpu.core.keyswitching import glwe_keyswitch
from poulpy_tpu.core.layouts import GLWEPlaintext
from poulpy_tpu.core.operations import glwe_add, glwe_lsh, glwe_rotate, glwe_rsh
from poulpy_tpu.core.packing import glwe_pack, glwe_trace, trace_galois_elements
from poulpy_tpu.core.prepared import (
    GLWEAutomorphismKeyPrepared,
    gglwe_prepare,
    ggsw_prepare,
    glwe_secret_prepare,
)
from poulpy_tpu.hal import vec_znx, znx
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.source import Source

N = 64
BASE2K = 17
K_CT = 51
K_PT = 34
K_KEY = 68
RNG = np.random.default_rng(7)


def fresh_sources():
    return Source(b"\x01" * 32), Source(b"\x02" * 32)


@pytest.fixture(scope="module")
def ctx():
    m = get_module(N, 4)
    s = Source(bytes(32))
    sk = enc.secret_new(m, 1, s)
    skp = glwe_secret_prepare(m, sk)
    return m, sk, skp


def encode(data, k=K_PT, size=3):
    return GLWEPlaintext(
        data=vec_znx.encode_vec_i64(BASE2K, k, size, jnp.asarray(data)),
        base2k=BASE2K,
        k=k,
    )


def decode(m, ct, skp, k=K_PT):
    pt = dec.glwe_decrypt(m, ct, skp)
    return np.asarray(vec_znx.decode_vec_i64(BASE2K, k, pt.data))


def rand_msg():
    return RNG.integers(-(2**15), 2**15, size=N, dtype=np.int64)


def test_encrypt_decrypt_noise(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    # decrypt at full precision and measure the noise bits
    pt = dec.glwe_decrypt(m, ct, skp)
    vals = vec_znx.decode_vec_float(BASE2K, np.asarray(pt.data))
    want = data.astype(np.float64) * 2.0**-K_PT
    err = vals - want
    err -= np.round(err)  # torus distance
    noise_log2 = np.log2(np.abs(err).max() + 1e-300)
    # fresh noise ≈ sigma·2^-K_CT; assert ≤ log2(sigma·bound) - K_CT + 0.5
    assert noise_log2 <= np.log2(6 * 3.2) - K_CT + 0.5, noise_log2


def test_encrypt_decrypt_batched_vmap(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    batch = 4
    data = RNG.integers(-(2**15), 2**15, size=(batch, N), dtype=np.int64)
    ct = enc.glwe_encrypt_sk(
        m, encode(data), skp, BASE2K, K_CT, xe, xa, batch_shape=(batch,)
    )
    assert ct.data.shape == (batch, 2, 3, N)
    out = decode(m, ct, skp)
    assert np.array_equal(out, data)


def test_keyswitch_noise(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    s2 = Source(b"\x03" * 32)
    sk2 = enc.secret_new(m, 1, s2)
    sk2p = glwe_secret_prepare(m, sk2)
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ksk = enc.glwe_switching_key_encrypt_sk(
        m, sk, sk2p, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    ct2 = glwe_keyswitch(m, ct, gglwe_prepare(m, ksk))
    assert np.array_equal(decode(m, ct2, sk2p), data)


def test_keyswitch_rank2(ctx):
    m, _, _ = ctx
    xe, xa = fresh_sources()
    s = Source(b"\x04" * 32)
    sk_a = enc.secret_new(m, 2, s)
    skp_a = glwe_secret_prepare(m, sk_a)
    sk_b = enc.secret_new(m, 1, s)
    skp_b = glwe_secret_prepare(m, sk_b)
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp_a, BASE2K, K_CT, xe, xa)
    assert ct.rank == 2
    ksk = enc.glwe_switching_key_encrypt_sk(
        m, sk_a, skp_b, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    ct2 = glwe_keyswitch(m, ct, gglwe_prepare(m, ksk))
    assert ct2.rank == 1
    assert np.array_equal(decode(m, ct2, skp_b), data)


def test_external_product_rotation(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ptg = np.zeros(N, dtype=np.int64)
    ptg[5] = 1
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    ct2 = glwe_external_product(m, ct, ggsw_prepare(m, ggsw))
    want = np.asarray(znx.znx_rotate(5, jnp.asarray(data)))
    assert np.array_equal(decode(m, ct2, skp), want)


def test_cmux(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    d0, d1 = rand_msg(), rand_msg()
    ct0 = enc.glwe_encrypt_sk(m, encode(d0), skp, BASE2K, K_CT, xe, xa)
    ct1 = enc.glwe_encrypt_sk(m, encode(d1), skp, BASE2K, K_CT, xe, xa)
    for bit, want in [(0, d0), (1, d1)]:
        ptg = np.full(N, 0, dtype=np.int64)
        ptg[0] = bit
        sel = enc.ggsw_encrypt_sk(
            m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
            source_xe=xe, source_xa=xa,
        )
        out = glwe_cmux(m, ggsw_prepare(m, sel), ct1, ct0)
        got = decode(m, out, skp)
        assert np.max(np.abs(got - want)) <= 1, bit


def test_automorphism(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    p = m.galois_element(1)  # 5
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    key, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, p, sk, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    akp = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, key), p=p)
    ct2 = glwe_automorphism(m, ct, akp)
    want = np.asarray(znx.znx_automorphism(p, jnp.asarray(data)))
    got = decode(m, ct2, skp)
    assert np.max(np.abs(got - want)) <= 1


def make_trace_keys(m, sk, skp, xe, xa):
    keys = {}
    for p in trace_galois_elements(m):
        key, _ = enc.glwe_automorphism_key_encrypt_sk(
            m, p, sk, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
        )
        keys[p] = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, key), p=p)
    return keys


def test_trace(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    keys = make_trace_keys(m, sk, skp, xe, xa)
    tr = glwe_trace(m, ct, keys)
    got = decode(m, tr, skp)
    # trace/N keeps coefficient 0, kills the rest
    assert abs(got[0] - data[0]) <= 2
    assert np.max(np.abs(got[1:])) <= 2


def test_pack(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    keys = make_trace_keys(m, sk, skp, xe, xa)
    msgs = {j: rand_msg() for j in [0, 1, 5]}
    cts = {
        j: enc.glwe_encrypt_sk(m, encode(v), skp, BASE2K, K_CT, xe, xa)
        for j, v in msgs.items()
    }
    packed = glwe_pack(m, cts, keys)
    got = decode(m, packed, skp)
    for j, v in msgs.items():
        assert abs(got[j] - v[0]) <= 4, (j, got[j], v[0])
    # unfilled slots are zero
    assert abs(got[2]) <= 4 and abs(got[7]) <= 4


def test_lwe_roundtrip():
    src = Source(b"\x09" * 32)
    xe, xa = fresh_sources()
    n_lwe = 24
    sk_lwe = jnp.asarray(src.ternary_prob((n_lwe,)))
    data = RNG.integers(-(2**10), 2**10, size=(1,), dtype=np.int64)
    pt = vec_znx.encode_vec_i64(BASE2K, 17, 3, jnp.asarray(data))
    ct = enc.lwe_encrypt_sk(None, pt, sk_lwe, BASE2K, K_CT, xe, xa)
    out = dec.lwe_decrypt(ct, sk_lwe)
    got = np.asarray(vec_znx.decode_vec_i64(BASE2K, 17, out[..., None]))[..., 0]
    assert int(got) == int(data[0])


def test_glwe_lwe_bridges(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    src = Source(b"\x0a" * 32)
    n_lwe = 32
    sk_lwe = jnp.asarray(src.ternary_prob((n_lwe,)))

    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)

    to_lwe = glwe_to_lwe_key_encrypt_sk(
        m, sk_lwe, sk, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    idx = 3
    lwe = lwe_from_glwe(m, ct, idx, to_lwe, n_lwe)
    out = dec.lwe_decrypt(lwe, sk_lwe)
    got = np.asarray(vec_znx.decode_vec_i64(BASE2K, K_PT, out[..., None]))[..., 0]
    assert abs(got - data[idx]) <= 2

    # back: LWE -> GLWE
    to_glwe = lwe_to_glwe_key_encrypt_sk(
        m, sk_lwe, skp, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    glwe2 = glwe_from_lwe(m, lwe, to_glwe, BASE2K, K_CT)
    got2 = decode(m, glwe2, skp)
    assert abs(got2[0] - data[idx]) <= 4


def test_ggsw_from_gglwe(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    # GGLWE encrypting m (rank_in=1)
    msg = np.zeros(N, dtype=np.int64)
    msg[2] = 1
    gglwe = enc.gglwe_encrypt_sk(
        m, jnp.asarray(msg)[None, :], skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    tsk = gglwe_to_ggsw_key_encrypt_sk(
        m, sk, skp, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    ggsw = ggsw_from_gglwe(m, gglwe, tsk)
    # use the expanded GGSW in an external product: should rotate by X^2
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ct2 = glwe_external_product(m, ct, ggsw_prepare(m, ggsw))
    want = np.asarray(znx.znx_rotate(2, jnp.asarray(data)))
    got = decode(m, ct2, skp)
    # two chained gadget products amplify noise: digits (2^16) hit the
    # expansion noise (~2^-46.5) once more in the external product →
    # ~2^-25 total, i.e. a few hundred at the 2^-34 plaintext scale
    assert np.max(np.abs(got - want)) <= 1024


def test_lsh_rsh_ct(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    up = glwe_lsh(4, ct)
    got = decode(m, up, skp, k=K_PT - 4)  # message scale moved by 2^4
    assert np.max(np.abs(got - data)) <= 1


def test_public_key_encryption(ctx):
    m, sk, skp = ctx
    xe, xa = fresh_sources()
    xu = Source(b"\x0b" * 32)
    pk = enc.glwe_public_key_generate(m, skp, BASE2K, K_KEY, xe, xa)
    pkp = enc.glwe_public_key_prepare(m, pk)
    data = rand_msg()
    pt = encode(data)
    ct = enc.glwe_encrypt_pk(m, pt, pkp, BASE2K, K_KEY, xu, xe)
    got = decode(m, ct, skp)
    assert np.max(np.abs(got - data)) <= 2, np.max(np.abs(got - data))


def test_lwe_keyswitch():
    from poulpy_tpu.core.keyswitching import lwe_keyswitch, lwe_switching_key_encrypt_sk

    m = get_module(N, 4)
    src = Source(b"\x0c" * 32)
    xe, xa = fresh_sources()
    sk1 = jnp.asarray(src.ternary_prob((24,)))
    sk2 = jnp.asarray(src.ternary_prob((32,)))
    data = RNG.integers(-(2**10), 2**10, size=(1,), dtype=np.int64)
    pt = vec_znx.encode_vec_i64(BASE2K, 17, 3, jnp.asarray(data))
    ct = enc.lwe_encrypt_sk(None, pt, sk1, BASE2K, K_CT, xe, xa)
    ksk = lwe_switching_key_encrypt_sk(
        m, sk1, sk2, BASE2K, K_KEY, dnum=3, source_xe=xe, source_xa=xa
    )
    ct2 = lwe_keyswitch(m, ct, ksk, 32)
    out = dec.lwe_decrypt(ct2, sk2)
    got = np.asarray(vec_znx.decode_vec_i64(BASE2K, 17, out[..., None]))[..., 0]
    assert abs(int(got) - int(data[0])) <= 1


def test_measured_noise_api(ctx):
    """glwe/gglwe/ggsw_noise match the reference noise/ module semantics:
    every gadget row's measured noise is at fresh-encryption level."""
    from poulpy_tpu.core import noise as noise_mod

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = rand_msg()
    pt = encode(data)
    ct = enc.glwe_encrypt_sk(m, pt, skp, BASE2K, K_CT, xe, xa)
    st = noise_mod.glwe_noise(m, ct, pt, skp)
    fresh = np.log2(6 * 3.2) - K_CT + 0.5
    assert st.log2_max <= fresh, st

    scalar = jnp.asarray(RNG.integers(-2, 3, size=(1, N), dtype=np.int64))
    gglwe = enc.gglwe_encrypt_sk(m, scalar, skp, BASE2K, K_KEY, 3, xe, xa)
    for row in range(3):
        st = noise_mod.gglwe_noise(m, gglwe, row, 0, scalar[0], skp)
        assert st.log2_max <= np.log2(6 * 3.2) - K_KEY + 0.5, (row, st)

    ggsw = enc.ggsw_encrypt_sk(m, scalar[0], skp, BASE2K, K_KEY, 3, xe, xa)
    for row in range(3):
        for col in range(ggsw.rank + 1):
            st = noise_mod.ggsw_noise(m, ggsw, row, col, scalar[0], skp)
            assert st.log2_max <= np.log2(6 * 3.2) - K_KEY + 1.0, (row, col, st)


def test_tensor_relinearize(ctx):
    """Relinearization keyswitches the quadratic term exactly up to
    keyswitch noise: decrypt(relin(a, b)) == norm(d0 + d1·s + d2·s²).

    NOTE semantics: a raw ct×ct tensor product is the product of the
    ciphertexts' UNREDUCED values pt + I (I = the integer part of c1·s,
    up to ~N/2), so it carries mask-wrap cross terms I_a·pt_b + I_b·pt_a
    above the pt_a·pt_b signal.  Extracting a meaningful product requires
    the CKKS-style scale analysis (ckks/ops.py mul, where the landing
    shift keeps those terms below delta precision) — so this test checks
    the exact algebraic contract, not a decoded product value."""
    from poulpy_tpu.core.operations import (
        glwe_tensor_product_big,
        glwe_tensor_relinearize,
    )
    from poulpy_tpu.core.prepared import glwe_tensor_key_prepare
    from poulpy_tpu.hal import dft
    from poulpy_tpu.hal.normalization import vec_znx_normalize

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = np.zeros(N, dtype=np.int64)
    data[0] = 3 << 10
    pt = encode(data)
    ct = enc.glwe_encrypt_sk(m, pt, skp, BASE2K, 85, xe, xa)
    tk = glwe_tensor_key_prepare(
        m,
        enc.glwe_tensor_key_encrypt_sk(m, sk, skp, BASE2K, 119, 7, xe, xa),
    )
    prod = glwe_tensor_relinearize(m, ct, ct, tk)
    have = dec.glwe_decrypt(m, prod, skp)

    # exact oracle: d0 + d1·s + d2·s² in the big domain
    lin, quad = glwe_tensor_product_big(m, ct, ct, ct.size * 2 - 1)
    s_prep = skp.data[0]

    def times_s(big):
        x = dft.dft_apply(m, vec_znx_normalize(BASE2K, big))
        return dft.idft_apply(m, dft.svp_apply(m, x, s_prep))

    total = lin[0] + times_s(lin[1]) + times_s(times_s(quad[(0, 0)]))
    want = dft.big_normalize(m, have.data.shape[-2], BASE2K, total, BASE2K)

    err = vec_znx.decode_vec_float(
        BASE2K, np.asarray(have.data)
    ) - vec_znx.decode_vec_float(BASE2K, np.asarray(want))
    err -= np.round(err)
    # only the tensor-key keyswitch noise remains (k_tsk = 119)
    assert np.abs(err).max() < 2.0**-90, np.log2(np.abs(err).max())


# --------------------------------------------------------------------------
# Gadget-ciphertext key management (keyswitching/gglwe.rs, ggsw.rs,
# automorphism/ggsw_ct.rs, gglwe_atk.rs, operations/ggsw.rs)
# --------------------------------------------------------------------------


def test_ggsw_rotate(ctx):
    from poulpy_tpu.core.operations import ggsw_rotate

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    ptg = np.zeros(N, dtype=np.int64)
    ptg[5] = 1
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    rot = ggsw_rotate(3, ggsw)   # plaintext becomes X^8
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ct2 = glwe_external_product(m, ct, ggsw_prepare(m, rot))
    want = np.asarray(znx.znx_rotate(8, jnp.asarray(data)))
    assert np.array_equal(decode(m, ct2, skp), want)


def test_gglwe_keyswitch(ctx):
    from poulpy_tpu.core.keyswitching import gglwe_keyswitch
    from poulpy_tpu.core.layouts import GLWECiphertext

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    sk2 = enc.secret_new(m, 1, Source(b"\x05" * 32))
    sk2p = glwe_secret_prepare(m, sk2)
    msg = RNG.integers(-(2**10), 2**10, size=N, dtype=np.int64)
    gglwe = enc.gglwe_encrypt_sk(
        m, jnp.asarray(msg)[None, :], skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    ksk = enc.glwe_switching_key_encrypt_sk(
        m, sk, sk2p, BASE2K, 85, dnum=5, source_xe=xe, source_xa=xa
    )
    out = gglwe_keyswitch(m, gglwe, gglwe_prepare(m, ksk))
    assert out.dnum == 3 and out.rank_in == 1 and out.rank_out == 1
    # every row r (col 0) must decrypt under sk2 to msg * 2^{-(r+1)*base2k}
    for r in range(out.dnum):
        row = GLWECiphertext(data=out.data[r, 0], base2k=out.base2k, k=out.k)
        pt = dec.glwe_decrypt(m, row, sk2p)
        got = np.asarray(
            vec_znx.decode_vec_i64(BASE2K, BASE2K * (r + 1), pt.data)
        )
        assert np.max(np.abs(got - msg)) <= 1, r


def test_ggsw_keyswitch(ctx):
    from poulpy_tpu.core.keyswitching import ggsw_keyswitch

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    sk2 = enc.secret_new(m, 1, Source(b"\x06" * 32))
    sk2p = glwe_secret_prepare(m, sk2)
    ptg = np.zeros(N, dtype=np.int64)
    ptg[5] = 1
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    ksk = enc.glwe_switching_key_encrypt_sk(
        m, sk, sk2p, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    tsk = gglwe_to_ggsw_key_encrypt_sk(
        m, sk2, sk2p, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    switched = ggsw_keyswitch(m, ggsw, gglwe_prepare(m, ksk), tsk)
    # the switched GGSW must act (under sk2) as multiplication by X^5
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), sk2p, BASE2K, K_CT, xe, xa)
    ct2 = glwe_external_product(m, ct, ggsw_prepare(m, switched))
    want = np.asarray(znx.znx_rotate(5, jnp.asarray(data)))
    got = decode(m, ct2, sk2p)
    assert np.max(np.abs(got - want)) <= 1024


def test_ggsw_automorphism(ctx):
    from poulpy_tpu.core.automorphism import ggsw_automorphism

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    p = m.galois_element(1)  # 5
    ptg = np.zeros(N, dtype=np.int64)
    ptg[1] = 1               # X -> X^p under the automorphism
    ggsw = enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=3,
        source_xe=xe, source_xa=xa,
    )
    key, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, p, sk, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    akp = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, key), p=p)
    tsk = gglwe_to_ggsw_key_encrypt_sk(
        m, sk, skp, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    out = ggsw_automorphism(m, ggsw, akp, tsk)
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ct2 = glwe_external_product(m, ct, ggsw_prepare(m, out))
    want = np.asarray(znx.znx_rotate(p, jnp.asarray(data)))  # X^1 -> X^5
    got = decode(m, ct2, skp)
    assert np.max(np.abs(got - want)) <= 1024


def test_automorphism_key_automorphism(ctx):
    from poulpy_tpu.core.automorphism import (
        glwe_automorphism_key_automorphism,
    )

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    p1, p2 = m.galois_element(1), m.galois_element(2)  # 5, 25
    key1, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, p1, sk, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    key2, _ = enc.glwe_automorphism_key_encrypt_sk(
        m, p2, sk, BASE2K, 102, dnum=6, source_xe=xe, source_xa=xa
    )
    akp2 = GLWEAutomorphismKeyPrepared(key=gglwe_prepare(m, key2), p=p2)
    composed, p_out = glwe_automorphism_key_automorphism(m, key1, p1, akp2)
    assert p_out == (p1 * p2) % (2 * N)
    akp12 = GLWEAutomorphismKeyPrepared(
        key=gglwe_prepare(m, composed), p=p_out
    )
    data = rand_msg()
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)
    ct2 = glwe_automorphism(m, ct, akp12)
    want = np.asarray(znx.znx_automorphism(p_out, jnp.asarray(data)))
    got = decode(m, ct2, skp)
    assert np.max(np.abs(got - want)) <= 4


def test_mul_plain_and_lsh_combinators(ctx):
    from poulpy_tpu.core.operations import (
        glwe_lsh_add,
        glwe_lsh_sub,
        glwe_mul_plain,
    )
    from oracle import negacyclic_mul

    m, sk, skp = ctx
    xe, xa = fresh_sources()
    data = RNG.integers(-(2**8), 2**8, size=N, dtype=np.int64)
    ct = enc.glwe_encrypt_sk(m, encode(data), skp, BASE2K, K_CT, xe, xa)

    # lsh_add / lsh_sub: 2^3·a ± b at the shifted decode scale
    d2 = rand_msg()
    ct2 = enc.glwe_encrypt_sk(m, encode(d2), skp, BASE2K, K_CT, xe, xa)
    up = glwe_lsh_add(3, ct, ct2)
    got = decode(m, up, skp, k=K_PT - 3)
    assert np.max(np.abs(got - (8 * data + d2) // 8)) <= 2

    dn = glwe_lsh_sub(3, ct, ct2)
    got = decode(m, dn, skp, k=K_PT - 3)
    assert np.max(np.abs(got - (8 * data - d2) // 8)) <= 2

    # mul_plain: ct × small plaintext poly == negacyclic convolution
    pt_poly = np.zeros(N, dtype=np.int64)
    pt_poly[0], pt_poly[3] = 2, -1
    pt = encode(pt_poly, k=BASE2K, size=1)
    prod = glwe_mul_plain(m, ct, pt)
    # value scale: a.k + pt.k − base2k = K_PT + base2k − base2k
    got = decode(m, prod, skp, k=K_PT)
    want = np.asarray(negacyclic_mul(list(data), list(pt_poly)), dtype=np.int64)
    assert np.max(np.abs(got - want)) <= 2, np.abs(got - want).max()
