"""Deeper on-device bisect of the fused-MXU mega-kernel mismatch.

_dot8_probe.py cleared the int8 dot_general and the digitize→dot→assemble
stage at clean 128-multiple shapes.  The real kernel at N=2048 runs with
n1=128, n2=16 — so the MXU contractions have K = NDIG·n2 = 64 (padded
tiles) and the in-kernel jnp.swapaxes moves a 16-wide lane axis.  Each
suspect below is ONE pallas kernel compiled twice — real device vs
pltpu.force_tpu_interpret_mode() — and diffed (interpret mode is the
known-good semantics: tests/test_fused_mxu.py passes there).

Run: timeout 1700 python _mxu_bisect.py
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split
from poulpy_tpu.backends.pallas_fused_mxu import _fwd_rows, _inv_rows
from poulpy_tpu.backends.pallas_mxu import _dot8, _host_tables_mxu
from poulpy_tpu.backends.pallas_ntt import mont_mul_i32
from poulpy_tpu.hal.primes import R, ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)  # match the failing repro config (ADVICE r3)
QINVS = tuple((-pow(p, -1, R)) % R for p in PRIMES)
TABS = _host_tables_mxu(PRIMES, N)
ROWS = 48  # t_tile=8 · cols=2 · rmax=3, the bench shape


def run_both(kernel, out_shape, *args):
    """Compile one pallas_call on the device and in interpret mode."""
    with jax.enable_x64(False):
        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        dev = np.asarray(jax.block_until_ready(jax.jit(call)(*args)))
        with pltpu.force_tpu_interpret_mode():
            ref = np.asarray(call(*args))
    return dev, ref


def report(name, dev, ref):
    ok = np.array_equal(dev, ref)
    bad = int((dev != ref).sum())
    print(f"{name}: exact={ok} mismatches={bad}/{dev.size}", flush=True)
    return ok


def main():
    rng = np.random.default_rng(1)
    p0 = PRIMES[0]

    # 1. in-kernel sublane<->lane transpose of a 16-wide lane axis
    x = rng.integers(-(1 << 30), 1 << 30, size=(ROWS, N2, N1),
                     dtype=np.int64).astype(np.int32)

    def k_tr(x_ref, o_ref):
        o_ref[...] = jnp.swapaxes(x_ref[...], 1, 2)

    dev, ref = run_both(
        k_tr, jax.ShapeDtypeStruct((ROWS, N1, N2), jnp.int32),
        jnp.asarray(x))
    report("swapaxes [48,16,128]->[48,128,16]", dev, ref)

    # 2. int8 dot with K=64, out-N=64 (the kernel's padded-tile shape)
    a8 = rng.integers(-128, 128, size=(ROWS * N1, NDIG * N2), dtype=np.int8)
    b8 = rng.integers(-128, 128, size=(NDIG * N2, NDIG * N2), dtype=np.int8)

    def k_dot(a_ref, b_ref, o_ref):
        o_ref[...] = _dot8(a_ref[...], b_ref[...])

    dev, ref = run_both(
        k_dot,
        jax.ShapeDtypeStruct((ROWS * N1, NDIG * N2), jnp.int32),
        jnp.asarray(a8), jnp.asarray(b8))
    report("int8 dot K=64 N=64", dev, ref)

    # 3. full forward four-step transform (both primes)
    xl = rng.integers(-(1 << 30), 1 << 30, size=(ROWS, N2, N1),
                      dtype=np.int64).astype(np.int32)

    def k_fwd(x_ref, ua_ref, v0_ref, tf_ref, o_ref):
        rs = _fwd_rows(x_ref[...], ua_ref, v0_ref, tf_ref,
                       PRIMES, QINVS, NDIG, N1, N2)
        o_ref[...] = jnp.stack(rs, axis=0)

    dev, ref = run_both(
        k_fwd,
        jax.ShapeDtypeStruct((len(PRIMES), ROWS, N2, N1), jnp.int32),
        jnp.asarray(xl), jnp.asarray(TABS["ua"]), jnp.asarray(TABS["v0"]),
        jnp.asarray(TABS["tf"]))
    fwd_ok = report("fwd four-step (2 primes)", dev, ref)

    # 4. inverse four-step transform (prime 0)
    y = rng.integers(0, p0, size=(ROWS, N2, N1), dtype=np.int64).astype(
        np.int32)

    def k_inv(y_ref, wa_ref, w0_ref, ti_ref, o_ref):
        o_ref[...] = _inv_rows(y_ref[...], 0, wa_ref, w0_ref, ti_ref,
                               p0, QINVS[0], N1, N2)

    dev, ref = run_both(
        k_inv, jax.ShapeDtypeStruct((ROWS, N2, N1), jnp.int32),
        jnp.asarray(y), jnp.asarray(TABS["wa"]), jnp.asarray(TABS["w0"]),
        jnp.asarray(TABS["ti"]))
    report("inv four-step (prime 0)", dev, ref)

    # 5. the VMP broadcast product term shape [T,1,n2,n1]x[1,M,n2,n1]
    t_tile, mdim = 8, 6
    r4 = rng.integers(0, p0, size=(t_tile, N2, N1), dtype=np.int64).astype(
        np.int32)
    pm = rng.integers(0, p0, size=(mdim, N2, N1), dtype=np.int64).astype(
        np.int32)

    def k_vmp(r_ref, m_ref, o_ref):
        o_ref[...] = mont_mul_i32(
            r_ref[...][:, None], m_ref[...][None], p0, QINVS[0])

    dev, ref = run_both(
        k_vmp, jax.ShapeDtypeStruct((t_tile, mdim, N2, N1), jnp.int32),
        jnp.asarray(r4), jnp.asarray(pm))
    report("vmp broadcast mont_mul", dev, ref)


if __name__ == "__main__":
    main()
