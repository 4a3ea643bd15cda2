"""MXU mismatch bisect, stage 3: progressive truncation of the real body.

Refs arrive intact (_mxu_repro2.py) and every sub-stage is exact in
isolation (_mxu_bisect.py), yet the full kernel is wrong everywhere
(_mxu_repro.py).  Compile the SAME body (same helpers, same grid/specs)
truncated after each phase — fwd, +VMP, +inv, +tail — device vs
interpret; the first failing truncation localizes the composition bug.

Run: timeout 1700 python _mxu_repro3.py
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
from poulpy_tpu.backends.pallas_fused import (
    garner_center_pairs,
    normalize_windows,
)
from poulpy_tpu.backends.pallas_fused_mxu import _fwd_rows, _inv_rows
from poulpy_tpu.backends.pallas_mxu import _host_tables_mxu
from poulpy_tpu.backends.pallas_ntt import _add_mod, mont_mul_i32
from poulpy_tpu.hal.primes import PrimeBasis, R, ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)
P = len(PRIMES)
QINVS = tuple((-pow(p, -1, R)) % R for p in PRIMES)
BASIS = PrimeBasis(PRIMES)
TABS = _host_tables_mxu(PRIMES, N)
T, KK, CO, PSIZE = 8, 6, 2, 4
MDIM = CO * PSIZE
RES_SIZE, KR, KA = 3, 17, 17


def body(stage, a_ref, ua_ref, v0_ref, tf_ref, wa_ref, w0_ref, ti_ref,
         pm_ref, o_ref):
    x = a_ref[...]
    rs = _fwd_rows(x, ua_ref, v0_ref, tf_ref, PRIMES, QINVS, NDIG, N1, N2)
    if stage == "fwd":
        o_ref[...] = jnp.stack(rs, 0).reshape(P * T * KK, N2, N1)
        return
    ys = []
    for pi, p in enumerate(PRIMES):
        qinv = QINVS[pi]
        r4 = rs[pi].reshape(T, KK, N2, N1)
        acc = None
        for k in range(KK):
            term = mont_mul_i32(
                r4[:, k][:, None], pm_ref[pi, k][None], p, qinv)
            acc = term if acc is None else _add_mod(acc, term, p)
        y = acc.reshape(T * MDIM, N2, N1)
        if stage == "vmp":
            ys.append(y)
            continue
        ys.append(_inv_rows(y, pi, wa_ref, w0_ref, ti_ref, p, qinv, N1, N2))
    if stage in ("vmp", "inv"):
        o_ref[...] = jnp.stack(ys, 0).reshape(P * T * MDIM, N2, N1)
        return
    hi, lo = garner_center_pairs(ys, PRIMES, QINVS, BASIS)
    hi = hi.reshape(T, CO, PSIZE, N2, N1)
    lo = lo.reshape(T, CO, PSIZE, N2, N1)
    if stage == "garner":
        o_ref[...] = jnp.concatenate(
            [hi, lo], 0).reshape(2 * T * CO * PSIZE, N2, N1)
        return
    out_rows = []
    for c in range(CO):
        out_rows.extend(normalize_windows(
            [hi[:, c, j] for j in range(PSIZE)],
            [lo[:, c, j] for j in range(PSIZE)],
            PSIZE, RES_SIZE, KR, KA, 0))
    o_ref[...] = jnp.stack(out_rows, axis=1).reshape(
        T * CO * RES_SIZE, N2, N1)


def run_stage(stage, args):
    rows_out = {"fwd": P * T * KK, "vmp": P * T * MDIM, "inv": P * T * MDIM,
                "garner": 2 * T * CO * PSIZE, "full": T * CO * RES_SIZE}
    in_specs = [
        pl.BlockSpec(a.shape, lambda bi, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    out_shape = jax.ShapeDtypeStruct((rows_out[stage], N2, N1), jnp.int32)
    with jax.enable_x64(False):
        call = pl.pallas_call(
            lambda *refs: body(stage, *refs),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(out_shape.shape, lambda bi: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        dev = np.asarray(jax.block_until_ready(jax.jit(call)(*args)))
        with pltpu.force_tpu_interpret_mode():
            ref = np.asarray(call(*args))
    ok = np.array_equal(dev, ref)
    print(f"{stage}: exact={ok} mismatches={int((dev != ref).sum())}"
          f"/{dev.size}", flush=True)
    return ok


def main():
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**16), 2**16, size=(T * KK, N2, N1)).astype(np.int32)
    pm = np.zeros((P, KK, MDIM, N2, N1), np.int64)
    for i, p in enumerate(PRIMES):
        pm[i] = rng.integers(0, p, size=(KK, MDIM, N2, N1))
    args = [jnp.asarray(v) for v in (
        a, TABS["ua"], TABS["v0"], TABS["tf"], TABS["wa"], TABS["w0"],
        TABS["ti"], pm.astype(np.int32))]
    for stage in ("fwd", "vmp", "inv", "garner", "full"):
        if not run_stage(stage, args):
            break


if __name__ == "__main__":
    main()
