"""MXU mismatch bisect, stage 2: the BlockSpec/grid plumbing.

_mxu_repro.py showed the full kernel is wrong EVERYWHERE on device at a
single grid step, while _mxu_bisect.py showed every sub-stage exact when
called without BlockSpecs.  So test the real call's plumbing: a kernel
with the SAME in_specs as _pipe_mxu_fn whose body just copies each input
ref to an output — if a table arrives corrupted in VMEM (int8 relayout,
5-D block tiling), the copy differs from the host array.

Run: timeout 1700 python _mxu_repro2.py
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
from poulpy_tpu.backends.pallas_mxu import _host_tables_mxu
from poulpy_tpu.hal.primes import ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)
P = len(PRIMES)
TABS = _host_tables_mxu(PRIMES, N)
T_TILE, KK, MDIM = 8, 6, 8  # t_tile, ci*rmax, co*psize


def main():
    rng = np.random.default_rng(2)
    a = rng.integers(-(2**16), 2**16,
                     size=(T_TILE * KK, N2, N1)).astype(np.int32)
    pm = np.zeros((P, KK, MDIM, N2, N1), np.int64)
    for i, p in enumerate(PRIMES):
        pm[i] = rng.integers(0, p, size=(KK, MDIM, N2, N1))
    pm = pm.astype(np.int32)

    host = {
        "a": a,
        "ua": TABS["ua"], "v0": TABS["v0"], "tf": TABS["tf"],
        "wa": TABS["wa"], "w0": TABS["w0"], "ti": TABS["ti"],
        "pm": pm,
    }

    in_specs = [
        pl.BlockSpec((T_TILE * KK, N2, N1), lambda bi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, NDIG * N2, NDIG * N2), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, NDIG * N1, NDIG * N1), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, N1, N2), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, NDIG * N1, NDIG * N1), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, NDIG * N2, NDIG * N2), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, N1, N2), lambda bi: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P, KK, MDIM, N2, N1), lambda bi: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def copy_kernel(*refs):
        ins, outs = refs[:8], refs[8:]
        for i_ref, o_ref in zip(ins, outs):
            o_ref[...] = i_ref[...].astype(o_ref.dtype)

    out_shapes = tuple(
        jax.ShapeDtypeStruct(host[k].shape, jnp.int32)
        for k in ("a", "ua", "v0", "tf", "wa", "w0", "ti", "pm")
    )
    out_specs = tuple(
        pl.BlockSpec(s.shape, lambda bi, nd=len(s.shape): (0,) * nd,
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    )

    with jax.enable_x64(False):
        call = pl.pallas_call(
            copy_kernel,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )
        got = jax.block_until_ready(jax.jit(call)(
            *(jnp.asarray(host[k])
              for k in ("a", "ua", "v0", "tf", "wa", "w0", "ti", "pm"))
        ))

    for k, g in zip(("a", "ua", "v0", "tf", "wa", "w0", "ti", "pm"), got):
        g = np.asarray(g)
        want = host[k].astype(np.int32)
        ok = np.array_equal(g, want)
        bad = int((g != want).sum())
        print(f"{k}: exact={ok} mismatches={bad}/{g.size}", flush=True)


if __name__ == "__main__":
    main()
