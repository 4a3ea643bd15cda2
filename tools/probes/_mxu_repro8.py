"""MXU mismatch bisect, stage 8: per-stage device vs CPU GROUND TRUTH.

Every earlier 'exact' verdict (repro3, _mxu_bisect) compared the device
against interpret mode IN THE SAME TPU PROCESS; the TPU is self-
consistent but disagrees with CPU (repro6).  So one of the kernel's ops
is backend-dependent.  This probe re-runs repro3's staged truncations —
fwd, vmp, inv, garner, full — but compares each against truth computed
on the CPU backend.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
       python tools/probes/_mxu_repro8.py cpu
     timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro8.py tpu
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "_mxu_repro3",
    os.path.join(os.path.dirname(__file__), "_mxu_repro3.py"),
)
_r3 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_r3)

STAGES = ("fwd", "vmp", "inv", "garner", "full")
WANT = "/tmp/mxu8_want_{}.npy"


def build_call(stage, args):
    rows_out = {"fwd": _r3.P * _r3.T * _r3.KK,
                "vmp": _r3.P * _r3.T * _r3.MDIM,
                "inv": _r3.P * _r3.T * _r3.MDIM,
                "garner": 2 * _r3.T * _r3.CO * _r3.PSIZE,
                "full": _r3.T * _r3.CO * _r3.RES_SIZE}
    in_specs = [
        pl.BlockSpec(a.shape, lambda bi, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    out_shape = jax.ShapeDtypeStruct(
        (rows_out[stage], _r3.N2, _r3.N1), jnp.int32)
    with jax.enable_x64(False):
        return pl.pallas_call(
            lambda *refs: _r3.body(stage, *refs),
            grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(out_shape.shape, lambda bi: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )


def main():
    phase = sys.argv[1]
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**16), 2**16,
                     size=(_r3.T * _r3.KK, _r3.N2, _r3.N1)).astype(np.int32)
    pm = np.zeros((_r3.P, _r3.KK, _r3.MDIM, _r3.N2, _r3.N1), np.int64)
    for i, p in enumerate(_r3.PRIMES):
        pm[i] = rng.integers(0, p, size=(_r3.KK, _r3.MDIM, _r3.N2, _r3.N1))
    args = [jnp.asarray(v) for v in (
        a, _r3.TABS["ua"], _r3.TABS["v0"], _r3.TABS["tf"], _r3.TABS["wa"],
        _r3.TABS["w0"], _r3.TABS["ti"], pm.astype(np.int32))]

    for stage in STAGES:
        if phase == "cpu":
            with pltpu.force_tpu_interpret_mode():
                call = build_call(stage, args)
                ref = np.asarray(call(*args))
            np.save(WANT.format(stage), ref)
            print(f"{stage}: cpu truth saved", flush=True)
        else:
            ref = np.load(WANT.format(stage))
            call = build_call(stage, args)
            with jax.enable_x64(False):
                dev = np.asarray(jax.block_until_ready(
                    jax.jit(call)(*args)))
            bad = int((dev != ref).sum())
            print(f"{stage}: device-vs-CPU exact={bad == 0} "
                  f"mismatches={bad}/{dev.size}", flush=True)
            if bad:
                # first divergent flat index for manual inspection
                idx = np.argwhere(dev != ref)[0]
                print(f"  first diff at {tuple(idx)}: "
                      f"dev={dev[tuple(idx)]} ref={ref[tuple(idx)]}",
                      flush=True)
                break


if __name__ == "__main__":
    main()
