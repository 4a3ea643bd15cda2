"""MXU mismatch bisect, stage 10: truncations INSIDE _fwd_rows, device vs
CPU truth.

repro8: the fwd stage itself is wrong on device (122112/196608 vs CPU)
while every piece passed in isolation against numpy oracles
(_dot8_probe).  Truncate the forward transform after each sub-op:

  planes  — digitize + concat (pure VPU int ops)
  dota    — first int8 MXU dot against UA
  asma    — assemble/REDC^2 of the first dot
  twid    — x tf twiddle mont_mul
  dotb    — second digitize + dot against V0
  full    — + final assemble (== repro8's fwd)

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
       python tools/probes/_mxu_repro10.py cpu
     timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_mxu_repro10.py tpu
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

from poulpy_tpu.backends.mxu_ntt import NDIG
from poulpy_tpu.backends.mxu_ntt4 import _split
from poulpy_tpu.backends.pallas_mxu import (
    _assemble_redc,
    _digit_planes,
    _dot8,
    _host_tables_mxu,
)
from poulpy_tpu.backends.pallas_ntt import mont_mul_i32
from poulpy_tpu.hal.primes import R, ntt_primes

N = 2048
N1, N2 = _split(N)
PRIMES = ntt_primes(2, 1 << 28)
P = len(PRIMES)
QINVS = tuple((-pow(p, -1, R)) % R for p in PRIMES)
TABS = _host_tables_mxu(PRIMES, N)
ROWS = 48  # t_tile=8 * kk=6, as in the bench config
STAGES = ("planes", "dota", "asma", "twid", "dotb", "full")
WANT = "/tmp/mxu10_want_{}.npy"


def body(stage, x_ref, ua_ref, v0_ref, tf_ref, o_ref):
    rows = ROWS
    x = x_ref[...]
    xt = jnp.swapaxes(x, 1, 2)                       # [rows, n1, n2]
    planes = _digit_planes(xt, NDIG)
    lhs_a = jnp.concatenate(planes, axis=-1).reshape(rows * N1, NDIG * N2)
    if stage == "planes":
        o_ref[...] = lhs_a.astype(jnp.int32)
        return
    outs = []
    for pi, p in enumerate(PRIMES):
        qinv = QINVS[pi]
        pa = _dot8(lhs_a, ua_ref[pi, : NDIG * N2])   # [rows*n1, 4*n2]
        if stage == "dota":
            outs.append(pa)
            continue
        pas = [pa[:, d * N2: (d + 1) * N2].reshape(rows, N1, N2)
               for d in range(NDIG)]
        a = _assemble_redc(*pas, p, qinv)            # [rows, n1, k2]
        if stage == "asma":
            outs.append(a)
            continue
        a = mont_mul_i32(a, tf_ref[pi][None], p, qinv)
        if stage == "twid":
            outs.append(a)
            continue
        at = jnp.swapaxes(a, 1, 2)                   # [rows, k2, n1]
        pl_b = _digit_planes(at, NDIG)
        lhs_b = jnp.concatenate(pl_b, axis=-1).reshape(rows * N2, NDIG * N1)
        pb = _dot8(lhs_b, v0_ref[pi])                # [rows*k2, 4*n1]
        if stage == "dotb":
            outs.append(pb)
            continue
        pbs = [pb[:, d * N1: (d + 1) * N1].reshape(rows, N2, N1)
               for d in range(NDIG)]
        outs.append(_assemble_redc(*pbs, p, qinv))
    o_ref[...] = jnp.concatenate([o.reshape(-1, o.shape[-1])
                                  for o in outs], 0)


def out_shape(stage):
    shapes = {
        "planes": (ROWS * N1, NDIG * N2),
        "dota": (P * ROWS * N1, NDIG * N2),
        "asma": (P * ROWS * N1, N2),
        "twid": (P * ROWS * N1, N2),
        "dotb": (P * ROWS * N2, NDIG * N1),
        "full": (P * ROWS * N2, N1),
    }
    return jax.ShapeDtypeStruct(shapes[stage], jnp.int32)


def main():
    phase = sys.argv[1]
    rng = np.random.default_rng(3)
    x = rng.integers(-(2**16), 2**16, size=(ROWS, N2, N1)).astype(np.int32)
    args = [jnp.asarray(v) for v in
            (x, TABS["ua"], TABS["v0"], TABS["tf"])]

    for stage in STAGES:
        osh = out_shape(stage)

        def build():
            in_specs = [
                pl.BlockSpec(a.shape, lambda bi, nd=a.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)
                for a in args
            ]
            return pl.pallas_call(
                lambda *refs: body(stage, *refs),
                grid=(1,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(osh.shape, lambda bi: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=osh,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )

        if phase == "cpu":
            with pltpu.force_tpu_interpret_mode():
                with jax.enable_x64(False):
                    ref = np.asarray(build()(*args))
            np.save(WANT.format(stage), ref)
            print(f"{stage}: cpu truth saved", flush=True)
        else:
            ref = np.load(WANT.format(stage))
            with jax.enable_x64(False):
                dev = np.asarray(jax.block_until_ready(
                    jax.jit(build())(*args)))
            bad = int((dev != ref).sum())
            print(f"{stage}: device-vs-CPU exact={bad == 0} "
                  f"mismatches={bad}/{dev.size}", flush=True)
            if bad:
                idx = np.argwhere(dev != ref)[0]
                print(f"  first diff at {tuple(int(i) for i in idx)}: "
                      f"dev={dev[tuple(idx)]} ref={ref[tuple(idx)]}",
                      flush=True)
                break


if __name__ == "__main__":
    main()
