"""Roofline accounting for the fused external-product mega-kernel.

Traces the kernel body (_kernel_pipe) to a jaxpr with fake refs and tallies
every vector primitive, weighted by (elements / VPU width) x per-op cost
from the measured VPU cost model (_vpu_probe.py: i32 mul ~ 2x add; roll
measured separately).  Prints ops/ext-product and the implied single-chip
ceiling at the measured VPU issue rate.

Usage:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python _roofline_probe.py
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import functools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends import pallas_fused as pf
from poulpy_tpu.backends.pallas_ntt import _stage_twiddles
from poulpy_tpu.hal.primes import R, PrimeBasis, ntt_primes

# headline config: N=2048, P=2 (28-bit lazy), ci=2, size_a=3, rows=3,
# co=2, psize=4, res_size=3, base2k=17
N = 2048
T_TILE = 8
CONFIG = dict(cols=2, size_a=3, rmax=3, co=2, psize=4, res_size=3,
              kr=17, ka=17)

# measured VPU cost weights in "add-equivalent 8x128-register ops"
# (from _vpu_probe.py slopes on the v5e chip; see BENCH_NOTES.md)
WEIGHTS = {
    "mul": 2.0,
    "add": 1.0, "sub": 1.0, "and": 1.0, "or": 1.0, "xor": 1.0,
    "shift_left": 1.0, "shift_right_arithmetic": 1.0,
    "shift_right_logical": 1.0,
    "select_n": 1.0, "lt": 1.0, "le": 1.0, "gt": 1.0, "ge": 1.0, "eq": 1.0,
    "ne": 1.0, "min": 1.0, "max": 1.0,
    "convert_element_type": 0.5, "iota": 0.5,
    "dynamic_slice": 0.0, "slice": 0.0, "squeeze": 0.0, "reshape": 0.0,
    "broadcast_in_dim": 0.0, "concatenate": 0.5,
    "tpu_roll": 2.0,       # 128-lane rotate: ~1-2 register ops
    "roll": 2.0,
}
LANES = 1024  # one (8, 128) vreg


class _Ref:
    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]


def trace_kernel(n, prime_bits=28, sl=True, shoup=False):
    primes = ntt_primes(2, 1 << prime_bits)
    logn = n.bit_length() - 1
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(pow(n, -1, p) * R % p for p in primes)
    basis = PrimeBasis(primes)
    c = CONFIG
    kk = c["cols"] * c["rmax"]
    mdim = c["co"] * c["psize"]
    tail = (n // 128, 128) if sl else (n,)

    if shoup:
        from poulpy_tpu.backends.pallas_ntt import _stage_twiddles_shoup

        wf = _stage_twiddles_shoup(primes, n, False, P).reshape(
            (logn, 2, P) + tail)
        wi = _stage_twiddles_shoup(primes, n, True, P).reshape(
            (logn, 2, P) + tail)
    else:
        wf = _stage_twiddles(primes, n, False, P).reshape((logn, P) + tail)
        wi = _stage_twiddles(primes, n, True, P).reshape((logn, P) + tail)

    out = {}

    class _ORef:
        def __setitem__(self, idx, v):
            out["v"] = v

    def run(a, pm):
        pf._kernel_pipe(
            n, logn, primes, qinvs, ninvs, basis,
            T_TILE, c["cols"], c["size_a"], c["rmax"], c["co"], c["psize"],
            c["res_size"], c["kr"], c["ka"], 0, 1, False, False, 0, 0,
            shoup,
            _Ref(a), _Ref(jnp.asarray(wf)), _Ref(jnp.asarray(wi)),
            _Ref(pm), _ORef(),
        )
        return out["v"]

    a = jax.ShapeDtypeStruct(
        (T_TILE * c["cols"] * c["size_a"],) + tail, jnp.int32
    )
    pm = jax.ShapeDtypeStruct((P, 1, kk, mdim) + tail, jnp.int32)
    with jax.enable_x64(False):
        return jax.make_jaxpr(run)(a, pm)


def tally(jaxpr):
    """Weighted vreg-op count over all equations (recursing into calls)."""
    total = 0.0
    counts = Counter()

    def visit(jx):
        nonlocal total
        for eqn in jx.eqns:
            name = eqn.primitive.name
            has_sub = False
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    visit(sub.jaxpr)
                    has_sub = True
            if has_sub:
                continue  # call eqn: cost counted inside
            elems = max(
                (int(np.prod(v.aval.shape)) for v in eqn.outvars
                 if hasattr(v.aval, "shape")),
                default=0,
            )
            w = WEIGHTS.get(name)
            if w is None:
                w = 1.0
                counts[f"?{name}"] += 1
            total += w * elems / LANES
            counts[name] += 1

    visit(jaxpr.jaxpr)
    return total, counts


def main():
    for sl, shoup in ((False, False), (False, True)):
        jx = trace_kernel(N, 28, sl, shoup)
        total, counts = tally(jx)
        per_product = total / T_TILE
        print(f"--- layout [{N}] flat, "
              f"{'Shoup' if shoup else 'Montgomery'} butterflies ---")
        top = counts.most_common(12)
        print("  primitives:", dict(top))
        print(f"  weighted vreg-ops / ext-product: {per_product:,.0f}")
        # v5e VPU: 8 lanes x 128 sublanes x 4 ALUs @ 940 MHz
        for rate_gops in (3.76, 1.88):
            print(f"  ceiling @ {rate_gops} Gvop/s: "
                  f"{rate_gops*1e9/per_product/1e3:,.0f}k ext-products/s")


if __name__ == "__main__":
    main()
