"""Roofline accounting for the fused VPU mega-kernels.

Traces the kernel body (_kernel_pipe) to a jaxpr with fake refs and tallies
every vector primitive, weighted by (elements / VPU width) x per-op cost
from the measured VPU cost model (_vpu_probe.py: i32 mul ~ 2x add; roll
measured separately).  Prints ops/product and the implied single-chip
ceiling at the measured VPU issue rate.

Modes:
  (default)   external-product headline config (N=2048, P=2)
  --gate      gate-bootstrap BR block-step config (N=1024, block-binary):
              ops per block step and the implied gates/s ceiling at
              n_lwe/block sequential steps per gate (VERDICT r5 item 2's
              roofline-proof arm)

Usage:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python _roofline_probe.py [--gate]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends import pallas_fused as pf
from poulpy_tpu.backends.pallas_ntt import _stage_twiddles, _stage_twiddles_shoup
from poulpy_tpu.hal.primes import R, PrimeBasis, ntt_primes

# headline config: N=2048, P=2 (28-bit lazy), ci=2, size_a=3, rows=3,
# co=2, psize=4, res_size=3, base2k=17
EXT_CONFIG = dict(n=2048, t_tile=8, cols=2, size_a=3, rmax=3, co=2, psize=4,
                  res_size=3, kr=17, ka=17, block=1, rotate=False,
                  add_acc=False, rot_mode=0, steps=1)

# gate-bootstrap BR block step (gates.GateParams defaults): N=1024, rank 1
# (cols=co=2), acc k_ct=34/base2k=17 -> size_a=res_size=2 so the gadget
# decomposition has rmax=2 rows (acc limbs, not the key's dnum=4),
# k_brk=68 -> psize=4, block-binary block=8, input-Montgomery rotate
# (rot_mode=2, the r5 default)
GATE_CONFIG = dict(n=1024, t_tile=8, cols=2, size_a=2, rmax=2, co=2, psize=4,
                   res_size=2, kr=17, ka=17, block=8, rotate=True,
                   add_acc=True, rot_mode=2, steps=1)

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


def trace_kernel(cfg, prime_bits=28, shoup=False):
    n, t_tile = cfg["n"], cfg["t_tile"]
    primes = ntt_primes(2, 1 << prime_bits)
    logn = n.bit_length() - 1
    P = len(primes)
    qinvs = tuple((-pow(p, -1, R)) % R for p in primes)
    ninvs = tuple(pf._ninv_triple(n, p) for p in primes)
    basis = PrimeBasis(primes)
    kk = cfg["cols"] * cfg["rmax"]
    mdim = cfg["co"] * cfg["psize"]
    tail = (n,)

    if shoup:
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

    blk_tot = cfg["block"] * cfg["steps"]

    def run(a, pm, xp):
        refs = [_Ref(a), _Ref(jnp.asarray(wf)), _Ref(jnp.asarray(wi)),
                _Ref(pm)]
        if cfg["rotate"]:
            refs.append(_Ref(xp))
        refs.append(_ORef())
        pf._kernel_pipe(
            n, logn, primes, qinvs, ninvs, basis,
            t_tile, cfg["cols"], cfg["size_a"], cfg["rmax"], cfg["co"],
            cfg["psize"], cfg["res_size"], cfg["kr"], cfg["ka"], 0,
            cfg["block"], cfg["rotate"], cfg["add_acc"], 0, 0,
            shoup, cfg["rot_mode"], cfg["steps"],
            *refs,
        )
        return out["v"]

    a = jax.ShapeDtypeStruct(
        (t_tile * cfg["cols"] * cfg["size_a"],) + tail, jnp.int32
    )
    pm = jax.ShapeDtypeStruct((P, blk_tot, kk, mdim) + tail, jnp.int32)
    if cfg["rot_mode"] == 1:
        xp = jax.ShapeDtypeStruct((P, blk_tot, 2, t_tile) + tail, jnp.int32)
    else:
        xp = jax.ShapeDtypeStruct((P, blk_tot, t_tile) + tail, jnp.int32)
    with jax.enable_x64(False):
        return jax.make_jaxpr(run)(a, pm, xp)


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
    if "--gate" in sys.argv:
        # BR block-step roofline: ops per step, then gates/s ceiling for
        # n_lwe=568 / block=8 = 71 sequential steps per gate (keyswitch +
        # extract excluded — they are < 3% of the measured gate budget)
        for n_lwe, block in ((568, 8), (576, 16), (576, 32)):
            cfg = dict(GATE_CONFIG, block=block, steps=1)
            jx = trace_kernel(cfg, 28, shoup=True)
            total, counts = tally(jx)
            per_step = total / cfg["t_tile"]
            nsteps = n_lwe // block
            print(f"--- BR block step (N={cfg['n']}, n_lwe={n_lwe}, "
                  f"block={block}, rot_mode={cfg['rot_mode']}) ---")
            print("  primitives:", dict(counts.most_common(12)))
            print(f"  weighted vreg-ops / block step: {per_step:,.0f}")
            print(f"  weighted vreg-ops / gate ({nsteps} steps): "
                  f"{per_step * nsteps:,.0f}")
            for rate_gops in (3.76, 1.88):
                print(f"  gates/s ceiling @ {rate_gops} Gvop/s: "
                      f"{rate_gops*1e9/(per_step*nsteps):,.0f}")
        return
    for shoup in (False, True):
        jx = trace_kernel(EXT_CONFIG, 28, shoup)
        total, counts = tally(jx)
        per_product = total / EXT_CONFIG["t_tile"]
        print(f"--- layout [{EXT_CONFIG['n']}] flat, "
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
