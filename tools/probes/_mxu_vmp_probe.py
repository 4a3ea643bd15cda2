"""MXU-VMP probe (VERDICT r5 item 1): can an int8 MXU contraction beat the
VPU mega-kernel at the headline external-product shapes?

The VMP is pointwise in N (NTT evaluation domain): out[t,m,n] =
Σ_k a[t,k,n]·pm[k,m,n].  A systolic matmul needs its weights to be
invariant along one hardware axis, but pm varies in ALL of (k, m, n) — so
the only MXU mappings are:

  (a) coefficient-domain negacirculant matmul (contract along N, skipping
      the NTT entirely): out[t,m] = Σ_k Negacirc(pm_coeff[k,m]) · a[t,k].
      Cost model at N=2048, KK=6, M=8, 17-bit limbs → 3×3 int8 digit
      pairs: 9 · KK·M·N² = 1.81G int8 MACs per product = 3.62G ops.
      At the v5e's 394 int8 TOPS peak that is 9.2 µs — PARITY with the
      measured 8.4-9.4 µs VPU kernel only at impossible 100% MFU.  This
      probe MEASURES the achievable rate at exactly these shapes to make
      the bound empirical.  Independent kill: the prepared key inflates
      N× (786 KB → ~600 MB per GGSW; a 568-key BRK would be ~340 GB).

  (b) transform-stage matmuls (the existing fused-MXU kernel) — measured
      slower than the VPU at every config (BENCH_NOTES 2026-08-21
      crossover: 1.47-1.95× behind).

  (c) f32/12-bit-digit transform (ROADMAP open idea): KILLED by exactness
      arithmetic, no probe needed — a 12-bit×12-bit digit product is 24
      bits; accumulating 32-64 four-step terms needs 29-30 bits, past
      f32's 24-bit exact-integer window (bf16 inputs: 8-bit digits → 16-bit
      products + 11-bit accumulation = 27 bits, same kill).  Exact digit
      width d must satisfy 2d + log2(contraction) ≤ 24 → d ≤ 6 at the
      four-step's 64-term contraction — 5 digits/operand, 25 digit pairs
      at ≤¼ the int8 rate: strictly worse than (b).

Run on the TPU chip:
  timeout 1700 python tools/probes/_mxu_vmp_probe.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

KK, M, N = 6, 8, 2048          # headline config: ci·rmax, co·psize, ring


def bench_dot(bt, k, mo, dtype=jnp.int8, iters=20):
    """One XLA dot at the negacirculant shapes: [bt, k] × [k, mo] → i32.
    XLA picks its own MXU tiling — an upper bound on what any hand
    placement reaches."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-64, 64, size=(bt, k)), dtype=dtype)
    w = jnp.asarray(rng.integers(-64, 64, size=(k, mo)), dtype=dtype)

    @jax.jit
    def f(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    out = jax.block_until_ready(f(a, w))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(a, w)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ops = 2.0 * bt * k * mo * iters
    return ops / dt / 1e12, int(np.asarray(out[0, 0]))


def main():
    print(f"backend: {jax.default_backend()}")
    rows = []
    # the negacirculant contraction: A [B, KK·N] × W [KK·N, M·N] per digit
    # pair; tile the M·N output dim to keep W in a streamable block
    for bt, k, mo, tag in [
        (1024, KK * N, 2048, "negacirc tile (B=1024, out-tile 2048)"),
        (4096, KK * N, 2048, "negacirc tile (B=4096)"),
        (4096, KK * N, 8192, "negacirc tile (B=4096, out-tile 8192)"),
        (8192, 8192, 8192, "square reference (8k³)"),
    ]:
        tops, cs = bench_dot(bt, k, mo)
        rows.append((tag, bt, k, mo, tops))
        print(f"{tag}: [{bt},{k}]x[{k},{mo}] int8 -> {tops:.1f} TOPS "
              f"(cs={cs})")

    best = max(r[-1] for r in rows)
    macs_per_product = 9 * KK * M * N * N        # 3x3 digit pairs
    us = 2.0 * macs_per_product / (best * 1e12) * 1e6
    print(f"\nbest measured int8 rate: {best:.1f} TOPS "
          f"(peak 394); negacirculant VMP needs {macs_per_product/1e6:.0f}M "
          f"MACs/product -> {us:.1f} us/product at the MEASURED rate")
    print("VPU mega-kernel measured: 8.4-9.4 us/product (BENCH_NOTES)")
    print(f"verdict: negacirculant-MXU {'LOSES' if us > 9.4 else 'WINS'} "
          f"on compute alone; prepared-key inflation (786 KB -> "
          f"{KK*M*N*N*3/1e6:.0f} MB int8 digits per GGSW) kills it for "
          f"blind rotation regardless")


if __name__ == "__main__":
    main()
