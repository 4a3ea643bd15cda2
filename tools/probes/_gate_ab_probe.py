"""Same-process gate-bootstrap A/B over (rot_shoup, steps) (r5 item 2).

Cross-process gate readings drift (r4 noted an unexplained +25% between
sessions), so this measures all kernel variants in ONE process with
shared keys: env knobs are read at trace time, and each variant gets its
own jit trace (the jitted blind rotation cache is cleared between).
NAND truth-table asserted per variant.

Run:      timeout 3000 python tools/probes/_gate_ab_probe.py
Blocks:   timeout 3000 python tools/probes/_gate_ab_probe.py --blocks
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)


def _measure(params, variants):
    from poulpy_tpu.binfhe import gates
    from poulpy_tpu.hal.source import Source

    keys, sk = gates.keygen(params)
    xe, xa = Source(b"\x05" * 32), Source(b"\x06" * 32)
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    b1 = np.random.default_rng(0).integers(0, 2, batch)
    b2 = np.random.default_rng(1).integers(0, 2, batch)
    c1 = gates.encrypt_bit(params, b1, sk, xe, xa)
    c2 = gates.encrypt_bit(params, b2, sk, xe, xa)

    for rs, steps in variants:
        os.environ["POULPY_TPU_ROT_MODE"] = str(rs)
        os.environ["POULPY_TPU_BR_STEPS"] = str(steps)
        import poulpy_tpu.binfhe.blind_rotation as br

        br.blind_rotation_execute_block.clear_cache()
        out = gates.gate_nand(keys, c1, c2)
        jax.block_until_ready(out.data)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = gates.gate_nand(keys, c1, c2)
        jax.block_until_ready(out.data)
        dt = time.perf_counter() - t0
        got = gates.decrypt_bit(out, sk)
        ok = np.array_equal(got, 1 - (b1 & b2))
        print(f"n_lwe={params.n_lwe} block={params.block_size} "
              f"rot_mode={rs} steps={steps}: "
              f"{batch * iters / dt:.1f} gates/s  "
              f"truth={'OK' if ok else 'WRONG'}", flush=True)
        assert ok


def main():
    from poulpy_tpu.binfhe import gates

    if "--blocks" in sys.argv:
        # block_size sweep (VERDICT r5 item 2).  SECURITY NOTE: block-
        # binary secrets carry log2(b+1)/b bits of entropy per coefficient,
        # so larger blocks need more n_lwe for equal security — these rows
        # chart the THROUGHPUT axis at comparable n_lwe, not equal-security
        # parameterizations (the reference's own example ships b=7).
        for n_lwe, block in [(568, 8), (576, 16), (576, 32)]:
            _measure(
                gates.GateParams(n_lwe=n_lwe, block_size=block), [(2, 2)]
            )
        return
    # (0,1)/(1,1)/(0,2)/(1,2) measured 2026-08-21: 1719.8 / 1842.7 /
    # 1884.8 / 1808.8 gates/s (BENCH_NOTES r5 gate A/B).  Remaining
    # question: input-Montgomery (mode 2, single-plane table) composed
    # with steps, and deeper step chains.
    _measure(gates.GateParams(n_lwe=568, block_size=8),
             [(0, 2), (2, 2), (2, 4), (0, 4)])


if __name__ == "__main__":
    main()
