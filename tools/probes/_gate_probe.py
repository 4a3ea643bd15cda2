"""Gate-bootstrap optimization A/B on the real chip (r5 item 2).

Measures NAND gate-bootstraps/s at the bench_full config for:
  1. rot_shoup=0 — r4 kernel (output-side Montgomery (X^a−1) on the mdim
     VMP output rows)
  2. rot_shoup=1 — r5 kernel (input-side Shoup (X^a−1) on the kk VMP input
     rows: fewer rows AND 6 muls vs 11 per product)
  3. batch sweep at the winner

Each variant runs in THIS process (env set before first trace); results
are bit-checked via gates.decrypt (the NAND truth table assert inside
bench_gate_bootstrap).

Run: timeout 1700 python tools/probes/_gate_probe.py [--sweep]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def run(batch):
    import bench_full

    return bench_full.bench_gate_bootstrap(batch=batch)


def main():
    mode = os.environ.get("POULPY_TPU_ROT_MODE", "2")
    print(f"rot_mode={mode}")
    if "--sweep" in sys.argv:
        for b in (1024, 2048, 4096):
            print(f"batch={b}: {run(b):.1f} gates/s", flush=True)
    else:
        print(f"batch=1024: {run(1024):.1f} gates/s")


if __name__ == "__main__":
    main()
