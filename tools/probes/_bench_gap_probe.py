"""Why did bench.py read 43.6k/s while _shoup_probe read 127k/s on the
same chip, same kernel, same shapes?  (RESOLVED: all three variants below
measure ~126-129k/s — the bench's slow readings were its checksum's
first execution paying a multi-second remote compile inside the timed
region; see bench.py's warmed-checksum comment.)

Times three variants at the headline config in ONE process:
  direct-indep — fused_glwe_product, same inputs each iter (the probe's
                 methodology)
  direct-chain — fused_glwe_product, output feeds next input (bench's
                 dependency structure, minus the wrapper)
  wrapper-chain— glwe_external_product chained (bench.py exactly)

Run: timeout 1700 env PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/probes/_bench_gap_probe.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.core import encryption as enc
from poulpy_tpu.core.external_product import glwe_external_product
from poulpy_tpu.core.layouts import GLWECiphertext, GLWEPlaintext
from poulpy_tpu.core.prepared import ggsw_prepare, glwe_secret_prepare
from poulpy_tpu.backends.pallas_fused import fused_glwe_product
from poulpy_tpu.hal import vec_znx
from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.source import Source

N, BASE2K, K_CT, K_KEY, DNUM = 2048, 17, 51, 68, 3
BATCH = int(os.environ.get("BENCH_BATCH", "16384"))
ITERS = 10


def main():
    m = get_module(N, 2, 28)
    src = Source(bytes(32))
    xe, xa = Source(b"\x01" * 32), Source(b"\x02" * 32)
    skp = glwe_secret_prepare(m, enc.secret_new(m, 1, src))
    data = np.random.default_rng(0).integers(
        -(2**15), 2**15, size=(BATCH, N), dtype=np.int64)
    pt = GLWEPlaintext(
        data=vec_znx.encode_vec_i64(BASE2K, 34, 3, jnp.asarray(data)),
        base2k=BASE2K, k=34)
    ct = enc.glwe_encrypt_sk(m, pt, skp, BASE2K, K_CT, xe, xa,
                             batch_shape=(BATCH,))
    ptg = np.zeros(N, dtype=np.int64)
    ptg[1] = 1
    ggswp = ggsw_prepare(m, enc.ggsw_encrypt_sk(
        m, jnp.asarray(ptg), skp, BASE2K, K_KEY, dnum=DNUM,
        source_xe=xe, source_xa=xa))
    res_size = ct.data.shape[-2]

    @jax.jit
    def direct(d, pm):
        return fused_glwe_product(m, d, pm, res_size, BASE2K, BASE2K)

    @jax.jit
    def wrapper(d, pm):
        a = GLWECiphertext(data=d, base2k=BASE2K, k=K_CT)
        return glwe_external_product(m, a, ggswp.replace(pmat=pm)).data

    for name, fn, chain in (("direct-indep", direct, False),
                            ("direct-chain", direct, True),
                            ("wrapper-chain", wrapper, True)):
        out = fn(ct.data, ggswp.pmat)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        x = out
        for _ in range(ITERS):
            x = fn(x if chain else ct.data, ggswp.pmat)
        jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        print(f"{name}: {BATCH * ITERS / dt:,.0f}/s  "
              f"({dt / ITERS * 1e3:.1f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
