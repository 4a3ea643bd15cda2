"""VPU i32 op cost model probe: time chains of (a) adds, (b) multiplies,
(c) mont_mul_i32_lazy, (d) pltpu.roll, (e) full 32x30 product as (hi,lo)
pair + add64, inside one Pallas kernel.  Slope method: iterations 8 vs 72,
(t72-t8)/64 cancels fixed overheads.  Shapes match the mega-kernel's VMP
working set ([64, 2048] i32 rows)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.backends.pallas_fused import _add64, _mul_d30_w64
from poulpy_tpu.backends.pallas_ntt import mont_mul_i32_lazy, MASK15

ROWS, N = 256, 2048
P = 268369921  # < 2^28
QINV = (-pow(P, -1, 1 << 30)) % (1 << 30)


def body(kind, iters, x_ref, y_ref, o_ref):
    x = x_ref[...]
    y = y_ref[...]
    p = jnp.int32(P)
    qinv = jnp.int32(QINV)
    if kind == "add":
        for _ in range(iters):
            x = x + y
            y = y + x
    elif kind == "mul":
        for _ in range(iters):
            x = x * y + 1
            y = y * x + 1
    elif kind == "mont":
        for _ in range(iters):
            x = mont_mul_i32_lazy(x & jnp.int32((1 << 29) - 1), y & jnp.int32(P - 1), p, qinv)
            x, y = y, x
    elif kind == "roll":
        for i in range(iters):
            x = x + pltpu.roll(y, jnp.int32(64), axis=1)
            y = y + pltpu.roll(x, jnp.int32(1024), axis=1)
    elif kind == "pair":
        # full 32x30 product (a<2^30, b<2^28) as (hi,lo) + accumulate
        hi = jnp.zeros_like(x)
        lo = jnp.zeros_like(x)
        for _ in range(iters):
            a = x & jnp.int32((1 << 30) - 1)
            b = y & jnp.int32(P - 1)
            a0 = a & MASK15; a1 = a >> 15
            b0 = b & MASK15; b1 = b >> 15
            p00 = a0 * b0
            mid = a0 * b1 + a1 * b0
            p11 = a1 * b1
            ph, plo = _add64(mid >> 17, mid << 15, p11 >> 2, p11 << 30)
            ph, plo = _add64(ph, plo, jnp.zeros_like(p00), p00)
            hi, lo = _add64(hi, lo, ph, plo)
            x, y = y, x + lo
        x = x + hi + lo
    o_ref[...] = x + y


@functools.lru_cache(maxsize=None)
def make(kind, iters):
    kernel = functools.partial(body, kind, iters)

    def fn(x, y):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(x, y)

    return jax.jit(fn)


def timeit(f, *args, reps=15):
    o = f(*args); jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 28, (ROWS, N)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 1 << 27, (ROWS, N)).astype(np.int32))
    lo_i, hi_i = 8, 264
    for kind in ("add", "mul", "mont", "roll", "pair"):
        t_lo = timeit(make(kind, lo_i), x, y)
        t_hi = timeit(make(kind, hi_i), x, y)
        per = (t_hi - t_lo) / (hi_i - lo_i)
        # ns per element-op (two ops per iteration for add/mul/roll)
        nper = 2 if kind in ("add", "mul", "roll") else 1
        print(f"{kind:5s}: {per*1e6:8.2f} us/iter  "
              f"{per/(ROWS*N*nper)*1e12:7.2f} ps/elem-op")


if __name__ == "__main__":
    main()
