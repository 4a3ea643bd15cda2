"""Trustworthy phase timings (fori_loop-chained; identical-args calls get
deduped somewhere in the axon stack, so naive repeat-timing lies)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.hal.module import get_module
from poulpy_tpu.backends import mxu_ntt4 as m4
from poulpy_tpu.backends.pallas_vmp import _vmp_fn
from poulpy_tpu.backends.pallas_fused import _kernel_b_fn

N, P, B = 2048, 2, 256
ci, rmax, co, psize, res_size = 2, 3, 2, 4, 3
m = get_module(N, P)
t = m.tables
rng = np.random.default_rng(0)
R = B * ci * rmax
M = co * psize
RM = B * M
STEPS = 16

def chain(label, body, x0):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, STEPS, lambda i, v: body(v), x)
    o = run(x0); jax.block_until_ready(o)
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label}: {dt*1e3:.3f} ms/iter")

x0 = jnp.asarray(rng.integers(-(2**16), 2**16, size=(R, N), dtype=np.int64))
chain("fwd whole (R=1536)",
      lambda v: m4.mxu4_ntt_forward_limbs(t, v, 3)[:, 0, :].astype(jnp.int64)
                - (1 << 15), x0)

y0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(RM, N)) for p in t.basis.primes], 1
).astype(np.int32))
chain("inv whole (R=2048)",
      lambda v: jnp.minimum(m4.mxu4_ntt_inverse(t, v), v), y0)

chain("digitize(3) i32",
      lambda v: v + m4.digitize_planes(v.reshape(R, 16, 128), 3)
                .astype(jnp.int64).sum(1).reshape(R, N) * 0, x0)

vmpf = _vmp_fn(N, t.basis.primes, ci * rmax, M, 4)
pm = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(ci * rmax, M, N)) for p in t.basis.primes], 2
).reshape(ci * rmax, M, P * N).astype(np.int32))
av0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(B, ci * rmax, N)) for p in t.basis.primes], 2
).reshape(B, ci * rmax, P * N).astype(np.int32))
chain("vmp kernel",
      lambda a: jnp.minimum(vmpf(a, pm)[:, : ci * rmax, :], a), av0)

kb = _kernel_b_fn(N, t.basis.primes, psize, 0, res_size, 17, 17, 0, 8)
xg0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(B * co * psize, N)) for p in t.basis.primes], 0
).astype(np.int32))
def kb_body(v):
    o = kb(v)                                  # [B*co*res_size, N] i32
    o3 = jnp.abs(o.reshape(B * co, res_size, N))
    pad = jnp.concatenate([o3, o3[:, : psize - res_size, :]], 1)
    return jnp.broadcast_to(pad[None], (P, B * co, psize, N)).reshape(
        P, B * co * psize, N)
chain("kernel B", kb_body, xg0)
