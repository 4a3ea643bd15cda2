"""Bisect mxu4 forward cost + validate numerics on the real TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from poulpy_tpu.hal.module import get_module
from poulpy_tpu.hal.ntt import ntt_forward, to_residues
from poulpy_tpu.backends import mxu_ntt4 as m4

N, P = 2048, 2
m = get_module(N, P)
t = m.tables
w = m4.get_weights4(t)
rng = np.random.default_rng(0)

# ---- numeric check on TPU -------------------------------------------------
xs = jnp.asarray(rng.integers(-(2**16), 2**16, size=(4, N), dtype=np.int64))
got = np.asarray(jax.jit(lambda v: m4.mxu4_ntt_forward_limbs(t, v, 3))(xs))
want = np.asarray(jax.jit(lambda v: ntt_forward(t, to_residues(t, v)))(xs))
pi = m4.sigma_from_hal(t.basis.primes, N)
ok = np.array_equal(got, want[..., pi])
print("TPU numeric fwd check:", "BITEXACT" if ok else "MISMATCH",
      0 if ok else int(np.abs(got.astype(np.int64) - want[..., pi]).max()))

# ---- chained stage timings ------------------------------------------------
R = 1536
STEPS = 16

def chain(label, body, x0):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, STEPS, lambda i, v: body(v), x)
    o = run(x0); jax.block_until_ready(o)
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    print(f"{label}: {(time.perf_counter()-t0)/STEPS*1e3:.3f} ms/iter")

d0 = jnp.asarray(rng.integers(-128, 128, size=(R, 3, 16, 128), dtype=np.int8))
chain("stepA einsum alone",
      lambda d: jnp.einsum("rimn,mipdk->rpdkn", d, w.ua[:, :3],
                           preferred_element_type=jnp.int32)
                [:, 0, :3, :, :].transpose(0, 1, 3, 2).astype(jnp.int8)
                .reshape(R, 3, 128, 16).swapaxes(-1, -2), d0)

da0 = jnp.asarray(rng.integers(-128, 128, size=(R, 4, P, 16, 128), dtype=np.int8))
chain("stepB einsum alone",
      lambda d: jnp.einsum("rjpkn,npjkbl->rpkbl", d, w.vb,
                           preferred_element_type=jnp.int32)
                .astype(jnp.int8).reshape(R, 4, P, 16, 128), da0)

a0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(R, 16, 128)) for p in t.basis.primes], 1
).astype(np.int32))                                  # [R, P, k2, n1]
chain("mid: digitize(4)",
      lambda a: a + (m4.digitize_planes(a, 4).astype(jnp.int32).sum(1) >> 31),
      a0)

pa0 = jnp.asarray(rng.integers(-(2**21), 2**21, size=(R, P, 4, 16, 128),
                               dtype=np.int32))
chain("mid: assemble alone",
      lambda v: (m4._assemble_ax(v, 2, t.p[:, None, None],
                                 t.qinv[:, None, None])[:, :, None]
                 .repeat(4, 2) >> jnp.int32(1)), pa0)

x0 = jnp.asarray(rng.integers(-(2**16), 2**16, size=(R, N), dtype=np.int64))
chain("digitize(3) from i64",
      lambda v: v + (m4.digitize_planes(v.reshape(R, 16, 128), 3)
                     .astype(jnp.int32).sum(1).reshape(R, N) >> 31), x0)
