"""Slope-based phase timing: time fori_loop at 4 and 36 iterations, report
(t36-t4)/32 — cancels fixed per-call and per-iteration-constant overheads.
All chain bodies use explicit jnp.int32 constants (x64 is on; a bare python
literal can silently promote i32 arrays to emulated i64)."""
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
key = jax.random.PRNGKey(0)
ONE = jnp.int32(1)
C127 = jnp.int32(127)

def slope(label, body, x0, lo=4, hi=36):
    def mk(steps):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, steps, lambda i, v: body(v), x)
        return run
    rlo, rhi = mk(lo), mk(hi)
    jax.block_until_ready(rlo(x0)); jax.block_until_ready(rhi(x0))
    t0 = time.perf_counter(); jax.block_until_ready(rlo(x0))
    tlo = time.perf_counter() - t0
    t0 = time.perf_counter(); jax.block_until_ready(rhi(x0))
    thi = time.perf_counter() - t0
    dt = (thi - tlo) / (hi - lo)
    print(f"{label}: {dt*1e3:.3f} ms/iter (lo {tlo*1e3:.1f} hi {thi*1e3:.1f})")

# floor
z0 = jax.random.randint(key, (64, 128), 0, 100, dtype=jnp.int32)
slope("floor (tiny add)", lambda v: v + ONE, z0)

# fwd / inv whole
x0 = jnp.asarray(rng.integers(-(2**16), 2**16, size=(R, N), dtype=np.int64))
slope("fwd whole (R=1536)",
      lambda v: m4.mxu4_ntt_forward_limbs(t, v, 3)[:, 0, :].astype(jnp.int64)
                - jnp.int64(1 << 15), x0)
y0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(RM, N)) for p in t.basis.primes], 1
).astype(np.int32))
slope("inv whole (R=2048)",
      lambda v: jnp.minimum(m4.mxu4_ntt_inverse(t, v), v), y0)

# dotB plain 2D i8
a2 = jax.random.randint(key, (24576, 512), -128, 127, dtype=jnp.int8)
w2 = jax.random.randint(key, (512, 512), -128, 127, dtype=jnp.int8)
slope("dotB 2D i8 [24576,512]@[512,512]",
      lambda a: (jax.lax.dot_general(a, w2, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 & C127).astype(jnp.int8), a2)

# stepB einsum (current form in the lib)
da0 = jax.random.randint(key, (R, 4, P, 16, 128), -128, 127, dtype=jnp.int8)
slope("stepB einsum",
      lambda d: (jnp.einsum("rjpkn,npjkbl->rpkbl", d, m4.get_weights4(t).vb,
                            preferred_element_type=jnp.int32)
                 & C127).astype(jnp.int8).reshape(R, 4, P, 16, 128), da0)

# transpose i32
x5 = jax.random.randint(key, (RM, P, 16, 128), 0, 1 << 20, dtype=jnp.int32)
slope("swapaxes i32 [2048,2,16,128]",
      lambda v: jnp.swapaxes(v, -1, -2).reshape(RM, P, 16, 128) + ONE, x5)

# digitize
a0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(R, 16, 128)) for p in t.basis.primes], 1
).astype(np.int32))
slope("digitize(4) [R,P,16,128]",
      lambda a: a + (m4.digitize_planes(a, 4).astype(jnp.int32)
                     .sum(1, dtype=jnp.int32) >> jnp.int32(31)), a0)

# assemble
pa0 = jnp.asarray(rng.integers(-(2**21), 2**21, size=(R, P, 4, 16, 128),
                               dtype=np.int32))
slope("assemble [R,P,4,16,128]",
      lambda v: jnp.concatenate(
          [m4._assemble_ax(v, 2, t.p[:, None, None], t.qinv[:, None, None]
                           )[:, :, None]] * 4, 2).astype(jnp.int32), pa0)

# vmp + kernel B
vmpf = _vmp_fn(N, t.basis.primes, ci * rmax, M, 4)
pm = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(ci * rmax, M, N)) for p in t.basis.primes], 2
).reshape(ci * rmax, M, P * N).astype(np.int32))
av0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(B, ci * rmax, N)) for p in t.basis.primes], 2
).reshape(B, ci * rmax, P * N).astype(np.int32))
slope("vmp kernel",
      lambda a: jnp.minimum(vmpf(a, pm)[:, : ci * rmax, :], a), av0)

kb = _kernel_b_fn(N, t.basis.primes, psize, 0, res_size, 17, 17, 0, 8)
xg0 = jnp.asarray(np.stack(
    [rng.integers(0, p, size=(B * co * psize, N)) for p in t.basis.primes], 0
).astype(np.int32))
def kb_body(v):
    o = kb(v)
    o3 = jnp.abs(o.reshape(B * co, res_size, N))
    pad = jnp.concatenate([o3, o3[:, : psize - res_size, :]], 1)
    return jnp.broadcast_to(pad[None], (P, B * co, psize, N)).reshape(
        P, B * co * psize, N)
slope("kernel B", kb_body, xg0)


# fwd step A alone (digitize + dotA einsum + assemble), chained on residues
def fwdA(v):
    d = m4.digitize_planes(v.reshape(R, 16, 128), 3)
    pa = jnp.einsum("rimn,mipdk->rpdkn", d, m4.get_weights4(t).ua[:, :3],
                    preferred_element_type=jnp.int32)
    a = m4._assemble_ax(pa, 2, t.p[:, None, None], t.qinv[:, None, None])
    return a[:, 0].reshape(R, N).astype(jnp.int64) - jnp.int64(1 << 15)
slope("fwd stepA (dig+einsum+assemble)", fwdA, x0)

# assemble via int32 pair arithmetic instead of emulated i64
def asm32(v):
    lo_a = v[:, :, 0] + (v[:, :, 1] << jnp.int32(8))
    hi_a = v[:, :, 1] >> jnp.int32(24)
    # full (hi, lo) assembly in i32 pairs
    return jnp.concatenate([(lo_a + hi_a)[:, :, None]] * 4, 2).astype(jnp.int32)
slope("assemble-ish pure i32 (lower bound)", asm32, pa0)
