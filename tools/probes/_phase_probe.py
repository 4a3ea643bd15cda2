"""Phase-split timing of the mxu4 external product at bench shapes."""
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

R = B * ci * rmax          # 1536 forward rows
M = co * psize             # 8
RM = B * M                 # 2048 inverse rows

x = jnp.asarray(rng.integers(-(2**16), 2**16, size=(R, N), dtype=np.int64))
res = jnp.asarray(np.stack([rng.integers(0, p, size=(R, N)) for p in t.basis.primes], 1).astype(np.int32))
prod_in = jnp.asarray(np.stack([rng.integers(0, p, size=(RM, N)) for p in t.basis.primes], 1).astype(np.int32))
pm = jnp.asarray(np.stack([rng.integers(0, p, size=(ci*rmax, M, N)) for p in t.basis.primes], 2).reshape(ci*rmax, M, P*N).astype(np.int32))
xg = jnp.asarray(np.stack([rng.integers(0, p, size=(B*co*psize, N)) for p in t.basis.primes], 0).astype(np.int32))

def timeit(f, *args, iters=8):
    o = f(*args); jax.block_until_ready(o)
    # vary nothing structural; chain on first arg if possible
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(*args)
        args = (args[0],) + args[1:]
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

fwd = jax.jit(lambda v: m4.mxu4_ntt_forward_limbs(t, v, 3))
print("fwd  (R=1536):", f"{timeit(fwd, x)*1e3:.2f} ms")

inv = jax.jit(lambda v: m4.mxu4_ntt_inverse(t, v))
print("inv  (R=2048):", f"{timeit(inv, prod_in)*1e3:.2f} ms")

vmpf = _vmp_fn(N, t.basis.primes, ci*rmax, M, 4)
vmp = jax.jit(lambda a, pmm: vmpf(a.reshape(B, ci*rmax, P*N), pmm))
print("vmp:", f"{timeit(vmp, res.reshape(B, ci*rmax, P*N).astype(jnp.int32), pm)*1e3:.2f} ms")

kb = _kernel_b_fn(N, t.basis.primes, psize, 0, res_size, 17, 17, 0, 8)
kbj = jax.jit(lambda v: kb(v.reshape(P, B*co*psize, N)))
print("kernelB:", f"{timeit(kbj, xg)*1e3:.2f} ms")

# sub-phases of fwd
dig = jax.jit(lambda v: m4.digitize_last(v.reshape(-1, 16, 128), 3))
print("fwd digitize:", f"{timeit(dig, x)*1e3:.2f} ms")
w = m4.get_weights4(t)
d8 = dig(x)
ea = jax.jit(lambda d: jnp.einsum("rmni,mipdk->rnpdk", d, w.ua[:, :3], preferred_element_type=jnp.int32))
print("fwd stepA einsum:", f"{timeit(ea, d8)*1e3:.2f} ms")
pa = ea(d8)
from poulpy_tpu.backends.mxu_ntt import _assemble
asmA = jax.jit(lambda v: _assemble(v, t.p[:, None], t.qinv[:, None]))
print("fwd stepA assemble:", f"{timeit(asmA, pa)*1e3:.2f} ms")
a_res = asmA(pa)
digA = jax.jit(lambda v: m4.digitize_last(v, 4))
print("fwd mid digitize:", f"{timeit(digA, a_res)*1e3:.2f} ms")
da = digA(a_res)
eb = jax.jit(lambda d: jnp.einsum("rnpkj,npjkbl->rpkbl", d, w.vb, preferred_element_type=jnp.int32))
print("fwd stepB einsum:", f"{timeit(eb, da)*1e3:.2f} ms")
pb = eb(da)
asmB = jax.jit(lambda v: _assemble(v, t.p[:, None, None], t.qinv[:, None, None]))
print("fwd stepB assemble:", f"{timeit(asmB, pb)*1e3:.2f} ms")
