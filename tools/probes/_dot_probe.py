"""Chained (honest) timings of candidate int8 contraction forms at dotB shape."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
STEPS = 16

def chain(label, body, x0, macs):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, STEPS, lambda i, v: body(v), x)
    o = run(x0); jax.block_until_ready(o)
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{label}: {dt*1e3:.3f} ms  {2*macs/dt/1e12:.1f} eff Tops")

R, K, L, Bt = 24576, 512, 512, 32

# 1. plain 2D i8 dot (dotB shape, weights shared)
w2 = jax.random.randint(key, (K, L), -128, 127, dtype=jnp.int8)
a2 = jax.random.randint(key, (R, K), -128, 127, dtype=jnp.int8)
chain("plain 2D i8 [24576,512]@[512,512]",
      lambda a: (jax.lax.dot_general(a, w2, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 & 127).astype(jnp.int8),
      a2, R * K * L)

# 2. canonical batched i8 dot (batch leading, contraction minor both sides)
wb = jax.random.randint(key, (Bt, K, L), -128, 127, dtype=jnp.int8)
ab = jax.random.randint(key, (Bt, R // Bt, K), -128, 127, dtype=jnp.int8)
chain("batched i8 [32][768,512]@[512,512]",
      lambda a: (jax.lax.dot_general(a, wb, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.int32)
                 & 127).astype(jnp.int8),
      ab, R * K * L)

# 3. plain 2D, i8 lhs but int32 rhs (mixed)
w32 = w2.astype(jnp.int32)
chain("2D i8xi32",
      lambda a: (jax.lax.dot_general(a, w32, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 & 127).astype(jnp.int8),
      a2, R * K * L)

# 4. dotA shape: [196608, 48] @ [48, 256]
aA = jax.random.randint(key, (196608, 48), -128, 127, dtype=jnp.int8)
wA = jax.random.randint(key, (48, 256), -128, 127, dtype=jnp.int8)
chain("dotA 2D i8 [196608,48]@[48,256]",
      lambda a: (jax.lax.dot_general(a, wA, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 & 127).astype(jnp.int8)[:, :48],
      aA, 196608 * 48 * 256)

# 5. transpose cost: [R', P, k2, n1] i32 -> [R', P, n1, k2]
x5 = jax.random.randint(key, (2048, 2, 16, 128), 0, 1 << 20, dtype=jnp.int32)
chain("transpose i32 [2048,2,16,128]<->[...,128,16]",
      lambda v: jnp.swapaxes(v, -1, -2).reshape(2048, 2, 16, 128) + 1,
      x5, 1)
