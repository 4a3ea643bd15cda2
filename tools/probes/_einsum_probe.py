"""Which int8 contraction forms hit the MXU through the axon tunnel?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
key = jax.random.PRNGKey(0)

def timeit(f, *args, iters=16):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

R, K, L, Bt = 1536, 512, 512, 32
a2 = jax.random.randint(key, (Bt, R, K), -128, 127, dtype=jnp.int8)
w2 = jax.random.randint(key, (Bt, K, L), -128, 127, dtype=jnp.int8)
macs = Bt * R * K * L

# 1. batched dot_general int8
f1 = jax.jit(lambda a, w: jax.lax.dot_general(
    a, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32))
dt = timeit(f1, a2, w2)
print(f"batched dot i8 [32x1536x512]@[32x512x512]: {dt*1e3:.3f} ms  {2*macs/dt/1e12:.1f} Tops")

# 2. same as bf16
a2b = a2.astype(jnp.bfloat16); w2b = w2.astype(jnp.bfloat16)
f2 = jax.jit(lambda a, w: jax.lax.dot_general(
    a, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32))
dt = timeit(f2, a2b, w2b)
print(f"batched dot bf16: {dt*1e3:.3f} ms  {2*macs/dt/1e12:.1f} Tflops")

# 3. flat 2D dot i8 (weights shared) for the same MAC count
af = jax.random.randint(key, (Bt * R, K), -128, 127, dtype=jnp.int8)
wf = jax.random.randint(key, (K, L), -128, 127, dtype=jnp.int8)
f3 = jax.jit(lambda a, w: jax.lax.dot_general(
    a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
dt = timeit(f3, af, wf)
print(f"flat 2D dot i8 [49152,512]@[512,512]: {dt*1e3:.3f} ms  {2*macs/dt/1e12:.1f} Tops")

# 4. the actual step-B einsum form
n1, P, n2, D = 128, 2, 16, 4
da = jax.random.randint(key, (1536, n1, P, n2, D), -128, 127, dtype=jnp.int8)
vb = jax.random.randint(key, (n1, P, D, n2, D, n1), -128, 127, dtype=jnp.int8)
f4 = jax.jit(lambda d, v: jnp.einsum("rnpkj,npjkbl->rpkbl", d, v,
                                     preferred_element_type=jnp.int32))
dt = timeit(f4, da, vb)
macs4 = 1536 * P * n2 * D * n1 * (n1 * D)
print(f"stepB einsum: {dt*1e3:.3f} ms  {2*macs4/dt/1e12:.1f} Tops")

# 5. step-A einsum form
d0 = jax.random.randint(key, (1536, n2, n1, 3), -128, 127, dtype=jnp.int8)
ua = jax.random.randint(key, (n2, 3, P, D, n2), -128, 127, dtype=jnp.int8)
f5 = jax.jit(lambda d, u: jnp.einsum("rmni,mipdk->rnpdk", d, u,
                                     preferred_element_type=jnp.int32))
dt = timeit(f5, d0, ua)
macs5 = 1536 * n1 * P * D * n2 * (n2 * 3)
print(f"stepA einsum: {dt*1e3:.3f} ms  {2*macs5/dt/1e12:.1f} Tops")

# 6. i32 versions (is int8 the problem or the einsum shape?)
f6 = jax.jit(lambda d, v: jnp.einsum("rnpkj,npjkbl->rpkbl",
                                     d.astype(jnp.int32), v.astype(jnp.int32),
                                     preferred_element_type=jnp.int32))
dt = timeit(f6, da, vb)
print(f"stepB einsum i32: {dt*1e3:.3f} ms  {2*macs4/dt/1e12:.1f} Tops")
