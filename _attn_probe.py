import time, jax, jax.numpy as jnp, numpy as np
from u2mkd_tpu.ops import wattn
from u2mkd_tpu.utils.jaxinit import setup_compilation_cache
from u2mkd_tpu.ops.precision import set_compute_dtype
setup_compilation_cache(); set_compute_dtype('bfloat16')

def timeit(f, *a, n=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3

V, h, d = 16384, 2, 16
rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(V, h, d).astype(np.float32) * 0.1)
xyz = jnp.asarray((rng.rand(V, 3) * 80 - 40).astype(np.float32))
valid = jnp.ones((V,), bool)
g = 24
quant = jnp.asarray(rng.randint(0, g, (V, 3)).astype(np.int32))
tq = jnp.asarray(rng.randn(2 * g - 1, 3, h, d).astype(np.float32) * 0.02)
tqs = jnp.asarray(rng.randn(2 * g, 3, h, d).astype(np.float32) * 0.02)

rpe_c = wattn.RPEParams(table_q=tq, table_k=tq, table_v=tq, quant=quant, grid_len=g)
def cub(q):
    return jnp.sum(wattn.sparse_window_attention(q, q, q, xyz, valid,
        (0.6, 0.6, 0.6), rpe=rpe_c, band=1, tile=128) ** 2)
print('cubic V=16k fwd+bwd ms:', round(timeit(jax.jit(jax.grad(cub)), q), 1), flush=True)

sph = wattn.cart2sphere(xyz)
rpe_s = wattn.RPEParams(table_q=tqs, table_k=tqs, table_v=tqs, quant=quant,
                        grid_len=g, r=sph[:, 2], a=0.0125)
def sphere(q):
    return jnp.sum(wattn.sparse_window_attention(q, q, q, sph, valid,
        (2.0, 2.0, 120.0), rpe=rpe_s, band=4, tile=128) ** 2)
print('sphere V=16k fwd+bwd ms:', round(timeit(jax.jit(jax.grad(sphere)), q), 1), flush=True)

def sphere_norpe(q):
    return jnp.sum(wattn.sparse_window_attention(q, q, q, sph, valid,
        (2.0, 2.0, 120.0), band=4, tile=128) ** 2)
print('sphere no-RPE ms:', round(timeit(jax.jit(jax.grad(sphere_norpe)), q), 1), flush=True)
