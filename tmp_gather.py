import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

rng = np.random.default_rng(0)
N, HW = 12, 27648
Q, S = 132, 6912
table = jnp.asarray(rng.integers(0, 2**31, size=(N, HW)), jnp.uint32)
flat = table.reshape(-1)
idx_qs = jnp.asarray(rng.integers(0, HW, size=(Q, S)), jnp.int32)
pair_dst = jnp.asarray(rng.integers(0, N, size=(Q,)), jnp.int32)

def timeit(name, fn, *args, n=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")

# 1: flat global gather [Q*S] from [N*HW]
@jax.jit
def g_flat(idx, dst):
    gidx = (dst[:, None] * HW + idx).reshape(-1)
    return jnp.take(flat, gidx).sum()
timeit("flat take 912k from 330k", g_flat, idx_qs, pair_dst)

# 2: vmap over pairs: take from table[dst]
@jax.jit
def g_vmap(idx, dst):
    def one(d, ix):
        return jnp.take(table[d], ix)
    return jax.vmap(one)(dst, idx).sum()
timeit("vmap take (per-pair map)", g_vmap, idx_qs, pair_dst)

# 3: same but table resident as [N, HW] indexed with 2D gather
@jax.jit
def g_2d(idx, dst):
    return table[dst[:, None], idx].sum()
timeit("2d advanced-index gather", g_2d, idx_qs, pair_dst)

# 4: f32 flat gather for comparison
flat_f = flat.astype(jnp.float32)
@jax.jit
def g_f32(idx, dst):
    gidx = (dst[:, None] * HW + idx).reshape(-1)
    return jnp.take(flat_f, gidx).sum()
timeit("flat f32 take", g_f32, idx_qs, pair_dst)
