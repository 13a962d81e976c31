import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

P, K = 30_000, 7
O = P * K
key = jax.random.PRNGKey(0)
Jx = jax.random.normal(key, (O, 2, 3), jnp.float32)
N = 128
oi = jax.random.randint(key, (O,), 0, N)


def scan_reps(fn, reps, arg):
    def wrapped(a):
        def body(c, _):
            return fn(a, c), None

        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    return jax.jit(wrapped)


def timeit(name, fn, arg, reps=20):
    f = scan_reps(fn, reps, arg)
    out = f(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(arg)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms/op")


def red_obs_last(a, c):
    # [O, 2, 3] einsum -> [O, 3, 3], reduce point-major by reshape.
    J = a + c * 1e-12
    H = jnp.einsum("oki,okj->oij", J, J)         # [O, 3, 3]
    Hp = H.reshape(P, K, 3, 3).sum(1)            # [P, 3, 3]
    return jnp.sum(Hp)


def red_obs_lanes(a, c):
    # Same math with O kept LAST (lanes): [3, 3, O] -> [3, 3, P].
    J = a + c * 1e-12
    H = jnp.einsum("oki,okj->ijo", J, J)         # [3, 3, O]
    Hp = H.reshape(3, 3, P, K).sum(-1)           # [3, 3, P]
    return jnp.sum(Hp)


def red_pre_transposed(a, c):
    # Input pre-transposed to [2, 3, O] as well.
    Jt = jnp.moveaxis(a, 0, -1)                  # [2, 3, O] (traced once)
    J = Jt + c * 1e-12
    H = jnp.einsum("kio,kjo->ijo", J, J)
    Hp = H.reshape(3, 3, P, K).sum(-1)
    return jnp.sum(Hp)


def onehot_img_obs_last(a, c):
    J = a + c * 1e-12
    v = jnp.einsum("oki,okj->oij", J, J).reshape(O, 9)
    onehot = (oi[:, None] == jnp.arange(N)[None, :]).astype(jnp.float32)
    return jnp.sum(jnp.einsum("on,od->nd", onehot, v))


def onehot_img_lanes(a, c):
    J = a + c * 1e-12
    v = jnp.einsum("oki,okj->ijo", J, J).reshape(9, O)
    onehot = (oi[None, :] == jnp.arange(N)[:, None]).astype(jnp.float32)
    return jnp.sum(jnp.einsum("no,do->nd", onehot, v))


timeit("pts reduce, obs-first [O,3,3]", red_obs_last, Jx)
timeit("pts reduce, obs-last [3,3,O]", red_obs_lanes, Jx)
timeit("pts reduce, pre-transposed", red_pre_transposed, Jx)
timeit("img onehot, obs-first", onehot_img_obs_last, Jx)
timeit("img onehot, obs-last", onehot_img_lanes, Jx)
