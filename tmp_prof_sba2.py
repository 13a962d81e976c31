import time, functools
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
from sba_tpu.optim import sba as S
from sba_tpu.optim.sba import SBAOptions, build_sba_problem, _warp_pair
from sba_tpu.ops.interpolation import (bilinear_sample2d_packed,
                                       bilinear_label_agreement_packed)
from sba_tpu.utils.synthetic import make_sba_scene

q, t, cam, depth, sem, q0, t0 = make_sba_scene(
    num_images=12, image_size=(192, 144), focal=180.0, pose_noise=0.01, seed=0)
opt = SBAOptions(pixel_step=2, mode="soft", max_iterations=10)
problem = build_sba_problem(jnp.asarray(q0, jnp.float32), jnp.asarray(t0, jnp.float32),
                            jnp.asarray(cam, jnp.float32), jnp.asarray(depth, jnp.float32),
                            jnp.asarray(sem, jnp.float32), opt, dtype=jnp.float32)
print("packed:", problem.depth_packed is not None, problem.label_packed is not None)
Q = problem.pair_src.shape[0]; S_ = problem.pix_xy.shape[0]

def timeit(name, fn, *args, n=30):
    out = fn(*args); jax.block_until_ready(out)
    t0_ = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0_)/n*1e3:8.2f} ms")
    return out

@jax.jit
def warp_only(qv, tv):
    def one(ps, pd):
        return _warp_pair(qv[ps], tv[ps], qv[pd], tv[pd],
                          problem.cam_params[ps], problem.cam_params[pd],
                          problem.pix_xy, problem.src_depth[ps])
    xy2, z2 = jax.vmap(one)(problem.pair_src, problem.pair_dst)
    return xy2.sum() + z2.sum()
timeit("warp only", warp_only, problem.qvecs, problem.tvecs)

@jax.jit
def warp_gather(qv, tv):
    def one(ps, pd):
        xy2, z2 = _warp_pair(qv[ps], tv[ps], qv[pd], tv[pd],
                             problem.cam_params[ps], problem.cam_params[pd],
                             problem.pix_xy, problem.src_depth[ps])
        d2 = bilinear_sample2d_packed(problem.depth_packed[pd], xy2, fill=-1e6)
        ag = bilinear_label_agreement_packed(problem.label_packed[pd], xy2,
                                             problem.src_label[ps], fill=0.0)
        return d2.sum() + ag.sum() + z2.sum()
    return jax.vmap(one)(problem.pair_src, problem.pair_dst).sum()
timeit("warp + 3 gathers", warp_gather, problem.qvecs, problem.tvecs)

res = jax.jit(functools.partial(S._all_residuals, problem=problem, opt=opt, soft=True))
timeit("full soft residuals", res, problem.qvecs, problem.tvecs)
