import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.utils.timing import hard_sync
from multimodal_embedding_tpu.ops.fused_ln_matmul import fused_res_norm_matmul, _reference

def timeit(fn, *args, iters=20):
    out = fn(*args); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters

M, D, N = 36928, 1024, 3072
key = jax.random.key(0)
ks = jax.random.split(key, 6)
x = jax.random.normal(ks[0], (M, D), jnp.bfloat16)
delta = jax.random.normal(ks[1], (M, D), jnp.bfloat16)
gamma = jax.random.normal(ks[2], (D,), jnp.bfloat16)
beta = jax.random.normal(ks[3], (D,), jnp.bfloat16)
w = jax.random.normal(ks[4], (D, N), jnp.bfloat16) * 0.02
b = jax.random.normal(ks[5], (N,), jnp.bfloat16)

ref = jax.jit(lambda *a: _reference(*a, norm="ln", eps=1e-5, act=None))
t_ref = timeit(ref, x, delta, gamma, beta, w, b)
print(f"XLA ref (res+LN+matmul {M}x{D}x{N}): {t_ref*1e3:.3f} ms -> {2*M*D*N/t_ref/1e12:.1f} TFLOP/s", flush=True)

for bm, bn in [(512, 1024), (1024, 1024), (256, 1024), (512, 512), (1024, 512), (2048, 768), (1024, 3072)]:
    try:
        fn = jax.jit(lambda x_, d_, g_, be_, w_, b_, _bm=bm, _bn=bn: fused_res_norm_matmul(
            x_, d_, g_, be_, w_, b_, block_m=_bm, block_n=_bn))
        t = timeit(fn, x, delta, gamma, beta, w, b)
        print(f"kernel bm={bm} bn={bn}: {t*1e3:.3f} ms -> {2*M*D*N/t/1e12:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"kernel bm={bm} bn={bn}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
