import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.utils.timing import hard_sync
from multimodal_embedding_tpu.ops.fused_ln_matmul import fused_res_norm_matmul, _reference

M, D, N = 36928, 1024, 3072
ITERS = 24
ks = jax.random.split(jax.random.key(0), 6)
x = jax.random.normal(ks[0], (M, D), jnp.bfloat16)
delta = jax.random.normal(ks[1], (M, D), jnp.bfloat16) * 0.1
gamma = jax.random.normal(ks[2], (D,), jnp.bfloat16)
beta = jax.random.normal(ks[3], (D,), jnp.bfloat16)
w = jax.random.normal(ks[4], (D, N), jnp.bfloat16) * 0.02
b = jax.random.normal(ks[5], (N,), jnp.bfloat16)

def loop(op):
    def body(carry, _):
        x_, d_ = carry
        xn, y = op(x_, d_, gamma, beta, w, b)
        # feed a slice of y back so iterations are dependent (no DCE/overlap)
        return (xn, y[:, :D].astype(x_.dtype) * 0.01), None
    def fn(x_, d_):
        (xa, da), _ = jax.lax.scan(body, (x_, d_), None, length=ITERS)
        return xa, da
    return jax.jit(fn)

def timeit(fn):
    out = fn(x, delta); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(x, delta)
    hard_sync(out)
    return (time.perf_counter() - t0) / 3 / ITERS

ref_fn = loop(lambda *a: _reference(*a, norm="ln", eps=1e-5, act=None))
t = timeit(ref_fn)
print(f"XLA ref in-loop: {t*1e3:.3f} ms/op -> {2*M*D*N/t/1e12:.1f} TFLOP/s", flush=True)

for bm, bn in [(512, 1024), (512, 768), (384, 1024), (512, 1536), (256, 1536)]:
    try:
        kf = loop(lambda x_, d_, g_, be_, w_, b_, _bm=bm, _bn=bn: fused_res_norm_matmul(
            x_, d_, g_, be_, w_, b_, block_m=_bm, block_n=_bn))
        t = timeit(kf)
        print(f"kernel bm={bm} bn={bn} in-loop: {t*1e3:.3f} ms/op -> {2*M*D*N/t/1e12:.1f} TFLOP/s", flush=True)
    except Exception as e:
        print(f"kernel bm={bm} bn={bn}: FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)

# pure matmul for the roofline anchor
mm = loop(lambda x_, d_, g_, be_, w_, b_: (x_, jnp.dot(x_, w_, preferred_element_type=jnp.float32).astype(jnp.bfloat16)))
t = timeit(mm)
print(f"pure XLA matmul in-loop: {t*1e3:.3f} ms/op -> {2*M*D*N/t/1e12:.1f} TFLOP/s", flush=True)
