import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.layers import linear, attention_core, encoder_stack_init, layer_norm, ACTIVATIONS
from multimodal_embedding_tpu.ops.fused_ln_matmul import fused_res_norm_matmul
from multimodal_embedding_tpu.ops.attention_pallas import fused_attention, fused_attention_qkv
from multimodal_embedding_tpu.utils.timing import hard_sync

B, T, D, H, MLP, L = 64, 577, 1024, 16, 4096, 24
ACT = "quick_gelu"
stacked = encoder_stack_init(jax.random.key(0), L, D, MLP, jnp.bfloat16)
x0 = jax.random.normal(jax.random.key(1), (B, T, D), jnp.bfloat16)
layers.set_attention_impl("pallas")

def mk(mode):
    def mlp_xla(lp, h2):
        ln2 = layer_norm(lp["ln2"], h2)
        return linear(lp["mlp"]["fc2"], ACTIVATIONS[ACT](linear(lp["mlp"]["fc1"], ln2).astype(jnp.float32)).astype(h2.dtype))

    def body(carry, lp):
        h = carry
        if mode == "v1_qkvattn_only":  # XLA LN + 3 matmuls -> concat -> qkv kernel
            ln1 = layer_norm(lp["ln1"], h)
            qf, kf, vf = linear(lp["attn"]["q"], ln1), linear(lp["attn"]["k"], ln1), linear(lp["attn"]["v"], ln1)
            qkv = jnp.concatenate([qf, kf, vf], axis=-1)
            attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
        elif mode == "v3_concat_matmul":  # XLA LN + ONE concat matmul -> packed attn via qkv kernel
            ln1 = layer_norm(lp["ln1"], h)
            w_qkv = jnp.concatenate([lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1)
            b_qkv = jnp.concatenate([lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]])
            qkv = (jnp.dot(ln1, w_qkv, preferred_element_type=jnp.float32) + b_qkv.astype(jnp.float32)).astype(h.dtype)
            attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
        elif mode == "v4_kernel_nodelta":  # prologue kernel, no delta, single carry
            w_qkv = jnp.concatenate([lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1)
            b_qkv = jnp.concatenate([lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]])
            _, qkv = fused_res_norm_matmul(h, None, lp["ln1"]["scale"], lp["ln1"]["bias"], w_qkv, b_qkv, eps=1e-5)
            attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
        else:  # baseline: xla path
            ln1 = layer_norm(lp["ln1"], h)
            qf, kf, vf = linear(lp["attn"]["q"], ln1), linear(lp["attn"]["k"], ln1), linear(lp["attn"]["v"], ln1)
            attn = attention_core(qf, kf, vf, H)
        ao = linear(lp["attn"]["o"], attn)
        h2 = h + ao
        mo = mlp_xla(lp, h2)
        return h2 + mo, None
    def fn(params, x):
        out, _ = jax.lax.scan(body, x, params)
        return out
    return jax.jit(fn)

def timeit(name, fn):
    out = fn(stacked, x0); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(stacked, x0)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.1f} ms -> {B/dt:.1f} img-equiv/s", flush=True)

timeit("v0 xla baseline          ", mk("v0"))
timeit("v1 qkv-attn kernel only  ", mk("v1_qkvattn_only"))
timeit("v3 concat matmul + qkvatt", mk("v3_concat_matmul"))
timeit("v4 prologue kern, nodelta", mk("v4_kernel_nodelta"))
