import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.layers import linear, attention_core, encoder_stack_init
from multimodal_embedding_tpu.ops.fused_ln_matmul import fused_res_norm_matmul
from multimodal_embedding_tpu.ops.attention_pallas import fused_attention, fused_attention_qkv
from multimodal_embedding_tpu.utils.timing import hard_sync

B, T, D, H, MLP, L = 64, 577, 1024, 16, 4096, 24
ACT = "quick_gelu"
stacked = encoder_stack_init(jax.random.key(0), L, D, MLP, jnp.bfloat16)
x0 = jax.random.normal(jax.random.key(1), (B, T, D), jnp.bfloat16)
layers.set_attention_impl("pallas")

def variant_stack(mode):
    def body(carry, lp):
        h, delta = carry
        if mode in ("full", "qkv_slices", "mlponly"):
            if mode == "mlponly":
                h1 = h + delta
                ln1 = layers.layer_norm(lp["ln1"], h1)
                qf, kf, vf = linear(lp["attn"]["q"], ln1), linear(lp["attn"]["k"], ln1), linear(lp["attn"]["v"], ln1)
                attn = attention_core(qf, kf, vf, H)
            else:
                w_qkv = jnp.concatenate([lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1)
                b_qkv = jnp.concatenate([lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]])
                h1, qkv = fused_res_norm_matmul(h, delta, lp["ln1"]["scale"], lp["ln1"]["bias"], w_qkv, b_qkv, eps=1e-5)
                if mode == "full":
                    attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
                else:
                    attn = attention_core(qkv[..., :D], qkv[..., D:2*D], qkv[..., 2*D:], H)
            ao = linear(lp["attn"]["o"], attn)
            if mode == "mlponly":
                h2, mlp_h = fused_res_norm_matmul(h1, ao, lp["ln2"]["scale"], lp["ln2"]["bias"], lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"], eps=1e-5, act=ACT)
            else:
                h2, mlp_h = fused_res_norm_matmul(h1, ao, lp["ln2"]["scale"], lp["ln2"]["bias"], lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"], eps=1e-5, act=ACT)
            mo = linear(lp["mlp"]["fc2"], mlp_h)
            return (h2, mo), None
        elif mode == "attnonly":
            w_qkv = jnp.concatenate([lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1)
            b_qkv = jnp.concatenate([lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]])
            h1, qkv = fused_res_norm_matmul(h, delta, lp["ln1"]["scale"], lp["ln1"]["bias"], w_qkv, b_qkv, eps=1e-5)
            attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
            ao = linear(lp["attn"]["o"], attn)
            h2 = h1 + ao
            ln2 = layers.layer_norm(lp["ln2"], h2)
            mo = linear(lp["mlp"]["fc2"], layers.ACTIVATIONS[ACT](linear(lp["mlp"]["fc1"], ln2).astype(jnp.float32)).astype(h.dtype))
            return (h2, mo), None
    def fn(params, x):
        (xf, df), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), params)
        return xf + df
    return jax.jit(fn)

def xla_stack():
    def fn(params, x):
        layers.set_layer_impl("xla")
        return layers.encoder_stack(params, x, H, ACT)
    return jax.jit(fn)

def timeit(name, fn):
    out = fn(stacked, x0); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(stacked, x0)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.1f} ms -> {B/dt:.1f} img-equiv/s", flush=True)

timeit("xla layer impl (pallas attn)", xla_stack())
timeit("fused full (qkv kernel)", variant_stack("full"))
timeit("fused + sliced qkv -> packed attn", variant_stack("qkv_slices"))
timeit("mlp-prologue only", variant_stack("mlponly"))
timeit("attn-prologue only", variant_stack("attnonly"))
