import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, time
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.layers import linear, attention_core, encoder_stack_init, layer_norm
from multimodal_embedding_tpu.ops.fused_ln_matmul import fused_res_norm_matmul
from multimodal_embedding_tpu.ops.attention_pallas import fused_attention_qkv
from multimodal_embedding_tpu.utils.timing import hard_sync

B, T, D, H, MLP, L = 64, 577, 1024, 16, 4096, 24
stacked = encoder_stack_init(jax.random.key(0), L, D, MLP, jnp.bfloat16)
x0 = jax.random.normal(jax.random.key(1), (B, T, D), jnp.bfloat16)
layers.set_attention_impl("pallas")

def mk(kernel_prologue):
    def body(h, lp):
        w_qkv = jnp.concatenate([lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1)
        b_qkv = jnp.concatenate([lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]])
        if kernel_prologue:
            _, qkv = fused_res_norm_matmul(h, None, lp["ln1"]["scale"], lp["ln1"]["bias"], w_qkv, b_qkv, eps=1e-5)
        else:
            ln1 = layer_norm(lp["ln1"], h)
            qkv = (jnp.dot(ln1, w_qkv, preferred_element_type=jnp.float32) + b_qkv.astype(jnp.float32)).astype(h.dtype)
        attn = fused_attention_qkv(qkv, num_heads=H).astype(h.dtype)
        ao = linear(lp["attn"]["o"], attn)
        h2 = h + ao
        ln2 = layer_norm(lp["ln2"], h2)
        mo = linear(lp["mlp"]["fc2"], jax.nn.gelu(linear(lp["mlp"]["fc1"], ln2).astype(jnp.float32)).astype(h.dtype))
        return h2 + mo, None
    def fn(params, x):
        out, _ = jax.lax.scan(body, x, params)
        return out
    return jax.jit(fn)

def profile(name, fn):
    out = fn(stacked, x0); hard_sync(out)
    tdir = f"/tmp/trace_{name}"
    with jax.profiler.trace(tdir):
        out = fn(stacked, x0)
        hard_sync(out)
    # find perfetto trace
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print(name, "no trace found:", glob.glob(tdir + "/**/*", recursive=True)[:10]); return
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    durs = defaultdict(float)
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            cat = ev.get("args", {}).get("long_name", "") or ev.get("name", "")
            pid_name = ev.get("pid")
            durs[(ev.get("name") or "")[:60]] += ev["dur"]
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:18]
    print(f"== {name} ==", flush=True)
    for k, v in top:
        print(f"  {v/1e3:9.2f} ms  {k}", flush=True)

profile("xla_prologue", mk(False))
profile("kern_prologue", mk(True))
