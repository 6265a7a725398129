import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
print("default_backend:", jax.default_backend(), flush=True)
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.arch import full_arch_config
from multimodal_embedding_tpu.models.towers import vision_tower_init, vision_tower_apply
from multimodal_embedding_tpu.utils.timing import hard_sync

cfg = full_arch_config("OpenAI-CLIP-L").vision
params = vision_tower_init(jax.random.key(0), cfg, jnp.bfloat16)
px = jax.random.normal(jax.random.key(1), (64, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)

def run(impl):
    layers.set_layer_impl(impl)
    fn = jax.jit(lambda p, x: vision_tower_apply(p, cfg, x))
    out = fn(params, px); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(params, px)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / 10
    print(f"layer_impl={impl}: {dt*1e3:.1f} ms/batch -> {64/dt:.1f} img/s", flush=True)
    return np.asarray(out, np.float32)

a = run("xla")
b = run("fused")
ca = a / np.linalg.norm(a, axis=-1, keepdims=True)
cb = b / np.linalg.norm(b, axis=-1, keepdims=True)
print("CLS cosine min:", float(np.min(np.sum(ca*cb, -1))), flush=True)
