import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.arch import full_arch_config
from multimodal_embedding_tpu.models.towers import vision_tower_init, vision_tower_apply
from multimodal_embedding_tpu.utils.timing import hard_sync

cfg = full_arch_config("OpenAI-CLIP-L").vision
params = vision_tower_init(jax.random.key(0), cfg, jnp.bfloat16)
for B in (64, 96):
    px = jax.random.normal(jax.random.key(1), (B, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)
    for impl in ("pallas", "xla_bf16"):
        layers.set_attention_impl(impl)
        fn = jax.jit(lambda p, x: vision_tower_apply(p, cfg, x))
        out = fn(params, px); hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(params, px)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"b{B} impl={impl}: {dt*1e3:.1f} ms -> {B/dt:.1f} img/s", flush=True)
