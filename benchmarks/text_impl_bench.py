import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.arch import full_arch_config
from multimodal_embedding_tpu.models.towers import text_tower_init, text_tower_apply
from multimodal_embedding_tpu.utils.timing import hard_sync

B = 512  # text sweep batch-equivalent (whole sweep scans at bs>=128)
for name in ("OpenAI-CLIP-L", "SigLIP-400M", "LAION-CLIP-H"):
    cfg = full_arch_config(name).text
    params = text_tower_init(jax.random.key(0), cfg, jnp.bfloat16)
    ids = jax.random.randint(jax.random.key(1), (B, cfg.max_len), 3, cfg.vocab_size - 3)
    if cfg.style == "clip":
        ids = ids.at[:, -1].set(cfg.vocab_size - 1)
    for impl in ("xla", "xla_bf16", "pallas"):
        layers.set_attention_impl(impl)
        fn = jax.jit(lambda p, i: text_tower_apply(p, cfg, i))
        out = fn(params, ids); hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(params, ids)
        hard_sync(out)
        dt = (time.perf_counter() - t0) / 20
        dh = cfg.dim // cfg.heads
        print(f"{name} text (T={cfg.max_len}, Dh={dh}) impl={impl}: "
              f"{dt*1e3:.2f} ms/b{B} -> {B/dt:.0f} cap/s", flush=True)
