import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, time
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.arch import full_arch_config
from multimodal_embedding_tpu.models.towers import vision_tower_init, vision_tower_apply
from multimodal_embedding_tpu.utils.timing import hard_sync

B = 32
cfg = full_arch_config("LAION-CLIP-H").vision  # ViT-H/14: D=1280, H=16, Dh=80, seq 257
params = vision_tower_init(jax.random.key(0), cfg, jnp.bfloat16)
px = jax.random.normal(jax.random.key(1), (B, cfg.image_size, cfg.image_size, 3), jnp.bfloat16)

def run(impl, iters=10):
    layers.set_attention_impl(impl)
    fn = jax.jit(lambda p, x: vision_tower_apply(p, cfg, x))
    out = fn(params, px); hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, px)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"impl={impl}: {dt*1e3:.1f} ms/batch -> {B/dt:.1f} img/s", flush=True)
    return fn

for impl in ("xla", "xla_bf16", "pallas", "flash"):
    try:
        run(impl)
    except Exception as e:
        print(f"impl={impl}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)

# profile the two contenders
for impl in ("xla_bf16", "pallas"):
    layers.set_attention_impl(impl)
    fn = jax.jit(lambda p, x: vision_tower_apply(p, cfg, x))
    out = fn(params, px); hard_sync(out)
    tdir = f"/tmp/trace_vith_{impl}"
    with jax.profiler.trace(tdir):
        out = fn(params, px); hard_sync(out)
    files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    pnames = {ev["pid"]: ev["args"].get("name", "") for ev in tr["traceEvents"]
              if ev.get("ph") == "M" and ev.get("name") == "process_name"}
    durs = defaultdict(float); cnt = defaultdict(int)
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "X" and "dur" in ev and "TPU" in pnames.get(ev.get("pid"), ""):
            n = ev.get("name", "")[:60]
            durs[n] += ev["dur"]; cnt[n] += 1
    print(f"== vith {impl} device ops ==", flush=True)
    for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {v/1e3:9.2f} ms x{cnt[k]:<4} {k}", flush=True)
