import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob, gzip, json, time
from collections import defaultdict
import numpy as np
import jax, jax.numpy as jnp
from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.models.arch import full_colpali_config
from multimodal_embedding_tpu.models.colpali import colpali_init, colpali_image_fwd
from multimodal_embedding_tpu.utils.timing import hard_sync

B = 8
cfg = full_colpali_config()
suffix = np.array([2, 10, 11, 12, 13, 14], np.int32)
params = colpali_init(jax.random.key(0), cfg, suffix, jnp.bfloat16)
px = jax.random.normal(jax.random.key(1), (B, 448, 448, 3), jnp.bfloat16)
layers.set_attention_impl("auto")

fn = jax.jit(lambda p, x: colpali_image_fwd(p, cfg, x))
out = fn(params, px); hard_sync(out)
t0 = time.perf_counter()
for _ in range(5):
    out = fn(params, px)
hard_sync(out)
dt = (time.perf_counter() - t0) / 5
print(f"colpali image fwd b{B}: {dt*1e3:.1f} ms -> {B/dt:.2f} img/s", flush=True)

# vision tower alone and gemma alone, for the split
from multimodal_embedding_tpu.models.towers import vision_tower_apply
vfn = jax.jit(lambda p, x: vision_tower_apply(p["vision"], cfg.vision, x))
o = vfn(params, px); hard_sync(o)
t0 = time.perf_counter()
for _ in range(5):
    o = vfn(params, px)
hard_sync(o)
dtv = (time.perf_counter() - t0) / 5
print(f"  vision tower (SigLIP-448, seq 1024): {dtv*1e3:.1f} ms", flush=True)

from multimodal_embedding_tpu.models.gemma import gemma_apply
emb = jax.random.normal(jax.random.key(2), (B, 1030, cfg.gemma.dim), jnp.bfloat16)
gfn = jax.jit(lambda p, e: gemma_apply(p["gemma"], cfg.gemma, e))
o = gfn(params, emb); hard_sync(o)
t0 = time.perf_counter()
for _ in range(5):
    o = gfn(params, emb)
hard_sync(o)
dtg = (time.perf_counter() - t0) / 5
print(f"  gemma decoder (2B, seq 1030): {dtg*1e3:.1f} ms", flush=True)

tdir = "/tmp/trace_colpali"
with jax.profiler.trace(tdir):
    out = fn(params, px); hard_sync(out)
files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
pnames = {}
for ev in tr["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        pnames[ev["pid"]] = ev["args"].get("name", "")
durs = defaultdict(float); cnt = defaultdict(int)
for ev in tr["traceEvents"]:
    if ev.get("ph") == "X" and "dur" in ev and "TPU" in pnames.get(ev.get("pid"), ""):
        n = ev.get("name", "")[:70]
        durs[n] += ev["dur"]; cnt[n] += 1
print("== colpali device ops ==", flush=True)
for k, v in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {v/1e3:9.2f} ms x{cnt[k]:<4} {k}", flush=True)
