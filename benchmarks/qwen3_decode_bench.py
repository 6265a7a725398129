"""Qwen3 decode throughput on the real chip (Workload B serving path).

The reference's baseline harness batch-generates with vLLM on GPU
(baseline_test.py); our serving path is the jitted KV-cache scan in
rl/generate.py. This measures prefill + per-token decode throughput for a
Qwen3-4B-geometry decoder in bf16 (the 14B needs multi-chip TP for HBM —
validated by dryrun_multichip; one v5e chip fits the 4B).

Usage: python benchmarks/qwen3_decode_bench.py [--batch 8 --prompt 256 --gen 128]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--size", choices=["debug", "4b"], default="4b")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models.qwen3 import Qwen3Config, qwen3_init
    from multimodal_embedding_tpu.rl.generate import generate
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.utils.timing import hard_sync

    if args.size == "4b":
        # Qwen/Qwen3-4B config.json geometry (tied embeddings)
        cfg = Qwen3Config(
            vocab_size=151936, dim=2560, layers=36, heads=32, kv_heads=8,
            head_dim=128, mlp_dim=9728, tie_embeddings=True,
        )
    else:
        cfg = Qwen3Config(
            vocab_size=4096, dim=256, layers=4, heads=8, kv_heads=4,
            head_dim=32, mlp_dim=1024, tie_embeddings=True,
        )
    # Server-side HBM reclaim lags a dead client (CLAUDE.md): the 8 GB init
    # can hit transient RESOURCE_EXHAUSTED right after a previous run exits.
    # Bounded idle-and-retry, same policy as cli/main._load_model_with_retry.
    params = None
    for attempt in range(4):
        try:
            params = qwen3_init(jax.random.key(0), cfg, jnp.bfloat16)
            hard_sync(params["final_norm"])
            break
        except Exception as e:
            params = None
            if attempt >= 3 or "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print(f"init hit transient device OOM — idling 180s for HBM "
                  f"reclaim (retry {attempt + 1}/3)", flush=True)
            time.sleep(180)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"{args.size}: {n_params/1e9:.2f}B params, bf16", flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, cfg.vocab_size - 3, (args.batch, args.prompt)).astype(np.int32)
    mask = np.ones_like(ids)

    def run():
        toks, _ = generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask), jax.random.key(1),
            max_new=args.gen, greedy=True, arch=QWEN3,
        )
        return hard_sync(toks)

    run()  # compile + upload
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    toks_per_s = args.batch * args.gen / best
    print(
        f"batch {args.batch} prompt {args.prompt} gen {args.gen}: "
        f"{best:.2f}s best of {args.reps} -> {toks_per_s:.1f} tok/s "
        f"({toks_per_s/args.batch:.1f} tok/s/seq)",
        flush=True,
    )


if __name__ == "__main__":
    main()
