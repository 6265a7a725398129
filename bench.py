"""Headline benchmark: OpenAI-CLIP-L (full ViT-L/14-336 architecture) image
encode throughput on real TPU hardware, through the framework's device
preprocess -> ViT encode pipeline from the device-resident image cache.

Prints exactly ONE JSON line on EVERY exit path:
  success -> {"metric", "value", "unit", "vs_baseline"}
  failure -> {"metric", "value": null, "unit", "vs_baseline": null, "error"}

Backend-init failures (transient axon UNAVAILABLE — CLAUDE.md documents the
wedge self-drains in 20-40 min) get bounded retries in FRESH subprocesses
(jax caches a failed backend in-process, so in-process retry is useless).

Baseline: the reference's published OpenAI-CLIP-L encode throughput on an
NVIDIA A40 — QPS = 60.6 img/s (benchmark_v28_all_models_combined.csv,
BASELINE.md). Weights are random (no network egress for checkpoints here);
encode throughput is weight-independent.

Timing window: raw images are staged to HBM once (excluded, like the
reference excludes its disk image cache download, main.py:176-182); the timed
region is preprocess (PIL-parity resize matmuls) + ViT-L forward + L2 norm
for all images, after one warmup pass for XLA compilation (the reference
likewise warms up before timing, main.py:536-547).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

METRIC = "clip_l_encode_images_per_sec"
UNIT = "img/s"
BASELINE_CLIP_L_QPS = 60.6  # A40, reference CSV row OpenAI-CLIP-L

# modest staging payload: the one-time image upload is untimed but must
# survive slow/tunneled host links
N_IMAGES = 288
BATCH = 96  # ViT-L encode is batch-insensitive 64..192 (PERF.md); 96 measured best
PASSES = 3  # steady-state: amortize the per-dispatch tunnel round-trip

# bounded backend-init retries: 3 attempts spread over ~10 min; each attempt
# is itself capped — a down axon backend hangs init for 25-30 min, and an
# unbounded attempt would turn "3 retries" into a 90-minute stall
RETRY_DELAYS_S = (0.0, 240.0, 360.0)
ATTEMPT_TIMEOUT_S = 1200.0


def run_once() -> dict:
    """The measurement itself. Raises on any failure (incl. backend init)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models.arch import full_arch_config
    from multimodal_embedding_tpu.models.encode import EncodingEngine, stage_images
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import LoadedModel, hash_tokenizer
    from multimodal_embedding_tpu.models.towers import dual_encoder_init
    from multimodal_embedding_tpu.parallel.mesh import get_mesh
    from multimodal_embedding_tpu.models.layers import set_attention_impl
    from multimodal_embedding_tpu.utils.timing import hard_sync

    # shape-aware auto: ViT-L (head_dim 64) resolves to the packed-layout
    # fused Pallas kernel — 330.9 img/s / 126.2 TFLOP/s raw forward vs 243.1
    # for the XLA SDPA; CLS cosine >= 0.9999 (PERF.md)
    set_attention_impl("auto")

    info = model_info("OpenAI-CLIP-L")
    cfg = full_arch_config("OpenAI-CLIP-L")
    params = dual_encoder_init(jax.random.key(0), cfg, jnp.bfloat16)
    model = LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=info.preprocess,
        tokenize=hash_tokenizer(cfg.text.vocab_size, 77, 49407),
    )

    mesh = get_mesh()
    engine = EncodingEngine(model, mesh, batch_size=BATCH)

    # synthetic COCO-geometry images
    rng = np.random.default_rng(0)
    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (h + w))], -1
    ).astype(np.uint8)
    images = [
        np.clip(base.astype(np.int16) + rng.integers(0, 32, (h, w, 3)), 0, 255).astype(np.uint8)
        for _ in range(N_IMAGES)
    ]

    cache = stage_images(images, mesh, BATCH)  # one-time staging, untimed
    engine.encode_images_cached(cache)  # warmup: XLA compile + first pass

    t0 = time.perf_counter()
    for _ in range(PASSES):
        res = engine.encode_images_cached(cache)
        hard_sync(res.embeddings)
    dt = time.perf_counter() - t0

    qps = PASSES * N_IMAGES / dt
    return {
        "metric": METRIC,
        "value": round(qps, 2),
        "unit": UNIT,
        "vs_baseline": round(qps / BASELINE_CLIP_L_QPS, 3),
    }


def _subprocess_attempt() -> tuple[bool, str]:
    """Run the measurement in a fresh interpreter (fresh backend init).
    Returns (ok, payload): payload is the JSON line on success, else the
    error tail."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--once"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
            timeout=ATTEMPT_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return False, f"attempt timed out after {ATTEMPT_TIMEOUT_S:.0f}s"
    if proc.returncode == 0:
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    json.loads(line)
                    return True, line
                except json.JSONDecodeError:
                    continue
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
    return False, " | ".join(t.strip() for t in tail if t.strip())[-500:]


def run_with_retries(attempt_fn=_subprocess_attempt, delays=RETRY_DELAYS_S,
                     sleep=time.sleep) -> int:
    """Drive bounded attempts; ALWAYS prints exactly one JSON line to stdout.

    ``attempt_fn``/``delays``/``sleep`` are injectable for the forced-failure
    test (tests/test_bench_contract.py)."""
    last_err = "no attempts ran"
    for i, delay in enumerate(delays):
        if delay:
            print(f"[bench] retrying in {delay:.0f}s (attempt {i + 1}/"
                  f"{len(delays)})", file=sys.stderr)
            sleep(delay)
        try:
            ok, payload = attempt_fn()
        except Exception as e:  # attempt machinery itself failed
            ok, payload = False, f"{type(e).__name__}: {e}"
        if ok:
            print(payload)
            return 0
        last_err = payload
        print(f"[bench] attempt {i + 1} failed: {payload}", file=sys.stderr)
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": UNIT,
        "vs_baseline": None,
        "error": last_err,
    }))
    return 1


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if "--once" in argv:
        # inner mode: measure once, no retries; a crash here surfaces as a
        # nonzero exit that the outer retry loop converts to the error JSON
        print(json.dumps(run_once()))
        return 0
    return run_with_retries()


if __name__ == "__main__":
    raise SystemExit(main())
