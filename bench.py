"""Headline benchmark: OpenAI-CLIP-L (full ViT-L/14-336 architecture) image
encode throughput on real TPU hardware, through the framework's device
preprocess -> ViT encode pipeline from the device-resident image cache.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

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
import time

import numpy as np

BASELINE_CLIP_L_QPS = 60.6  # A40, reference CSV row OpenAI-CLIP-L

# modest staging payload: the one-time image upload is untimed but must
# survive slow/tunneled host links
N_IMAGES = 288
BATCH = 96  # ViT-L encode is batch-insensitive 64..192 (PERF.md); 96 measured best
PASSES = 3  # steady-state: amortize the per-dispatch tunnel round-trip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models.arch import full_arch_config
    from multimodal_embedding_tpu.models.encode import EncodingEngine
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import LoadedModel, hash_tokenizer
    from multimodal_embedding_tpu.models.towers import dual_encoder_init
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    from multimodal_embedding_tpu.models.layers import set_attention_impl

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

    from multimodal_embedding_tpu.models.encode import stage_images

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
    from multimodal_embedding_tpu.utils.timing import hard_sync

    t0 = time.perf_counter()
    for _ in range(PASSES):
        res = engine.encode_images_cached(cache)
        hard_sync(res.embeddings)
    dt = time.perf_counter() - t0

    qps = PASSES * N_IMAGES / dt
    print(
        json.dumps(
            {
                "metric": "clip_l_encode_images_per_sec",
                "value": round(qps, 2),
                "unit": "img/s",
                "vs_baseline": round(qps / BASELINE_CLIP_L_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
