"""V28-style publication benchmark: multi-seed deterministic runs + Winoground.

Mirrors the reference ``run_benchmark_grand_slam_v28_publication_ready.py``:
per model, Winoground runs once, COCO runs ``--runs`` times with seeds
SEED+i (shuffle+select per run), per-metric "mean ± std" strings, the
REFERENCE_RANGES sanity validation (v28:90-94, :595-599), and per-model CSV
checkpointing with the published column order
(Model, Wino Text/Image/Group, T2I_R@K, I2T_R@K, Time, QPS, Img/s —
benchmark_v28_all_models_combined.csv:1).
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np
import pandas as pd

from ..analysis.winoground import load_winoground, run_winoground
from ..data.coco import load_benchmark_dataset
from ..models.encode import EncodingEngine
from ..models.registry import get_models_to_test
from ..models.zoo import load_debug_model, load_model
from ..parallel.mesh import get_mesh
from ..retrieval.metrics import compute_metrics
from ..retrieval.scoring import dense_scores, late_interaction_scores
from ..utils.logging import setup_logging

logger = logging.getLogger("mme_tpu")

SEED = 42

# Published T2I R@1 sanity bands (reference v28:90-94)
REFERENCE_RANGES = {
    "OpenAI-CLIP-L": {"T2I_R@1": (35.0, 40.0)},
    "SigLIP-400M": {"T2I_R@1": (45.0, 55.0)},
    "LAION-CLIP-H": {"T2I_R@1": (40.0, 50.0)},
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Grand Slam Benchmark V28 (publication) — TPU")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--sample-size", type=int, default=5000)
    p.add_argument("--runs", type=int, default=3, help="Number of seeded runs (v28:62)")
    p.add_argument("--output", type=str, default="benchmark_v28_results.csv")
    p.add_argument("--cache-dir", type=str, default="./coco_images")
    p.add_argument("--models", type=str, default="all")
    p.add_argument("--dataset", type=str, default="coco", choices=["coco", "flickr30k", "docvqa", "synthetic"])
    p.add_argument("--debug-models", action="store_true")
    p.add_argument("--arch-models", action="store_true",
                   help="Random-init towers at the FULL published architecture")
    p.add_argument("--skip-winoground", action="store_true")
    p.add_argument("--winoground-samples", type=int, default=None)
    p.add_argument("--mrr", action="store_true", help="Also report MRR (v15-v19 metric)")
    p.add_argument("--maxsim-impl", type=str, default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--per-run-encode", action="store_true",
                   help="Re-encode every seeded run like the reference v28 "
                        "(default: encode the pool once and index per-run "
                        "subsets — identical results, COMPAT.md #13)")
    p.add_argument("--device-cache", action=argparse.BooleanOptionalAction, default=True,
                   help="Stage pool images to device HBM once (encode-once mode)")
    return p.parse_args(argv)


def run_benchmark_coco(model, engine, records, maxsim_impl="auto", include_mrr=False) -> dict:
    """Single-pass deterministic run (v28:231-411): encode, score, metrics."""
    from ..data.captions import caps_per_image

    kc = caps_per_image(records)
    images = [r["image"] for r in records]
    t2i_caps = [r["captions"][0] for r in records]
    all_caps = [c for r in records for c in r["captions"][:kc]]

    t0 = time.perf_counter()
    img = engine.encode_images(images)
    txt = engine.encode_texts(t2i_caps)
    txt_all = engine.encode_texts(all_caps)
    enc_time = time.perf_counter() - t0

    if model.multi_vector:
        s_t2i = late_interaction_scores(txt.embeddings, img.embeddings, impl=maxsim_impl)
        s_i2t = late_interaction_scores(img.embeddings, txt_all.embeddings, impl=maxsim_impl)
    else:
        s_t2i = dense_scores(txt.embeddings, img.embeddings)
        s_i2t = dense_scores(img.embeddings, txt_all.embeddings)

    metrics = compute_metrics(s_t2i, s_i2t, s_t2i.T, include_mrr=include_mrr, caps_per_image=kc)
    metrics["Time"] = time.perf_counter() - t0
    metrics["QPS"] = len(images) / enc_time
    metrics["Img/s"] = len(images) / enc_time
    return metrics


def encode_pool(engine, pool, cache=None):
    """Encode the WHOLE pool once per model (images from the device HBM cache
    when staged, both caption sets via the scanned text sweep). Seeded runs
    then index into these arrays: every per-sample op in the towers
    (per-image preprocess, per-token LN/attention rows, row-wise matmuls) is
    independent of the rest of the batch, so a subset's embeddings are
    identical whether encoded alone or as part of the pool — re-encoding each
    permuted seed like the reference v28 (v28:231-411) is redundant compute
    and, on a tunneled runtime, hours of redundant image transfer."""
    from ..data.captions import caps_per_image

    kc = caps_per_image(pool)
    t2i_caps = [r["captions"][0] for r in pool]
    all_caps = [c for r in pool for c in r["captions"][:kc]]
    # warmup by RUNNING (reference v28:284-357): compiles AND uploads the
    # executables before the timer — an AOT compile-only warmup leaves the
    # program upload in the first timed call (COMPAT #2, encode.warmup_texts)
    if cache is not None:
        engine.encode_images_cached(cache)
    else:
        for geom in {r["image"].shape[:2] for r in pool}:
            engine.warmup(geom, texts=False)
    engine.warmup_texts([t2i_caps, all_caps])

    t0 = time.perf_counter()
    img = (engine.encode_images_cached(cache) if cache is not None
           else engine.encode_images([r["image"] for r in pool]))
    txt = engine.encode_texts(t2i_caps)
    txt_all = engine.encode_texts(all_caps)
    enc_time = time.perf_counter() - t0
    return img, txt, txt_all, kc, enc_time


def run_metrics_from_pool(
    model, img, txt, txt_all, kc, idx, n_pool, enc_time,
    maxsim_impl="auto", include_mrr=False,
) -> dict:
    """One seeded run's metrics from the pool encode: gather the run's rows,
    score, compute metrics. QPS keeps the reference semantics (images per
    encode-phase second) measured over the pool encode."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    idx = np.asarray(idx)
    jidx = jnp.asarray(idx)
    img_e = img.embeddings[jidx]
    txt_e = txt.embeddings[jidx]
    cap_idx = jnp.asarray((idx[:, None] * kc + np.arange(kc)[None, :]).reshape(-1))
    all_e = txt_all.embeddings[cap_idx]

    if model.multi_vector:
        s_t2i = late_interaction_scores(txt_e, img_e, impl=maxsim_impl)
        s_i2t = late_interaction_scores(img_e, all_e, impl=maxsim_impl)
    else:
        s_t2i = dense_scores(txt_e, img_e)
        s_i2t = dense_scores(img_e, all_e)

    metrics = compute_metrics(s_t2i, s_i2t, s_t2i.T, include_mrr=include_mrr, caps_per_image=kc)
    metrics["Time"] = enc_time + (time.perf_counter() - t0)
    metrics["QPS"] = n_pool / enc_time
    metrics["Img/s"] = n_pool / enc_time
    return metrics


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging("benchmark_v28.log")
    mesh = get_mesh()
    logger.info(f"V28 MULTI-SEED BENCHMARK — runs={args.runs}, mesh={dict(mesh.shape)}")

    pool = load_benchmark_dataset(
        args.dataset, cache_dir=args.cache_dir, workers=args.workers,
        sample_size=10**9, seed=SEED,  # full pool; per-run sampling below
    ) if args.dataset != "synthetic" else load_benchmark_dataset(
        "synthetic", sample_size=max(args.sample_size * 2, args.sample_size + 8), seed=SEED
    )

    wino_records = []
    if not args.skip_winoground:
        try:
            wino_records = load_winoground(
                sample_size=args.winoground_samples, synthetic=args.dataset == "synthetic"
            )
        except Exception as e:
            logger.error(f"Failed to load Winoground: {e}")

    cache = None
    if not args.per_run_encode and args.device_cache:
        from ..models.encode import stage_images

        cache = stage_images([r["image"] for r in pool], mesh, args.batch_size)
        logger.info(
            f"Staged {cache.n_images} pool images to device HBM in "
            f"{cache.stage_seconds:.1f}s (one-time, shared by all models)"
        )

    results = []
    for info in get_models_to_test(args.models, args.batch_size):
        logger.info(f"=== {info.name} ===")
        try:
            if args.debug_models:
                model = load_debug_model(info, seed=SEED)
            elif args.arch_models:
                from ..models.arch import load_arch_model

                model = load_arch_model(info.name, seed=SEED)
            else:
                model = load_model(info)
        except Exception as e:
            logger.error(f"Model Load Failed for {info.name}: {e}")
            continue

        try:
            engine = EncodingEngine(model, mesh, batch_size=info.batch_size or args.batch_size)

            wino = run_winoground(engine, wino_records) if wino_records else {}

            pool_enc = None
            if not args.per_run_encode:
                pool_enc = encode_pool(engine, pool, cache=cache)
                logger.info(f"  Pool encoded once in {pool_enc[4]:.1f}s "
                            f"({len(pool)} images, runs index into it)")

            runs = []
            for run_idx in range(args.runs):
                seed = SEED + run_idx
                logger.info(f"  ▶ RUN {run_idx + 1}/{args.runs} (Seed={seed})")
                if args.sample_size < len(pool):
                    perm = np.random.default_rng(seed).permutation(len(pool))
                    sel = perm[: args.sample_size]
                else:
                    sel = np.arange(len(pool))
                if pool_enc is not None:
                    img, txt, txt_all, kc, enc_time = pool_enc
                    m = run_metrics_from_pool(
                        model, img, txt, txt_all, kc, sel, len(pool), enc_time,
                        args.maxsim_impl, args.mrr,
                    )
                else:
                    records = [pool[i] for i in sel]
                    m = run_benchmark_coco(model, engine, records, args.maxsim_impl, args.mrr)
                runs.append(m)

                if info.name in REFERENCE_RANGES:
                    lo, hi = REFERENCE_RANGES[info.name]["T2I_R@1"]
                    val = m.get("T2I_R@1", 0.0)
                    if not (lo <= val <= hi):
                        logger.warning(
                            f"⚠️ {info.name} T2I_R@1 ({val:.1f}%) OUT OF RANGE "
                            f"({lo}, {hi}) for Run {run_idx + 1}"
                        )

            # weight provenance stamped into the CSV: random-weight rows must
            # never read as accuracy evidence
            row: dict = {"Model": info.name, "Weights": model.weights_provenance}
            for k, v in wino.items():
                row[k] = f"{v:.1f}"
            for k in runs[0]:
                vals = [r[k] for r in runs if k in r]
                row[k] = f"{np.mean(vals):.1f} ± {np.std(vals):.1f}"
            results.append(row)
            pd.DataFrame(results).to_csv(args.output, index=False)
            logger.info(f"  ✅ Saved checkpoint to {args.output}")
        except Exception as e:
            logger.error(f"Evaluation Failed for {info.name}: {e}")
            import traceback

            traceback.print_exc()
        finally:
            del model

    logger.info("BENCHMARK COMPLETE.")
    # mirror cli/main.py: skip-on-failure is per-model, but an all-failed run
    # must not report an empty benchmark as success
    if not results:
        logger.error("No model produced results — benchmark failed")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
