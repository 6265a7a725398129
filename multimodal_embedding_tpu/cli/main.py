"""V29-statistical benchmark CLI — TPU-native.

Preserves the reference ``main.py`` interface exactly (reference main.py:71-80):
``--batch-size --workers --sample-size --bootstrap-iterations --output
--cache-dir --models``, and the CSV schema ``{metric}_{mean,lower,upper,std}``
x {T2I, I2T, I2T_Sym} x R@{1,5,10} + Time/QPS/Encoding_Time/Img_per_sec +
_failure_analysis (reference main.py:643-665).

TPU-specific additions (new flags, defaults preserve reference behavior):
``--dataset {coco,flickr30k,docvqa,synthetic}``, ``--debug-models`` (random-init
towers for offline smoke runs), ``--seed``, ``--maxsim-impl``.

Timing semantics: QPS = images / encoding_time, encode phase only (reference
main.py:493-497). One deliberate deviation: XLA compilation happens during
warmup BEFORE the timer starts — the reference's GPU warmup (main.py:536-547)
is inside its timed window but costs ~1s; a 30s XLA compile would distort the
throughput metric it is meant to capture.
"""

from __future__ import annotations

import argparse
import json
import logging
import time

import numpy as np
import pandas as pd

from ..analysis.failure import aggregate_failure_analysis
from ..data.coco import load_benchmark_dataset
from ..models.encode import AsyncImageStager, DeviceImageCache, EncodingEngine, stage_images
from ..models.registry import get_models_to_test
from ..models.zoo import LoadedModel, load_debug_model, load_model
from ..parallel.mesh import get_mesh
from ..retrieval.scoring import dense_scores, late_interaction_scores
from ..stats.bootstrap import bootstrap_benchmark
from ..stats.ci import bootstrap_confidence_interval
from ..data.captions import caps_per_image
from ..utils.logging import setup_logging
from ..utils.memory import report_memory

logger = logging.getLogger("mme_tpu")

SEED = 42

# Transient-OOM retry at model load: right after another device client exits,
# the server-side HBM reclaim can lag by minutes and EVERY load fails with
# RESOURCE_EXHAUSTED (observed 2026-08-18: one back-to-back run lost 6 of 7
# models in milliseconds). The condition self-drains, so idle and retry
# instead of skipping the model outright.
LOAD_RETRIES = 2
LOAD_RETRY_BACKOFF_S = 150.0


def _load_model_with_retry(loader, name: str):
    for attempt in range(LOAD_RETRIES + 1):
        try:
            return loader()
        except Exception as e:
            if attempt >= LOAD_RETRIES or "RESOURCE_EXHAUSTED" not in str(e):
                raise
            logger.warning(
                f"Model load for {name} hit transient device OOM ({e}) — "
                f"idling {LOAD_RETRY_BACKOFF_S:.0f}s for memory reclaim "
                f"(retry {attempt + 1}/{LOAD_RETRIES})"
            )
            time.sleep(LOAD_RETRY_BACKOFF_S)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Grand Slam Multimodal Benchmark V29 (Statistical) — TPU")
    p.add_argument("--batch-size", type=int, default=32, help="Batch size for dense models")
    p.add_argument("--workers", type=int, default=16, help="Download workers")
    p.add_argument("--sample-size", type=int, default=5000,
                   help="Number of COCO samples per bootstrap iteration")
    p.add_argument("--bootstrap-iterations", type=int, default=1000,
                   help="Number of bootstrap iterations")
    p.add_argument("--output", type=str, default="benchmark_v29_statistical_results.csv",
                   help="Output CSV file")
    p.add_argument("--cache-dir", type=str, default="./coco_images", help="Image cache directory")
    p.add_argument("--models", type=str, default="all",
                   help="Comma-separated model names or 'all'")
    # TPU-native extensions
    p.add_argument("--dataset", type=str, default="coco",
                   choices=["coco", "flickr30k", "docvqa", "synthetic"])
    p.add_argument("--debug-models", action="store_true",
                   help="Random-init small towers (offline smoke runs)")
    p.add_argument("--arch-models", action="store_true",
                   help="Random-init towers at the FULL published architecture "
                        "(perf runs without checkpoint access)")
    p.add_argument("--seed", type=int, default=SEED)
    p.add_argument("--maxsim-impl", type=str, default="auto", choices=["auto", "pallas", "xla"])
    p.add_argument("--transport", type=str, default="auto", choices=["auto", "host", "device"],
                   help="Image transport: on-device resize vs host PIL resize")
    p.add_argument("--device-cache", action=argparse.BooleanOptionalAction, default=True,
                   help="Stage raw images to device HBM once, shared across models")
    p.add_argument("--overlap-staging", action=argparse.BooleanOptionalAction, default=True,
                   help="Stage images in a background thread overlapped with "
                        "model 1's load + text warmup; model 1 joins staging "
                        "BEFORE its timed encode and measures the same cached "
                        "path as every other model")
    p.add_argument("--streaming-encode", action=argparse.BooleanOptionalAction, default=False,
                   help="With --overlap-staging: model 1 encodes slices as "
                        "they land instead of joining first (lowest wall-clock "
                        "for one-shot runs, but its timed encode measures the "
                        "streaming path — QPS ~2x below the cached path at 5k; "
                        "PERF.md round-5 A/B)")
    p.add_argument("--encode-passes", type=int, default=1,
                   help="Steady-state timing: run the encode phase N times "
                        "and report the median encoding_time/QPS (averages "
                        "out tunnel-latency noise on remote devices; scores "
                        "are deterministic across passes)")
    p.add_argument("--score-cache-dir", type=str, default=None,
                   help="Persist/resume encoded score matrices (skip re-encoding "
                        "on reruns of the same model+dataset)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="Capture a jax.profiler trace of each model's benchmark")
    p.add_argument("--attention-impl", type=str, default="auto",
                   choices=["auto", "xla", "xla_bf16", "pallas", "flash"],
                   help="Tower self-attention: auto (fused softmax-in-VMEM "
                        "Pallas kernel on TPU, f32-logit SDPA elsewhere), "
                        "f32-logit SDPA, bf16-logit SDPA (torch-autocast "
                        "numerics), Pallas fused, or Pallas flash")
    p.add_argument("--preprocess-impl", type=str, default="xla", choices=["xla", "pallas"],
                   help="Device preprocessing: XLA matmuls or the fused Pallas kernel")
    p.add_argument("--layer-impl", type=str, default="auto", choices=["auto", "xla", "fused"],
                   help="Encoder layer: plain XLA ops (auto: XLA fuses "
                        "residual+LN into the matmuls at roofline — measured) "
                        "or the fused residual+LN+matmul prologue kernel")
    p.add_argument("--native-cache-dir", type=str, default=None,
                   help="Persist HF->JAX converted weights as native .npz; later "
                        "runs load torch-free")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="Model-axis size of the device mesh: params are "
                        "Megatron column/row-split across this many chips "
                        "(parallel/tp.py); the data axis gets the rest")
    p.add_argument("--sequence-parallel", type=int, default=1,
                   help="Model-axis size for sequence/context parallelism: "
                        "ColPali's 1030-token Gemma prefill shards its token "
                        "dim across this many chips (K/V all-gather over ICI, "
                        "parallel/sp.py). Mutually exclusive with "
                        "--tensor-parallel")
    return p.parse_args(argv)


def compute_score_matrices(
    model: LoadedModel,
    engine: EncodingEngine,
    records: list[dict],
    maxsim_impl: str = "auto",
    cache: DeviceImageCache | None = None,
    mesh=None,
    stager: AsyncImageStager | None = None,
):
    """Encode once, build the two full score matrices (the bootstrap then
    resamples on device). Returns (s_t2i [N,N], s_i2t [N,5N], encoding_time)."""
    kc = caps_per_image(records)
    t2i_captions = [r["captions"][0] for r in records]  # T2I uses first caption
    all_captions = [c for r in records for c in r["captions"][:kc]]

    t0 = time.perf_counter()
    stall = 0.0
    if stager is not None:
        img = engine.encode_images_streaming(stager)
        # encoding_time keeps images-per-encode-second semantics: the upload
        # stall hidden behind this phase is staging, not encode
        stall = (time.perf_counter() - t0) - img.seconds
    elif cache is not None:
        img = engine.encode_images_cached(cache)
    else:
        img = engine.encode_images([r["image"] for r in records])
    txt_t2i = engine.encode_texts(t2i_captions)
    txt_all = engine.encode_texts(all_captions)
    encoding_time = time.perf_counter() - t0 - stall

    smesh = mesh if mesh is not None and mesh.devices.size > 1 else None
    if model.multi_vector:
        # no masks: pad-token embeddings are zeroed by the model (COMPAT.md
        # item 8), reproducing colpali_engine's scoring exactly
        s_t2i = late_interaction_scores(
            txt_t2i.embeddings, img.embeddings, impl=maxsim_impl, mesh=smesh
        )
        s_i2t = late_interaction_scores(
            img.embeddings, txt_all.embeddings, impl=maxsim_impl, mesh=smesh
        )
    else:
        s_t2i = dense_scores(txt_t2i.embeddings, img.embeddings, mesh=smesh)
        s_i2t = dense_scores(img.embeddings, txt_all.embeddings, mesh=smesh)
    return s_t2i, s_i2t, encoding_time


def run_bootstrap_benchmark(
    model: LoadedModel,
    records: list[dict],
    n_iterations: int,
    mesh,
    batch_size: int = 32,
    seed: int = SEED,
    maxsim_impl: str = "auto",
    transport: str = "auto",
    cache: DeviceImageCache | None = None,
    score_cache_dir: str | None = None,
    preprocess_impl: str = "xla",
    stager: AsyncImageStager | None = None,
    encode_passes: int = 1,
    streaming_encode: bool = False,
) -> dict:
    """Encode-once / resample-many (reference main.py:478-667), on device."""
    logger.info(f"Benchmarking {model.info.name} with {n_iterations} bootstrap iterations...")
    n = len(records)

    cached_scores = None
    if score_cache_dir:
        from ..stats.score_cache import load_scores

        cached_scores = load_scores(
            score_cache_dir, model.info.name, records,
            preprocess_impl=preprocess_impl, maxsim_impl=maxsim_impl,
        )

    t_start = time.perf_counter()
    if cached_scores is not None:
        s_t2i, s_i2t, encoding_time = cached_scores
        import jax.numpy as jnp

        s_t2i, s_i2t = jnp.asarray(s_t2i), jnp.asarray(s_i2t)
    else:
        engine = EncodingEngine(
            model, mesh, batch_size=model.info.batch_size or batch_size,
            transport=transport, preprocess_impl=preprocess_impl,
        )
        logger.info("Warming up (XLA compile)...")
        # the timed phase encodes two text sweeps (N t2i captions + N*kc all
        # captions) whose exact scan shapes must compile here, not inside the
        # timer (tokenized in full: dynamic-padding tokenizers make the token
        # length a property of the whole set)
        kc = caps_per_image(records)
        text_sets = [
            [r["captions"][0] for r in records],
            [c for r in records for c in r["captions"][:kc]],
        ]
        if stager is not None and not streaming_encode:
            # hybrid default (PERF.md round-5 overlap A/B): compile the text
            # sweeps while uploads proceed in the background, then join
            # staging BEFORE the timer and take the cached path — model 1's
            # QPS measures the same encode as every other model (the
            # streaming path measured ~2x slower per-chunk at 5k and
            # distorted model 1's published QPS 47%)
            engine.warmup(
                next(iter({r["image"].shape[:2] for r in records})),
                images=False, text_sets=text_sets,
            )
            cache = stager.wait()
            stager = None
            logger.info(
                f"Background staging complete: {cache.n_images} images in "
                f"{cache.stage_seconds:.1f}s (overlapped with model 1 "
                f"load/text warmup)"
            )
            engine.encode_images_cached(cache)
        elif stager is not None:
            # compile + upload the per-slice executables at the stager's
            # planned shapes while uploads proceed in the background
            engine.warmup_streaming(stager)
            engine.warmup(
                next(iter({r["image"].shape[:2] for r in records})),
                images=False, text_sets=text_sets,
            )
        elif cache is not None:
            # warmup by RUNNING: compiles AND uploads the executables before
            # the timer (an AOT compile-only warmup leaves the program upload
            # in the first timed call — seconds at tunnel bandwidth)
            engine.encode_images_cached(cache)
            engine.warmup(
                next(iter({r["image"].shape[:2] for r in records})),
                images=False, text_sets=text_sets,
            )
        else:
            for g in {r["image"].shape[:2] for r in records}:
                engine.warmup(g, text_sets=text_sets)

        t_start = time.perf_counter()
        s_t2i, s_i2t, encoding_time = compute_score_matrices(
            model, engine, records, maxsim_impl, cache=cache, mesh=mesh, stager=stager
        )
        if encode_passes > 1:
            # scores are deterministic; extra passes only re-time the encode
            times = [encoding_time]
            extra_cache = cache if cache is not None else (
                stager.wait() if stager is not None else None
            )
            for _ in range(encode_passes - 1):
                _, _, et = compute_score_matrices(
                    model, engine, records, maxsim_impl, cache=extra_cache, mesh=mesh
                )
                times.append(et)
            encoding_time = float(np.median(times))
            logger.info(
                f"encode passes: {[round(t, 2) for t in times]} -> "
                f"median {encoding_time:.2f}s"
            )
        if score_cache_dir:
            from ..stats.score_cache import save_scores

            save_scores(
                score_cache_dir, model.info.name, records, s_t2i, s_i2t, encoding_time,
                preprocess_impl=preprocess_impl, maxsim_impl=maxsim_impl,
            )
    logger.info(f"Encoding+scoring completed in {encoding_time:.1f}s")
    report_memory()

    logger.info(f"Running {n_iterations} bootstrap iterations on device...")
    out = bootstrap_benchmark(
        s_t2i, s_i2t, n_iterations, seed=seed, caps_per_image=caps_per_image(records),
        mesh=mesh if mesh.devices.size > 1 else None,
    )
    total_time = time.perf_counter() - t_start

    # Weight provenance stamped into every emitted CSV: random-weight runs
    # (offline perf evidence) must never be mistaken for accuracy parity —
    # their R@K columns are meaningless against the reference CI targets.
    aggregated: dict = {"Model": model.info.name, "Weights": model.weights_provenance}
    for key, values in out.metrics.items():
        mean, lower, upper = bootstrap_confidence_interval(values)
        aggregated[f"{key}_mean"] = mean
        aggregated[f"{key}_lower"] = lower
        aggregated[f"{key}_upper"] = upper
        aggregated[f"{key}_std"] = float(np.std(values))

    aggregated["Time"] = total_time
    aggregated["QPS"] = n / encoding_time
    aggregated["Encoding_Time"] = encoding_time
    aggregated["Img_per_sec"] = n / encoding_time

    t2i_captions = [r["captions"][0] for r in records]
    failure = aggregate_failure_analysis(out.correct_r1, out.sample_idx, t2i_captions)
    aggregated["_failure_analysis"] = json.dumps(failure)
    aggregated["_bootstrap_metrics"] = {k: v for k, v in out.metrics.items()}
    return aggregated


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging()
    logger.info(f"BENCHMARK START (V29 STATISTICAL, TPU) - Output: {args.output}")
    logger.info(f"Bootstrap iterations: {args.bootstrap_iterations}")

    from ..models.layers import set_attention_impl, set_layer_impl, set_sp_mesh, set_tp_mesh

    set_attention_impl(args.attention_impl)
    set_layer_impl(args.layer_impl)
    if args.tensor_parallel > 1 and args.sequence_parallel > 1:
        raise SystemExit("--tensor-parallel and --sequence-parallel both use the "
                         "model mesh axis; pick one")
    n_model = max(args.tensor_parallel, args.sequence_parallel)
    mesh = get_mesh(n_model=n_model)
    logger.info(f"Device mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    if args.sequence_parallel > 1:
        set_sp_mesh(mesh)
        logger.info(
            f"--sequence-parallel {args.sequence_parallel}: Gemma prefill "
            f"token dim sharded over the model axis (K/V all-gather on ICI)"
        )
    if args.tensor_parallel > 1:
        # the fused attention kernel composes with TP via an explicit
        # shard_map over the column-split heads (layers._tp_packed_attention);
        # the residual+LN+matmul prologue kernel does not yet shard, so the
        # layer impl takes the XLA path under TP
        set_tp_mesh(mesh)
        set_layer_impl("xla")
        logger.info(
            "--tensor-parallel: attention kernel runs per-chip head shards "
            "via shard_map; layer prologue fusion -> xla"
        )

    records = load_benchmark_dataset(
        args.dataset,
        cache_dir=args.cache_dir,
        workers=args.workers,
        sample_size=args.sample_size,
        seed=args.seed,
    )
    logger.info(
        f"Dataset: {len(records)} images, "
        f"{caps_per_image(records) * len(records)} captions"
    )

    cache: DeviceImageCache | None = None
    stager: AsyncImageStager | None = None
    if args.device_cache:
        if args.overlap_staging:
            stager = AsyncImageStager([r["image"] for r in records], mesh, args.batch_size)
            mode = ("model 1 encodes streaming slices" if args.streaming_encode
                    else "model 1 joins before its timed encode")
            logger.info(
                f"Staging {stager.n_images} raw images to device HBM in the "
                f"background ({len(stager.slice_plan)} slices) — {mode}"
            )
        else:
            cache = stage_images([r["image"] for r in records], mesh, args.batch_size)
            logger.info(
                f"Staged {cache.n_images} raw images to device HBM in "
                f"{cache.stage_seconds:.1f}s (one-time, shared by all models)"
            )

    final_results = []
    all_bootstrap: dict = {}
    stager_used = False
    for info in get_models_to_test(args.models, args.batch_size):
        logger.info("=" * 60)
        logger.info(f"EVALUATING: {info.name}")
        logger.info("=" * 60)
        this_stager = None
        if stager is not None:
            if not stager_used:
                this_stager = stager
                stager_used = True
            else:
                # models after the first take the fully-assembled cache; a
                # background-staging failure (e.g. transient
                # RESOURCE_EXHAUSTED) follows the per-model skip-and-continue
                # policy instead of aborting the whole benchmark
                try:
                    cache = stager.wait()
                    logger.info(
                        f"Background staging complete: {cache.n_images} "
                        f"images in {cache.stage_seconds:.1f}s (overlapped "
                        f"with model 1)"
                    )
                except Exception as e:
                    logger.error(
                        f"Background staging failed: {e} — continuing "
                        f"without the shared device cache"
                    )
                    cache = None
                finally:
                    stager = None
        if args.debug_models:
            loader = lambda: load_debug_model(info, seed=args.seed)
        elif args.arch_models:
            from ..models.arch import load_arch_model

            loader = lambda: load_arch_model(info.name, seed=args.seed)
        else:
            loader = lambda: load_model(info, native_cache_dir=args.native_cache_dir)
        try:
            model = _load_model_with_retry(loader, info.name)
        except Exception as e:
            logger.error(f"Model load failed: {e}")
            continue

        try:
            from ..utils.profiling import maybe_trace

            with maybe_trace(args.profile_dir and f"{args.profile_dir}/{info.name}"):
                result = run_bootstrap_benchmark(
                    model,
                    records,
                    args.bootstrap_iterations,
                    mesh,
                    batch_size=args.batch_size,
                    seed=args.seed,
                    maxsim_impl=args.maxsim_impl,
                    transport=args.transport,
                    cache=cache,
                    score_cache_dir=args.score_cache_dir,
                    preprocess_impl=args.preprocess_impl,
                    stager=this_stager,
                    encode_passes=args.encode_passes,
                    streaming_encode=args.streaming_encode,
                )
            bootstrap_metrics = result.pop("_bootstrap_metrics", None)
            if bootstrap_metrics:
                all_bootstrap.update(
                    {f"{info.name}::{k}": v for k, v in bootstrap_metrics.items()}
                )
                # sidecar with raw per-iteration samples -> the analyzer can
                # run REAL permutation tests instead of the reference's
                # CI-overlap approximation
                np.savez_compressed(args.output + ".bootstrap.npz", **all_bootstrap)
            final_results.append(result)
            pd.DataFrame(final_results).to_csv(args.output, index=False)
            logger.info(f"Checkpoint saved to {args.output}")
        except Exception as e:
            logger.error(f"Evaluation failed for {info.name}: {e}")
            import traceback

            traceback.print_exc()
        finally:
            del model

    if stager is not None and stager_used:
        # single-model run: join the background stager so the process never
        # exits mid-device_put (a killed transfer can wedge the axon client)
        try:
            stager.wait()
        except Exception as e:
            logger.error(f"Background staging failed after results: {e}")

    logger.info("BENCHMARK COMPLETE!")
    logger.info(f"Results saved to {args.output}")
    # skip-on-failure is per-model (reference main.py's try/continue), but a
    # run where EVERY model failed produced no evidence — exit nonzero so
    # drivers don't mistake an empty CSV for a completed benchmark (seen
    # once: a transient device OOM failed all 7 loads, exit was still 0)
    if not final_results:
        logger.error("No model produced results — benchmark failed")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
