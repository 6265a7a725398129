"""Interleaved A/B for the r2->r3 mid-size QPS question (VERDICT r3 #2).

r3 full7 runs showed SigLIP-400M/LAION-H/MetaCLIP/Jina 6-10% below r2 while
ColPali/CLIP-L held; the candidate culprit is the scanned text sweep that
landed between those runs (commit cc630ad), the alternative is tunnel-day
variance. This runs BOTH text-dispatch modes alternating within ONE session
(A,B,B,A,A,B,... order flipped per pass so drift cancels), same staged image
cache, same params — per-phase timings attribute any gap to the image or
text side.

Usage (real TPU, background):
    python benchmarks/ab_midsize.py --models SigLIP-400M,MetaCLIP-H14 \
        --sample-size 5000 --passes 4 --out benchmarks/ab_midsize_r4.jsonl
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="SigLIP-400M,MetaCLIP-H14")
    ap.add_argument("--sample-size", type=int, default=5000)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/ab_midsize_r4.jsonl")
    args = ap.parse_args()

    from multimodal_embedding_tpu.data.synthetic import synthetic_retrieval_dataset
    from multimodal_embedding_tpu.models.arch import load_arch_model
    from multimodal_embedding_tpu.models.encode import EncodingEngine, stage_images
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.parallel.mesh import get_mesh
    from multimodal_embedding_tpu.utils.logging import setup_logging

    setup_logging("benchmarks/ab_midsize.log")
    mesh = get_mesh()
    records = synthetic_retrieval_dataset(args.sample_size, seed=42)
    n = len(records)
    t2i = [r["captions"][0] for r in records]
    alls = [c for r in records for c in r["captions"][:5]]

    t0 = time.perf_counter()
    cache = stage_images([r["image"] for r in records], mesh, 32)
    print(f"staged {n} images in {time.perf_counter() - t0:.1f}s", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    results = []
    with out.open("w") as f:
        for name in args.models.split(","):
            info = model_info(name)
            model = load_arch_model(name, seed=42)
            engine = EncodingEngine(model, mesh, batch_size=info.batch_size or 32)

            # warm BOTH dispatch modes at the real shapes before any timing
            engine.encode_images_cached(cache)
            for mode in ("scan", "chunked"):
                engine.text_dispatch = mode
                engine.warmup_texts([t2i, alls])

            for p in range(args.passes):
                modes = ("scan", "chunked") if p % 2 == 0 else ("chunked", "scan")
                for mode in modes:
                    engine.text_dispatch = mode
                    t0 = time.perf_counter()
                    engine.encode_images_cached(cache)
                    t_img = time.perf_counter() - t0
                    t1 = time.perf_counter()
                    engine.encode_texts(t2i)
                    engine.encode_texts(alls)
                    t_txt = time.perf_counter() - t1
                    total = t_img + t_txt
                    row = {
                        "model": name, "mode": mode, "pass": p,
                        "img_s": round(t_img, 2), "txt_s": round(t_txt, 2),
                        "total_s": round(total, 2), "qps": round(n / total, 1),
                    }
                    results.append(row)
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(row, flush=True)
            del engine, model

    print("\n=== summary (mean / min over passes) ===")
    for name in args.models.split(","):
        for mode in ("scan", "chunked"):
            qps = [r["qps"] for r in results if r["model"] == name and r["mode"] == mode]
            txt = [r["txt_s"] for r in results if r["model"] == name and r["mode"] == mode]
            print(
                f"{name:14s} {mode:8s} qps mean {np.mean(qps):7.1f} "
                f"min {np.min(qps):7.1f}  txt_s mean {np.mean(txt):6.2f}"
            )


if __name__ == "__main__":
    main()
