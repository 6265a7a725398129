"""CLI: encode a dataset to embeddings on disk (index-building API).

The reference recomputes embeddings inside each benchmark run; this exposes
the encoding engine directly for production retrieval use: encode a dataset's
images and captions with any registry model and write .npz embeddings
(L2-normalized; multi-vector models write per-token embeddings + masks).

    python -m multimodal_embedding_tpu.cli.encode_cli \
        --model OpenAI-CLIP-L --dataset synthetic --sample-size 1000 \
        --output /data/coco_clip_l.npz
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data.coco import load_benchmark_dataset
from ..models.encode import EncodingEngine
from ..models.registry import model_info
from ..models.zoo import load_debug_model, load_model
from ..parallel.mesh import get_mesh
from ..utils.logging import setup_logging

logger = logging.getLogger("mme_tpu")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Encode a dataset to embeddings")
    p.add_argument("--model", required=True, help="Registry model name")
    p.add_argument("--dataset", default="coco", choices=["coco", "flickr30k", "docvqa", "synthetic"])
    p.add_argument("--sample-size", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--cache-dir", type=str, default="./coco_images")
    p.add_argument("--output", required=True, help="Output .npz")
    p.add_argument("--debug-models", action="store_true")
    p.add_argument("--arch-models", action="store_true")
    p.add_argument("--texts", action=argparse.BooleanOptionalAction, default=True,
                   help="Also encode all captions")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging(None)
    info = model_info(args.model)
    if args.debug_models:
        model = load_debug_model(info, seed=args.seed)
    elif args.arch_models:
        from ..models.arch import load_arch_model

        model = load_arch_model(args.model, seed=args.seed)
    else:
        model = load_model(info)

    records = load_benchmark_dataset(
        args.dataset, cache_dir=args.cache_dir, sample_size=args.sample_size, seed=args.seed
    )
    mesh = get_mesh()
    engine = EncodingEngine(model, mesh, batch_size=info.batch_size or args.batch_size)

    img = engine.encode_images([r["image"] for r in records])
    out = {
        "image_embeddings": np.asarray(img.embeddings, np.float32),
        "imgids": np.asarray([r["imgid"] for r in records]),
    }
    if args.texts:
        caps = [c for r in records for c in r["captions"]]
        txt = engine.encode_texts(caps)
        out["text_embeddings"] = np.asarray(txt.embeddings, np.float32)
        out["caption_image_index"] = np.asarray(
            [i for i, r in enumerate(records) for _ in r["captions"]]
        )
        if txt.mask is not None:
            out["text_masks"] = np.asarray(txt.mask)
    np.savez_compressed(args.output, **out)
    logger.info(
        f"Wrote {out['image_embeddings'].shape} image embeddings"
        + (f" and {out['text_embeddings'].shape} text embeddings" if args.texts else "")
        + f" to {args.output}"
    )
    print(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
