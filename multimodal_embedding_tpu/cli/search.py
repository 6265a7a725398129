"""CLI: text-to-image search against an exported embedding index.

    python -m multimodal_embedding_tpu.cli.search \
        --index /data/coco_clip_l.npz --model OpenAI-CLIP-L \
        --query "a dog catching a frisbee" --k 5
"""

from __future__ import annotations

import argparse

from ..models.encode import EncodingEngine
from ..models.registry import model_info
from ..models.zoo import load_debug_model, load_model
from ..parallel.mesh import get_mesh
from ..retrieval.search import Index, search_texts
from ..utils.logging import setup_logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Search an embedding index")
    p.add_argument("--index", required=True, help=".npz from cli.encode_cli")
    p.add_argument("--model", required=True)
    p.add_argument("--query", action="append", required=True, help="repeatable")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--debug-models", action="store_true")
    p.add_argument("--arch-models", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging(None)
    info = model_info(args.model)
    if args.debug_models:
        model = load_debug_model(info)
    elif args.arch_models:
        from ..models.arch import load_arch_model

        model = load_arch_model(args.model)
    else:
        model = load_model(info)

    index = Index.from_npz(args.index)
    engine = EncodingEngine(model, get_mesh(), batch_size=8)
    results = search_texts(model, engine, index, args.query, k=args.k)
    for q, hits in zip(args.query, results):
        print(f"query: {q}")
        for doc_id, score in hits:
            print(f"  {doc_id}\t{score:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
