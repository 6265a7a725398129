"""Dataset forensics (reference A27: inspect_coco.py, inspect_caption_counts.py,
test_flickr_splits.py).

Subcommands:
- schema:    probe a dataset's columns/keys and a sample record
- captions:  caption-count histogram (motivates the >=5-caption prefilter)
- splits:    validate Flickr30k candidates against the Karpathy split sizes
             (train~29k / val~1k / test~1k, test_flickr_splits.py:60-82)
"""

from __future__ import annotations

import argparse
from collections import Counter

from ..data.captions import get_all_captions


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Dataset forensics")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("schema")
    s.add_argument("--dataset", default="yerevann/coco-karpathy")
    s.add_argument("--split", default="test")

    c = sub.add_parser("captions")
    c.add_argument("--dataset", default="yerevann/coco-karpathy")
    c.add_argument("--split", default="test")
    c.add_argument("--column", default="sentences")

    f = sub.add_parser("splits")
    f.add_argument("--candidates", default="nlphuji/flickr30k,lmms-lab/flickr30k")
    return p.parse_args(argv)


KARPATHY_FLICKR = {"train": (28000, 30000), "val": (900, 1100), "test": (900, 1100)}


def cmd_schema(args) -> int:
    from datasets import load_dataset

    ds = load_dataset(args.dataset, split=args.split, num_proc=1)
    print(f"{args.dataset}[{args.split}]: {len(ds)} rows")
    print("columns:", ds.column_names)
    item = ds[0]
    for k, v in item.items():
        desc = f"{type(v).__name__}"
        if isinstance(v, str):
            desc += f" = {v[:80]!r}"
        elif isinstance(v, list):
            desc += f"[{len(v)}]"
        print(f"  {k}: {desc}")
    return 0


def cmd_captions(args) -> int:
    from datasets import load_dataset

    ds = load_dataset(args.dataset, split=args.split, num_proc=1)
    counts = Counter(len(get_all_captions(item, args.column)) for item in ds)
    print(f"caption-count histogram over {len(ds)} rows:")
    for n_caps in sorted(counts):
        print(f"  {n_caps} captions: {counts[n_caps]} images")
    ge5 = sum(v for k, v in counts.items() if k >= 5)
    print(f">=5 captions: {ge5} ({100 * ge5 / len(ds):.1f}%) — the prefilter keeps these")
    return 0


def cmd_splits(args) -> int:
    from datasets import get_dataset_split_names, load_dataset

    ok_any = False
    for cand in args.candidates.split(","):
        print(f"\n=== {cand} ===")
        try:
            splits = get_dataset_split_names(cand)
        except Exception as e:
            print(f"  ❌ cannot enumerate splits: {e}")
            continue
        for split in splits:
            ds = load_dataset(cand, split=split)
            sizes = Counter(x.get("split", split) for x in ds) if "split" in ds.column_names else {split: len(ds)}
            for name, n in sizes.items():
                band = KARPATHY_FLICKR.get(name)
                verdict = "✅" if band and band[0] <= n <= band[1] else "❌"
                print(f"  {name}: {n} {verdict}")
                ok_any = ok_any or verdict == "✅"
    return 0 if ok_any else 1


def main(argv=None) -> int:
    args = parse_args(argv)
    return {"schema": cmd_schema, "captions": cmd_captions, "splits": cmd_splits}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
