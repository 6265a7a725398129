"""CLI: RL verification (reference verify_rl.py / verify_rl_debug.py).

Loads the trained LoRA adapters, merges them into the base policy
(merge_and_unload, verify_rl.py:27-28), greedily generates over the dataset,
and reports no-<think> rate, clean-JSON rate, and decision accuracy —
optionally against the untrained baseline (baseline_test.py's comparison).
"""

from __future__ import annotations

import argparse
import logging

import numpy as np
import jax

from ..models.gemma import gemma_init
from ..rl.datasets import generate_fintech_dataset, generate_support_tickets
from ..rl.lora import LoraConfig
from ..rl.verify import evaluate, evaluate_merged
from ..utils.logging import setup_logging
from .train_rl import default_gemma_config

logger = logging.getLogger("mme_tpu")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Verify GRPO/LoRA results")
    p.add_argument("--task", choices=["support", "fintech"], default="support")
    p.add_argument("--model-size", choices=["debug", "small"], default="small")
    p.add_argument("--adapters", type=str, default="rl_result/lora_adapters.npz")
    p.add_argument("--dataset-size", type=int, default=50)
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--lora-alpha", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--baseline", action="store_true", help="Also evaluate the untrained base")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging("verify_rl.log")

    gcfg = default_gemma_config(args.model_size)
    base = gemma_init(jax.random.key(args.seed), gcfg)

    if args.task == "support":
        dataset = generate_support_tickets(args.dataset_size, seed=args.seed + 1)
        field = "category"
    else:
        dataset = generate_fintech_dataset(args.dataset_size, seed=args.seed + 1)
        field = "decision"

    if args.baseline:
        stats = evaluate(base, gcfg, dataset, field)
        logger.info(f"BASELINE: {stats}")

    data = np.load(args.adapters)
    adapters = {}
    for key in data.files:
        name, part = key.split(".")
        adapters.setdefault(name, {})[part] = data[key]
    lcfg = LoraConfig(rank=args.lora_rank, alpha=args.lora_alpha)
    stats = evaluate_merged(base, adapters, lcfg, gcfg, dataset, field)
    logger.info(f"TRAINED: {stats}")
    print(stats)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
