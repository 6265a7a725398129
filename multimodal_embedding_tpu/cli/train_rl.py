"""CLI: GRPO/LoRA RL fine-tuning (Workload B).

Reference entry points ``train_rl_pure_lora.py`` (support tickets) and
``train_rl_hard.py`` (fintech) map to ``--task support`` / ``--task fintech``
with the reference's hyperparameters as defaults (lr 1e-5, 8 generations,
grad-accum 4, 5 epochs — train_rl_pure_lora.py:108-123). Offline, the policy
is a Gemma decoder (configurable size, random init or --base-params) with the
byte-level tokenizer; adapters are checkpointed as .npz.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np
import jax

from ..models.gemma import GemmaConfig, gemma_init
from ..rl.datasets import generate_fintech_dataset, generate_support_tickets
from ..rl.grpo import GRPOConfig, GRPOTrainer
from ..rl.lora import LoraConfig
from ..rl.rewards import fintech_reward, support_ticket_reward
from ..rl import tokenizer as tok
from ..utils.logging import setup_logging

logger = logging.getLogger("mme_tpu")


def default_gemma_config(size: str) -> GemmaConfig:
    if size == "debug":
        return GemmaConfig(
            vocab_size=tok.VOCAB_SIZE, dim=64, layers=2, heads=4, kv_heads=2,
            head_dim=16, mlp_dim=128,
        )
    if size == "small":
        return GemmaConfig(
            vocab_size=tok.VOCAB_SIZE, dim=512, layers=8, heads=8, kv_heads=1,
            head_dim=64, mlp_dim=2048,
        )
    raise ValueError(size)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GRPO + LoRA RL trainer (TPU)")
    p.add_argument("--task", choices=["support", "fintech"], default="support")
    p.add_argument("--model-size", choices=["debug", "small"], default="small")
    p.add_argument("--dataset-size", type=int, default=50)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--num-generations", type=int, default=8)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=48)
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--lora-alpha", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-dir", type=str, default="rl_result")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging("train_rl.log")

    gcfg = default_gemma_config(args.model_size)
    base = gemma_init(jax.random.key(args.seed), gcfg)

    if args.task == "support":
        dataset = generate_support_tickets(args.dataset_size, seed=args.seed)
        reward = support_ticket_reward
    else:
        dataset = generate_fintech_dataset(args.dataset_size, seed=args.seed)
        reward = fintech_reward

    cfg = GRPOConfig(
        learning_rate=args.learning_rate,
        group_size=args.num_generations,
        epochs=args.epochs,
        grad_accum=args.grad_accum,
        max_new_tokens=args.max_new_tokens,
        lora=LoraConfig(rank=args.lora_rank, alpha=args.lora_alpha),
        seed=args.seed,
    )
    trainer = GRPOTrainer(base, gcfg, reward, cfg)
    logger.info(f"GRPO training: task={args.task}, {len(dataset)} prompts, {cfg}")
    stats = trainer.train(dataset)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat = {}
    for name, ab in trainer.adapters.items():
        flat[f"{name}.a"] = np.asarray(ab["a"])
        flat[f"{name}.b"] = np.asarray(ab["b"])
    np.savez(out / "lora_adapters.npz", **flat)
    np.savez(out / "training_stats.npz", **{k: np.asarray(v) for k, v in stats.items()})
    logger.info(
        f"Saved adapters to {out}/lora_adapters.npz — "
        f"final mean reward {np.mean(stats['mean_reward'][-8:]):.2f} "
        f"(first window {np.mean(stats['mean_reward'][:8]):.2f})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
