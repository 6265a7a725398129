"""CLI: GRPO/LoRA RL fine-tuning (Workload B).

Reference entry points ``train_rl_pure_lora.py`` (support tickets) and
``train_rl_hard.py`` (fintech) map to ``--task support`` / ``--task fintech``
with the reference's hyperparameters as defaults (lr 1e-5, 8 generations,
grad-accum 4, 5 epochs — train_rl_pure_lora.py:108-123).

``--arch qwen3`` selects the reference's actual base-model family
(Qwen/Qwen3-14B, train_rl_pure_lora.py:74-82); ``--base-params`` loads a
converted native checkpoint (models/checkpoint.py) and ``--tokenizer``
switches to the HF tokenizer + chat template (prepare_data.py's
system/user message format). Offline defaults: random-init decoder at
``--model-size`` with the byte-level tokenizer; adapters are checkpointed
as .npz.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np
import jax

from ..models.gemma import GemmaConfig
from ..models.qwen3 import QWEN3_14B, Qwen3Config
from ..rl.datasets import generate_fintech_dataset, generate_support_tickets
from ..rl.grpo import GRPOConfig, GRPOTrainer
from ..rl.lora import LoraConfig
from ..rl.policy import get_arch
from ..rl.rewards import fintech_reward, support_ticket_reward
from ..rl import tokenizer as tok
from ..utils.logging import setup_logging

logger = logging.getLogger("mme_tpu")

# The reference's system prompt (train_rl_pure_lora.py:89 / prepare_data.py),
# applied when the HF chat template is active.
REFERENCE_SYSTEM_PROMPT = (
    "You are a strict data extraction engine.\n"
    "RULES:\n"
    "1. Output ONLY a JSON object.\n"
    "2. DO NOT use <think> tags.\n"
    '3. Allowed categories: ["BILLING", "TECHNICAL", "SHIPPING", "PRODUCT", "OTHER"].'
)


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


def default_qwen3_config(size: str, vocab_size: int | None = None) -> Qwen3Config:
    """Qwen3 geometry at reduced scale for offline runs; 'full' is the true
    Qwen/Qwen3-14B config (for checkpoint loads / multi-chip)."""
    v = vocab_size or tok.VOCAB_SIZE
    if size == "debug":
        return Qwen3Config(
            vocab_size=v, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16,
            mlp_dim=128, tie_embeddings=True,
        )
    if size == "small":
        return Qwen3Config(
            vocab_size=v, dim=512, layers=8, heads=8, kv_heads=4, head_dim=64,
            mlp_dim=2048, tie_embeddings=True,
        )
    if size == "full":
        return QWEN3_14B
    raise ValueError(size)


def build_model(args):
    """(base_params, model_cfg, arch, tokenizer, system_prompt) per CLI args."""
    arch = get_arch(args.arch)
    tokenizer = tok.ByteTokenizer()
    system_prompt = args.system_prompt
    if args.tokenizer:
        from ..rl.hf_tokenizer import HFTokenizer

        tokenizer = HFTokenizer(args.tokenizer)
        if system_prompt is None:
            system_prompt = REFERENCE_SYSTEM_PROMPT

    if args.base_params:
        from ..models.checkpoint import load_params

        base, mcfg = load_params(args.base_params)
        want = Qwen3Config if args.arch == "qwen3" else GemmaConfig
        if not isinstance(mcfg, want):
            raise SystemExit(
                f"--base-params checkpoint is a {type(mcfg).__name__} but "
                f"--arch {args.arch} expects {want.__name__}; pass the "
                f"matching --arch for this checkpoint"
            )
        logger.info(f"Loaded base params from {args.base_params}: {mcfg}")
    else:
        if args.arch == "qwen3":
            mcfg = default_qwen3_config(args.model_size, tokenizer.vocab_size)
        else:
            if args.model_size == "full":
                raise SystemExit("--model-size full requires --arch qwen3")
            mcfg = default_gemma_config(args.model_size)
            if tokenizer.vocab_size != mcfg.vocab_size:
                import dataclasses

                mcfg = dataclasses.replace(mcfg, vocab_size=tokenizer.vocab_size)
        base = arch.init(jax.random.key(args.seed), mcfg)
    return base, mcfg, arch, tokenizer, system_prompt


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="GRPO + LoRA RL trainer (TPU)")
    p.add_argument("--task", choices=["support", "fintech"], default="support")
    p.add_argument("--arch", choices=["gemma", "qwen3"], default="gemma",
                   help="policy architecture (qwen3 = the reference's base model family)")
    p.add_argument("--model-size", choices=["debug", "small", "full"], default="small")
    p.add_argument("--base-params", type=str, default=None,
                   help="native .npz checkpoint of converted base weights")
    p.add_argument("--tokenizer", type=str, default=None,
                   help="HF tokenizer dir/id (local) -> chat-template prompts; default byte-level")
    p.add_argument("--system-prompt", type=str, default=None)
    p.add_argument("--dataset-size", type=int, default=50)
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--num-generations", type=int, default=8)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--grad-accum", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=48)
    p.add_argument("--temperature", type=float, default=1.0,
                   help="rollout sampling temperature")
    p.add_argument("--kl-beta", type=float, default=0.04,
                   help="KL penalty weight toward the frozen base "
                        "(reference default 0.04)")
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--lora-alpha", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output-dir", type=str, default="rl_result")
    p.add_argument("--format-pretrain", type=int, default=0,
                   help="supervised format-pretraining steps on the base "
                        "before GRPO (random field values — the offline "
                        "equivalent of the reference's pretrained Qwen3 base "
                        "that can already emit JSON)")
    p.add_argument("--save-base", type=str, default=None,
                   help="persist the (possibly pretrained) base params as a "
                        "native .npz for verify_rl --base-params")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    setup_logging("train_rl.log")

    base, mcfg, arch, tokenizer, system_prompt = build_model(args)

    if args.task == "support":
        dataset = generate_support_tickets(args.dataset_size, seed=args.seed)
        reward = support_ticket_reward
        field, choices = "category", ["BILLING", "TECHNICAL", "SHIPPING", "OTHER"]
    else:
        dataset = generate_fintech_dataset(args.dataset_size, seed=args.seed)
        reward = fintech_reward
        field, choices = "decision", [
            "STANDARD_LOAN", "MANUAL_REVIEW", "REJECT_RISK", "A_PLUS_TIER",
        ]

    if args.format_pretrain:
        from ..rl.pretrain import format_pairs, supervised_pretrain

        pairs = format_pairs(dataset, field, choices, seed=args.seed)
        logger.info(f"Format pretraining: {args.format_pretrain} steps on {len(pairs)} pairs")
        base, pre_losses = supervised_pretrain(
            base, mcfg, pairs, args.format_pretrain, arch=arch, tokenizer=tokenizer,
            seed=args.seed,
        )
        logger.info(
            f"Pretrain CE: {pre_losses[0]:.3f} -> {np.mean(pre_losses[-20:]):.3f}"
        )

    if args.save_base:
        from ..models.checkpoint import save_params

        save_params(args.save_base, base, mcfg)
        logger.info(f"Saved base params to {args.save_base}")

    cfg = GRPOConfig(
        learning_rate=args.learning_rate,
        group_size=args.num_generations,
        epochs=args.epochs,
        grad_accum=args.grad_accum,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        kl_beta=args.kl_beta,
        lora=LoraConfig(rank=args.lora_rank, alpha=args.lora_alpha),
        seed=args.seed,
    )
    trainer = GRPOTrainer(
        base, mcfg, reward, cfg, arch=arch, tokenizer=tokenizer,
        system_prompt=system_prompt,
    )
    logger.info(
        f"GRPO training: task={args.task}, arch={args.arch}, "
        f"tokenizer={tokenizer.name}, {len(dataset)} prompts, {cfg}"
    )
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
