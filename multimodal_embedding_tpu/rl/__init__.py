"""Workload B: GRPO/LoRA RL fine-tuning pipeline (reference SURVEY.md §2.3).

TPU-native re-design of the reference's TRL-based trainers
(train_rl_pure_lora.py, train_rl_hard.py): a JAX GRPO loop with LoRA adapters
over a pluggable decoder (the Gemma stand-in offline, or the reference's
Qwen3 family — rl/policy.py), KV-cache sampling on device, keyword-reward
functions with the reference's exact scoring semantics, synthetic dataset
generators, and merge-and-verify evaluation harnesses.
"""

from .lora import lora_init, lora_merge, apply_lora, apply_lora_to_gemma
from .policy import GEMMA, QWEN3, DecoderArch, get_arch
from .rewards import support_ticket_reward, fintech_reward
from .datasets import generate_fintech_dataset, generate_support_tickets

__all__ = [
    "lora_init",
    "lora_merge",
    "apply_lora",
    "apply_lora_to_gemma",
    "GEMMA",
    "QWEN3",
    "DecoderArch",
    "get_arch",
    "support_ticket_reward",
    "fintech_reward",
    "generate_fintech_dataset",
    "generate_support_tickets",
]
