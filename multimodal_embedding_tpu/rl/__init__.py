"""Workload B: GRPO/LoRA RL fine-tuning pipeline (reference SURVEY.md §2.3).

TPU-native re-design of the reference's TRL-based trainers
(train_rl_pure_lora.py, train_rl_hard.py): a JAX GRPO loop with LoRA adapters
over the Gemma decoder, KV-cache sampling on device, keyword-reward functions
with the reference's exact scoring semantics, synthetic dataset generators,
and merge-and-verify evaluation harnesses.
"""

from .lora import lora_init, lora_merge, apply_lora_to_gemma
from .rewards import support_ticket_reward, fintech_reward
from .datasets import generate_fintech_dataset, generate_support_tickets

__all__ = [
    "lora_init",
    "lora_merge",
    "apply_lora_to_gemma",
    "support_ticket_reward",
    "fintech_reward",
    "generate_fintech_dataset",
    "generate_support_tickets",
]
