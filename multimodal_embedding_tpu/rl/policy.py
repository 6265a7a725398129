"""Decoder-architecture registry for the RL stack.

The reference's RL pipeline is model-agnostic through HF ``AutoModelForCausalLM``
(train_rl_pure_lora.py:77-82); here each JAX decoder exports the same small
function surface and the GRPO/generation/verify code is parametrized by a
``DecoderArch`` bundle. Gemma is the offline stand-in; Qwen3 is the
reference's actual base model family (Qwen/Qwen3-14B).

All members are plain functions, so a frozen dataclass instance is hashable
and can ride through ``jax.jit`` static arguments.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class DecoderArch:
    """Uniform functional surface over a causal decoder LM.

    embed:       (params, cfg, ids [B,T]) -> [B,T,D]
    apply:       (params, cfg, embeds, attn_mask, causal) -> hidden [B,T,D]
    lm_logits:   (params, cfg, hidden) -> logits [B,T,V] f32
    prefill:     (params, cfg, ids, attn_mask, cache_len) -> (hidden, kv)
    decode_step: (params, cfg, kv, token, pos, write_idx, cache_valid)
                 -> (logits [B,V], kv)
    init:        (key, cfg, dtype=...) -> params
    """

    name: str
    embed: Callable
    apply: Callable
    lm_logits: Callable
    prefill: Callable
    decode_step: Callable
    init: Callable


def _gemma_arch() -> DecoderArch:
    from ..models import gemma as g

    return DecoderArch(
        name="gemma",
        embed=g.gemma_embed,
        apply=g.gemma_apply,
        lm_logits=g.gemma_lm_logits,
        prefill=g.gemma_prefill,
        decode_step=g.gemma_decode_step,
        init=g.gemma_init,
    )


def _qwen3_arch() -> DecoderArch:
    from ..models import qwen3 as q

    return DecoderArch(
        name="qwen3",
        embed=q.qwen3_embed,
        apply=q.qwen3_apply,
        lm_logits=q.qwen3_lm_logits,
        prefill=q.qwen3_prefill,
        decode_step=q.qwen3_decode_step,
        init=q.qwen3_init,
    )


GEMMA = _gemma_arch()
QWEN3 = _qwen3_arch()

ARCHS = {"gemma": GEMMA, "qwen3": QWEN3}


def get_arch(name: str) -> DecoderArch:
    return ARCHS[name]
