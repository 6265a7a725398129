"""Autoregressive sampling for the decoder LMs with a KV cache.

The reference delegates generation to TRL/vLLM (train_rl_pure_lora.py:126-138,
baseline_test.py); here it is a jitted ``lax.scan`` over decode steps with a
static-shape KV cache — the TPU-native serving path (one compile, no
per-token dispatch). Supports left-padded prompt batches and temperature or
greedy sampling, for any registered decoder architecture (rl/policy.py:
Gemma stand-in or the reference's Qwen3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .policy import GEMMA, DecoderArch


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "greedy", "arch"))
def generate(
    params,
    cfg,
    prompt_ids: jax.Array,  # [B, Tp] LEFT-padded
    prompt_mask: jax.Array,  # [B, Tp]
    key: jax.Array,
    max_new: int,
    temperature: float = 1.0,
    greedy: bool = False,
    arch: DecoderArch = GEMMA,
):
    """Returns (tokens [B, max_new], logps [B, max_new]) sampled from the
    causal LM. logps are the behavior policy's log-probs of the sampled
    tokens (float32)."""
    b, tp = prompt_ids.shape
    cache_len = tp + max_new

    hidden, kv = arch.prefill(params, cfg, prompt_ids, prompt_mask, cache_len)
    prompt_len = jnp.sum(prompt_mask, axis=-1)  # [B]
    # left padding: the last valid prompt token sits at index tp-1; its
    # logits predict the first new token
    first_logits = arch.lm_logits(params, cfg, hidden[:, tp - 1 : tp])[:, 0]

    def sample_from(logits, k):
        if greedy:
            tok = jnp.argmax(logits, axis=-1)
        else:
            tok = jax.random.categorical(k, logits / jnp.maximum(temperature, 1e-6), axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return tok, jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]

    gen_slots = jnp.arange(max_new)[None, :]  # cache slots tp..tp+max_new-1

    def step(carry, i):
        kv, logits, k = carry
        k, ks = jax.random.split(k)
        tok, logp = sample_from(logits, ks)
        # token i is written at cache slot tp + i; its rope position is
        # prompt_len + i; attendable slots = valid prompt tokens (pad slots
        # excluded) + generated tokens 0..i
        pos = prompt_len + i
        cache_valid = jnp.concatenate(
            [prompt_mask > 0, jnp.broadcast_to(gen_slots <= i, (b, max_new))], axis=1
        )
        next_logits, kv = arch.decode_step(params, cfg, kv, tok, pos, tp + i, cache_valid)
        return (kv, next_logits, k), (tok, logp)

    (_, _, _), (toks, logps) = jax.lax.scan(
        step, (kv, first_logits, key), jnp.arange(max_new)
    )
    return toks.T.astype(jnp.int32), logps.T.astype(jnp.float32)
