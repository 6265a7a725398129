"""Supervised format pretraining for the offline RL stand-in base.

The reference's GRPO starts from a PRETRAINED Qwen3-14B that can already emit
JSON (train_rl_pure_lora.py:74-82); a random-init toy decoder cannot, and
sequence-level GRPO alone cannot cross the exploration chasm to an exact
20-byte JSON string. This module builds the equivalent starting point
offline: brief teacher-forcing on (prompt -> JSON completion) pairs whose
field VALUES are seed-random — the base learns the output format but carries
no task knowledge, so any later accuracy gain is attributable to GRPO
(mirrors verify_rl_debug.py's trained-vs-28%-baseline comparison protocol).
"""

from __future__ import annotations

import logging

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .policy import GEMMA, DecoderArch

logger = logging.getLogger("mme_tpu")


def format_pairs(
    dataset: list[dict], field: str, choices: list[str], seed: int = 0,
    balanced: bool = False,
) -> list[tuple[str, str]]:
    """(prompt, completion) pairs with uniformly random field values: format
    supervision only — expected accuracy of the pretrained base is chance.

    balanced=True pairs EVERY prompt with EVERY choice (|dataset|x|choices|
    pairs). The CE optimum is then a deterministic JSON scaffold with a
    uniform field value per prompt, so long pretraining drives the parse
    rate toward 1.0 WITHOUT collapsing within-group sampling diversity —
    the starting point GRPO needs (random-value pairing memorizes one
    value per prompt at convergence, killing the group advantage signal)."""
    if balanced:
        return [
            (r["prompt"], f'{{"{field}": "{c}"}}')
            for r in dataset
            for c in choices
        ]
    rng = np.random.default_rng(seed)
    return [
        (r["prompt"], f'{{"{field}": "{choices[int(rng.integers(len(choices)))]}"}}')
        for r in dataset
    ]


def supervised_pretrain(
    params,
    model_cfg,
    pairs: list[tuple[str, str]],
    steps: int,
    arch: DecoderArch = GEMMA,
    tokenizer=None,
    batch_size: int = 8,
    learning_rate: float = 3e-4,
    max_prompt_len: int = 256,
    max_completion_len: int = 32,
    seed: int = 0,
    log_every: int = 50,
):
    """Teacher-forcing CE on completion tokens (+EOS). Returns
    (trained params, per-step losses). Static shapes -> one compile."""
    from . import tokenizer as tok

    tk = tokenizer or tok.ByteTokenizer()
    p_ids_all, p_mask_all = tk.pad_left(
        [tk.encode(p, max_prompt_len) for p, _ in pairs], max_len=max_prompt_len
    )
    tn = max_completion_len
    c_ids_all = np.full((len(pairs), tn), tk.pad_id, np.int32)
    c_mask_all = np.zeros((len(pairs), tn), np.float32)
    for i, (_, comp) in enumerate(pairs):
        ids = list(tk.encode(comp, tn - 1)) + [tk.eos_id]
        c_ids_all[i, : len(ids)] = ids
        c_mask_all[i, : len(ids)] = 1.0

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def loss_fn(params, p_ids, p_mask, c_ids, c_mask):
        tp = p_ids.shape[1]
        full = jnp.concatenate([p_ids, c_ids], axis=1)
        mask = jnp.concatenate(
            [p_mask, jnp.ones_like(c_ids)], axis=1
        )  # pad targets keep attention but are loss-masked
        hidden = arch.apply(params, model_cfg, arch.embed(params, model_cfg, full), mask, True)
        logits = arch.lm_logits(params, model_cfg, hidden[:, tp - 1 : tp + tn - 1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, c_ids[:, :, None], axis=-1)[:, :, 0]
        return jnp.sum(nll * c_mask) / jnp.maximum(jnp.sum(c_mask), 1.0)

    @jax.jit
    def step(params, opt_state, p_ids, p_mask, c_ids, c_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, p_ids, p_mask, c_ids, c_mask)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    for s in range(steps):
        sel = rng.integers(0, len(pairs), size=batch_size)
        params, opt_state, loss = step(
            params,
            opt_state,
            jnp.asarray(p_ids_all[sel]),
            jnp.asarray(p_mask_all[sel]),
            jnp.asarray(c_ids_all[sel]),
            jnp.asarray(c_mask_all[sel]),
        )
        losses.append(float(loss))
        if s % log_every == 0:
            logger.info(f"pretrain step {s}: CE {losses[-1]:.4f}")
    return params, losses
