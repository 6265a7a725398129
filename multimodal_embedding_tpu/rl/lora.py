"""LoRA adapters for the decoder LMs (Gemma and Qwen3 — any params tree
with stacked ``layers.attn.{q,k,v,o}`` projections).

Mirrors the reference's PEFT config (train_rl_pure_lora.py:98-105): rank-r
adapters with alpha scaling on the q/k/v/o attention projections only. Pure
functional: adapters are a separate pytree; ``apply_lora`` returns params
with W + (alpha/r) * A @ B folded per layer lazily at apply time (merge), or
adapters can be trained standalone and merged for verification
(verify_rl.py:27-28's merge_and_unload equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

TARGETS = ("q", "k", "v", "o")


@dataclass(frozen=True)
class LoraConfig:
    rank: int = 16
    alpha: int = 32
    targets: tuple[str, ...] = TARGETS


def lora_init(key, base_params, cfg: LoraConfig, dtype=jnp.float32):
    """Adapters for the stacked decoder layer params: for each target proj
    [L, d_in, d_out] -> a [L, d_in, r] (gaussian), b [L, r, d_out] (zeros)."""
    adapters = {}
    keys = jax.random.split(key, len(cfg.targets))
    for k, name in zip(keys, cfg.targets):
        w = base_params["layers"]["attn"][name]  # [L, d_in, d_out]
        l, d_in, d_out = w.shape
        adapters[name] = {
            "a": jax.random.normal(k, (l, d_in, cfg.rank), dtype) * (1.0 / cfg.rank),
            "b": jnp.zeros((l, cfg.rank, d_out), dtype),
        }
    return adapters


def lora_merge(base_params, adapters, cfg: LoraConfig):
    """Fold adapters into the base weights (merge_and_unload)."""
    scale = cfg.alpha / cfg.rank
    out = jax.tree.map(lambda x: x, base_params)  # shallow copy tree
    attn = dict(out["layers"]["attn"])
    for name, ab in adapters.items():
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
        attn[name] = attn[name] + delta.astype(attn[name].dtype)
    layers = dict(out["layers"])
    layers["attn"] = attn
    out = dict(out)
    out["layers"] = layers
    return out


def apply_lora(base_params, adapters, cfg: LoraConfig):
    """Merged-params view for the forward pass (differentiable w.r.t.
    adapters; base weights are constants)."""
    return lora_merge(base_params, adapters, cfg)


# backwards-compatible name from when Gemma was the only decoder
apply_lora_to_gemma = apply_lora
