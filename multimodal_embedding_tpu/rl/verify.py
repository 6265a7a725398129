"""RL verification harnesses (reference verify_rl.py / verify_rl_debug.py /
baseline_smart_test.py).

Merges the LoRA adapters into the base weights (the reference's
``merge_and_unload``, verify_rl.py:27-28), greedily generates over the
dataset, and scores: no-<think> rate, clean-JSON rate, and decision/category
accuracy vs ground truth. Architecture- and tokenizer-agnostic: the Gemma
stand-in with the byte tokenizer offline, or Qwen3 with the HF tokenizer +
chat template (verify_rl.py:34-44) when a checkpoint is present.
"""

from __future__ import annotations

import json
import logging

import numpy as np
import jax
import jax.numpy as jnp

from . import tokenizer as tok
from .generate import generate
from .lora import LoraConfig, lora_merge
from .policy import GEMMA, DecoderArch

logger = logging.getLogger("mme_tpu")


def extract_json_field(text: str, field: str) -> str | None:
    """Lenient extraction (baseline_smart_test.py:83-99 spirit): strict JSON
    first, then a regex fallback."""
    s = text.strip()
    try:
        return json.loads(s).get(field)
    except (json.JSONDecodeError, AttributeError):
        pass
    import re

    m = re.search(rf'"{field}"\s*:\s*"([A-Z_+]+)"', s)
    return m.group(1) if m else None


def evaluate(
    params,
    model_cfg,
    dataset: list[dict],
    answer_field: str,
    max_new: int = 48,
    batch_size: int = 8,
    max_prompt_len: int = 256,
    arch: DecoderArch = GEMMA,
    tokenizer=None,
    system_prompt: str | None = None,
) -> dict:
    """Greedy generation + scoring. dataset: [{'prompt', 'answer'}]."""
    tk = tokenizer or tok.ByteTokenizer()
    n = len(dataset)
    texts: list[str] = []
    for s in range(0, n, batch_size):
        batch = dataset[s : s + batch_size]
        ids = [
            tk.encode(tk.format_prompt(r["prompt"], system_prompt), max_prompt_len)
            for r in batch
        ]
        pad = batch_size - len(batch)
        ids += [ids[-1]] * pad
        p_ids, p_mask = tk.pad_left(ids, max_len=max_prompt_len)
        comps, _ = generate(
            params, model_cfg, jnp.asarray(p_ids), jnp.asarray(p_mask),
            jax.random.key(0), max_new=max_new, greedy=True, arch=arch,
        )
        comps = np.asarray(comps)[: len(batch)]
        texts.extend(tk.decode_until_eos(c) for c in comps)

    no_think = sum("<think>" not in t for t in texts)
    clean_json = 0
    correct = 0
    for rec, t in zip(dataset, texts):
        s = t.strip()
        try:
            json.loads(s)
            clean_json += 1
        except json.JSONDecodeError:
            pass
        if extract_json_field(t, answer_field) == rec["answer"]:
            correct += 1
    return {
        "no_think_rate": 100.0 * no_think / n,
        "clean_json_rate": 100.0 * clean_json / n,
        "accuracy": 100.0 * correct / n,
        "n": n,
    }


def evaluate_merged(
    base_params, adapters, lora_cfg: LoraConfig, model_cfg,
    dataset: list[dict], answer_field: str, **kw,
) -> dict:
    merged = lora_merge(base_params, adapters, lora_cfg)
    return evaluate(merged, model_cfg, dataset, answer_field, **kw)
