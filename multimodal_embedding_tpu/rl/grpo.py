"""GRPO trainer: group-relative policy optimization with LoRA adapters.

JAX re-design of the reference's TRL ``GRPOTrainer`` setup
(train_rl_pure_lora.py:108-138): per prompt, sample a group of G completions
from the current policy, normalize rewards within the group to advantages,
and apply a policy-gradient step on the LoRA adapters only, with a k3 KL
penalty to the frozen base policy (TRL's estimator). Hyperparameters mirror
the reference config: lr 1e-5, 8 generations, grad-accum 4, 5 epochs.

The policy architecture is pluggable (rl/policy.py): the Gemma stand-in for
offline runs, or the reference's actual Qwen3 family (Qwen/Qwen3-14B,
train_rl_pure_lora.py:74-82) with the HF tokenizer + chat template
(rl/hf_tokenizer.py) when a checkpoint is present.

Everything hot is jitted: sampling is the KV-cache scan in rl/generate.py;
the loss is one teacher-forcing forward over [prompt | completions] with
per-token masks (tokens after EOS excluded).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax

from . import tokenizer as tok
from .lora import LoraConfig, apply_lora, lora_init
from .policy import GEMMA, DecoderArch

import logging

logger = logging.getLogger("mme_tpu")


@dataclass
class GRPOConfig:
    learning_rate: float = 1e-5
    group_size: int = 8  # num_generations (reference :115)
    epochs: int = 5
    grad_accum: int = 4
    max_prompt_len: int = 256
    max_new_tokens: int = 48
    temperature: float = 1.0
    kl_beta: float = 0.04
    lora: LoraConfig = field(default_factory=LoraConfig)
    seed: int = 42


def _completion_logps(params, cfg, prompt_ids, prompt_mask, completions, arch: DecoderArch = GEMMA):
    """Teacher-forcing log-probs of completion tokens.

    prompt_ids [B, Tp] left-padded; completions [B, Tn].
    Returns logps [B, Tn] (f32)."""
    b, tp = prompt_ids.shape
    tn = completions.shape[1]
    full = jnp.concatenate([prompt_ids, completions], axis=1)
    mask = jnp.concatenate([prompt_mask, jnp.ones((b, tn), prompt_mask.dtype)], axis=1)
    embeds = arch.embed(params, cfg, full)
    hidden = arch.apply(params, cfg, embeds, mask, True)
    # logits at index tp-1+i predict completion[i]
    logits = arch.lm_logits(params, cfg, hidden[:, tp - 1 : tp + tn - 1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, completions[:, :, None], axis=-1)[:, :, 0]


def _parses_as_json(text: str) -> bool:
    """Lenient: does the completion contain a parseable JSON object? Mirrors
    the reward functions' extraction (strip, else first {...} span) so the
    telemetry tracks the same format chasm the rewards gate on."""
    import json
    import re

    for cand in (text.strip(), *re.findall(r"\{.*?\}", text, re.DOTALL)[:1]):
        try:
            if isinstance(json.loads(cand), dict):
                return True
        except (json.JSONDecodeError, ValueError):
            continue
    return False


def completion_token_mask(completions: jax.Array, eos_id: int = tok.EOS_ID) -> jax.Array:
    """1.0 for tokens up to and including the first EOS, 0 after."""
    is_eos = completions == eos_id
    after = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(jnp.int32)
    return (after == 0).astype(jnp.float32)


class GRPOTrainer:
    def __init__(
        self,
        base_params,
        model_cfg,
        reward_fn: Callable[[str, str], float],
        cfg: GRPOConfig | None = None,
        arch: DecoderArch = GEMMA,
        tokenizer=None,
        system_prompt: str | None = None,
    ):
        self.base = base_params
        self.model_cfg = model_cfg
        self.reward_fn = reward_fn
        self.cfg = cfg or GRPOConfig()
        self.arch = arch
        self.tokenizer = tokenizer or tok.ByteTokenizer()
        self.system_prompt = system_prompt
        self.adapters = lora_init(
            jax.random.key(self.cfg.seed), base_params, self.cfg.lora
        )
        self.opt = optax.adamw(self.cfg.learning_rate)
        self.opt_state = self.opt.init(self.adapters)
        self._key = jax.random.key(self.cfg.seed + 1)

        cfg_ = self.cfg
        mcfg = self.model_cfg
        base = self.base

        def loss_fn(adapters, prompt_ids, prompt_mask, completions, comp_mask, advantages, ref_logps):
            merged = apply_lora(base, adapters, cfg_.lora)
            logps = _completion_logps(merged, mcfg, prompt_ids, prompt_mask, completions, arch)
            denom = jnp.maximum(jnp.sum(comp_mask), 1.0)
            pg = -jnp.sum(advantages[:, None] * logps * comp_mask) / denom
            # TRL k3 KL estimator vs the frozen base policy
            diff = ref_logps - logps
            kl = jnp.sum((jnp.exp(diff) - diff - 1.0) * comp_mask) / denom
            return pg + cfg_.kl_beta * kl, (pg, kl)

        self._grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

        def update(opt_state, adapters, grads):
            updates, opt_state = self.opt.update(grads, opt_state, adapters)
            return opt_state, optax.apply_updates(adapters, updates)

        self._update = jax.jit(update)

    def policy_params(self):
        return apply_lora(self.base, self.adapters, self.cfg.lora)

    # --- checkpoint / resume -------------------------------------------------

    def save_state(self, path) -> None:
        """Full training-state checkpoint (adapters + optimizer moments) —
        mid-run resume the reference lacks (it only saves the final model,
        train_rl_pure_lora.py:137)."""
        import numpy as np

        from ..models.checkpoint import _flatten

        flat = {f"adapters/{k}": v for k, v in _flatten(self.adapters).items()}
        opt_leaves = jax.tree.leaves(self.opt_state)
        for i, leaf in enumerate(opt_leaves):
            flat[f"opt/{i}"] = np.asarray(leaf)
        np.savez(path, **flat)

    def load_state(self, path) -> None:
        import numpy as np

        from ..models.checkpoint import _unflatten

        data = np.load(path)
        self.adapters = _unflatten(
            {k[len("adapters/"):]: data[k] for k in data.files if k.startswith("adapters/")}
        )
        opt_leaves = [
            jnp.asarray(data[f"opt/{i}"])
            for i in range(sum(1 for k in data.files if k.startswith("opt/")))
        ]
        self.opt_state = jax.tree.unflatten(
            jax.tree.structure(self.opt_state), opt_leaves
        )

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def rollout(self, prompt: str):
        """Sample a group of completions for one prompt; returns
        (prompt_ids, prompt_mask, completions, texts, rewards)."""
        from .generate import generate

        g = self.cfg.group_size
        tk = self.tokenizer
        formatted = tk.format_prompt(prompt, self.system_prompt)
        ids = tk.encode(formatted, self.cfg.max_prompt_len)
        # bucket the padded prompt length to a multiple of 32: every distinct
        # length otherwise compiles its own generate/grad/ref-logps
        # executables, and the accumulated code maps of a long CPU run
        # exhaust vm.max_map_count (observed as LLVM 'Cannot allocate
        # memory' ~600 rollouts in). Left-padding further is semantics-free
        # (mask-driven positions).
        bucket = min(self.cfg.max_prompt_len, -(-len(ids) // 32) * 32)
        prompt_ids, prompt_mask = tk.pad_left([ids] * g, max_len=bucket)
        completions, _ = generate(
            self.policy_params(),
            self.model_cfg,
            jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask),
            self._next_key(),
            max_new=self.cfg.max_new_tokens,
            temperature=self.cfg.temperature,
            arch=self.arch,
        )
        completions = np.asarray(completions)
        texts = [tk.decode_until_eos(c) for c in completions]
        rewards = np.asarray([self.reward_fn(prompt, t) for t in texts], np.float32)
        return prompt_ids, prompt_mask, completions, texts, rewards

    def train(self, dataset: list[dict], log_every: int = 8) -> dict:
        """dataset: [{'prompt': str, ...}]. Returns training stats."""
        cfg = self.cfg
        stats = {"mean_reward": [], "loss": [], "kl": [],
                 "parse_rate": [], "adv_std": []}
        step_grads = None
        n_accum = 0
        for epoch in range(cfg.epochs):
            order = np.random.default_rng(cfg.seed + epoch).permutation(len(dataset))
            for si, di in enumerate(order):
                prompt = dataset[int(di)]["prompt"]
                p_ids, p_mask, comps, texts, rewards = self.rollout(prompt)
                adv = (rewards - rewards.mean()) / (rewards.std() + 1e-4)
                # learning-health telemetry (r4 verdict): a flat reward with
                # parse_rate ~0 means rollouts never cross the JSON format
                # chasm; adv_std ~0 means the group carries no learning signal
                parse_rate = float(np.mean([_parses_as_json(t) for t in texts]))
                adv_std = float(rewards.std())
                comp_mask = completion_token_mask(jnp.asarray(comps), self.tokenizer.eos_id)
                ref_logps = _completion_logps(
                    self.base, self.model_cfg, jnp.asarray(p_ids), jnp.asarray(p_mask),
                    jnp.asarray(comps), self.arch,
                )
                (loss, (pg, kl)), grads = self._grad_fn(
                    self.adapters,
                    jnp.asarray(p_ids),
                    jnp.asarray(p_mask),
                    jnp.asarray(comps),
                    comp_mask,
                    jnp.asarray(adv),
                    ref_logps,
                )
                step_grads = (
                    grads
                    if step_grads is None
                    else jax.tree.map(jnp.add, step_grads, grads)
                )
                n_accum += 1
                if n_accum == cfg.grad_accum:
                    step_grads = jax.tree.map(lambda g: g / cfg.grad_accum, step_grads)
                    self.opt_state, self.adapters = self._update(
                        self.opt_state, self.adapters, step_grads
                    )
                    step_grads, n_accum = None, 0

                stats["mean_reward"].append(float(rewards.mean()))
                stats["loss"].append(float(loss))
                stats["kl"].append(float(kl))
                stats["parse_rate"].append(parse_rate)
                stats["adv_std"].append(adv_std)
                if si % log_every == 0:
                    logger.info(
                        f"epoch {epoch} step {si}: reward {rewards.mean():.2f} "
                        f"loss {float(loss):.4f} kl {float(kl):.5f} "
                        f"parse {parse_rate:.2f} adv_std {adv_std:.2f}"
                    )
        return stats
