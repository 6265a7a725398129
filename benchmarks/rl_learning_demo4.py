"""GRPO learning demonstration, take 4 (r5): balanced format pretraining.

Take 3 (support task, random-value format pretrain to CE 0.164) produced a
policy whose JSON parse rate at T=1.0 was only 0.22 — the per-byte entropy
left over from *under*-training the scaffold multiplies over ~24 bytes, so
~4/5 rollouts earn only the format penalties and the group advantage signal
on the category byte is diluted ~5x. Pretraining longer with random-value
pairs doesn't fix this: at convergence the model memorizes the one random
category assigned to each prompt (take 1: CE 0.0075, zero group variance).

Take 4 uses BALANCED pairs — every prompt x every category
(rl/pretrain.py format_pairs(balanced=True)). The CE optimum is then a
deterministic scaffold with a UNIFORM category per prompt: long pretraining
drives parse -> ~1.0 while the decisive byte (category initial: B/T/S/O —
the branch is deterministic after its first byte under a byte tokenizer)
stays ~uniform. GRPO's remaining job is exactly the reference's demo claim
(train_rl_pure_lora.py): route tickets, i.e. move that one byte's
distribution from uniform to correct, rewarded +15 vs +2/-10.

Protocol unchanged from takes 1-3: format-pretrain (accuracy stays at
chance by construction) -> GRPO -> verify trained vs the SAME base with
--baseline. Runs on the forced-CPU backend. Outputs under
benchmarks/rl_demo4/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = Path(__file__).resolve().parent / "rl_demo4"
CHOICES = ["BILLING", "TECHNICAL", "SHIPPING", "OTHER"]


def probe_diversity(base_path: str, n_prompts: int = 8, temperature: float = 1.0):
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models.checkpoint import load_params
    from multimodal_embedding_tpu.rl.datasets import generate_support_tickets
    from multimodal_embedding_tpu.rl.generate import generate
    from multimodal_embedding_tpu.rl.grpo import _parses_as_json
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.rl import tokenizer as tok
    from multimodal_embedding_tpu.rl.rewards import support_ticket_reward

    params, cfg = load_params(base_path)
    ds = generate_support_tickets(n_prompts, seed=42)
    tkz = tok.ByteTokenizer()
    parse, uniq, rstd = [], [], []
    for i, r in enumerate(ds):
        ids = tkz.encode(r["prompt"], 256)
        p_ids, p_mask = tkz.pad_left([ids] * 8)
        toks, _ = generate(
            params, cfg, jnp.asarray(p_ids), jnp.asarray(p_mask),
            jax.random.key(100 + i), max_new=40, temperature=temperature,
            arch=QWEN3,
        )
        texts = [tkz.decode_until_eos(t) for t in np.asarray(toks)]
        parse.append(np.mean([_parses_as_json(t) for t in texts]))
        uniq.append(len(set(texts)) / len(texts))
        rstd.append(np.std([support_ticket_reward(r["prompt"], t) for t in texts]))
    print(
        f"base diversity @T={temperature}: parse {np.mean(parse):.2f}, "
        f"unique/group {np.mean(uniq):.2f}, reward std/group {np.mean(rstd):.2f}",
        flush=True,
    )


def main():
    from multimodal_embedding_tpu.cli.train_rl import (
        default_qwen3_config, main as train_main,
    )
    from multimodal_embedding_tpu.cli.verify_rl import main as verify_main
    from multimodal_embedding_tpu.models.checkpoint import save_params
    from multimodal_embedding_tpu.rl.datasets import generate_support_tickets
    from multimodal_embedding_tpu.rl.pretrain import format_pairs, supervised_pretrain
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.rl import tokenizer as tok

    OUT.mkdir(parents=True, exist_ok=True)
    base = OUT / "base_params.npz"
    common = [
        "--task", "support", "--arch", "qwen3", "--model-size", "debug",
        "--seed", "42",
    ]

    cfg = default_qwen3_config("debug", tok.VOCAB_SIZE)
    params = QWEN3.init(jax.random.key(42), cfg)
    ds = generate_support_tickets(64, seed=42)
    pairs = format_pairs(ds, "category", CHOICES, balanced=True)
    # CE floor ~ ln(4)/~24 completion bytes ~ 0.058: scaffold deterministic,
    # category uniform. 2500 steps of batch 8 ~ 78 passes over the 256 pairs.
    params, losses = supervised_pretrain(params, cfg, pairs, 2500, arch=QWEN3, seed=42)
    print(f"pretrain CE: {losses[0]:.3f} -> {np.mean(losses[-20:]):.3f}", flush=True)
    save_params(str(base), params, cfg)

    probe_diversity(str(base), temperature=1.0)

    rc = train_main(
        common + [
            "--base-params", str(base),
            "--dataset-size", "64", "--epochs", "16",
            "--num-generations", "8", "--grad-accum", "4",
            "--learning-rate", "2e-4", "--temperature", "1.0",
            "--kl-beta", "0.01", "--max-new-tokens", "40",
            "--output-dir", str(OUT),
        ]
    )
    assert rc == 0
    stats = np.load(OUT / "training_stats.npz")
    r, p = stats["mean_reward"], stats["parse_rate"]
    k = 64
    print(f"reward first-{k}: {r[:k].mean():.2f}  last-{k}: {r[-k:].mean():.2f}",
          flush=True)
    print(f"parse  first-{k}: {p[:k].mean():.2f}  last-{k}: {p[-k:].mean():.2f}",
          flush=True)
    np.savetxt(OUT / "reward_curve.txt", r, fmt="%.3f")

    rc = verify_main(
        common + [
            "--base-params", str(base), "--dataset-size", "64",
            "--adapters", str(OUT / "lora_adapters.npz"), "--baseline",
        ]
    )
    assert rc == 0


if __name__ == "__main__":
    main()
