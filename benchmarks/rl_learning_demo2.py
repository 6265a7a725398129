"""GRPO learning demonstration, take 2 (r5).

Take 1 (rl_learning_demo.py) failed in a diagnosable way: 2000 pretrain steps
drove format CE to 0.0075, leaving the policy DETERMINISTIC at T=0.8 — every
group's 8 rollouts were identical, so group-relative advantages were zero
almost everywhere (GRPO's signal is within-group variance), and the few
variance-carrying groups at lr 1e-3 (LoRA alpha/rank = 2x) collapsed the
format to '{'+garbage (the observed constant reward -4 = +1 starts-with-brace
-5 unparseable). Sampled evidence: the CE-0.0075 base emits 4/4 identical
completions per prompt.

Take 2 keeps the protocol (format-pretrain -> GRPO -> verify trained vs the
SAME base) and fixes the exploration/stability knobs:
- pretrain 500 steps (CE ~0.3-0.6: format mostly there, entropy left);
- rollouts at T=1.0;
- lr 2e-4 (LoRA alpha 32 / rank 16 doubles the effective step);
- a pre-training diversity probe logs parse rate + within-group uniqueness
  so a zero-signal start is visible before any GRPO step (the r4 verdict's
  required instrumentation; the trainer now also logs parse/adv_std live).

Runs on the forced-CPU backend. Outputs under benchmarks/rl_demo2/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = Path(__file__).resolve().parent / "rl_demo2"


def probe_diversity(base_path: str, n_prompts: int = 8, temperature: float = 1.0):
    import jax.numpy as jnp

    from multimodal_embedding_tpu.models.checkpoint import load_params
    from multimodal_embedding_tpu.rl.datasets import generate_fintech_dataset
    from multimodal_embedding_tpu.rl.generate import generate
    from multimodal_embedding_tpu.rl.grpo import _parses_as_json
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.rl import tokenizer as tok
    from multimodal_embedding_tpu.rl.rewards import fintech_reward

    params, cfg = load_params(base_path)
    ds = generate_fintech_dataset(n_prompts, seed=42)
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
        rstd.append(np.std([fintech_reward(r["prompt"], t) for t in texts]))
    print(
        f"base diversity @T={temperature}: parse {np.mean(parse):.2f}, "
        f"unique/group {np.mean(uniq):.2f}, reward std/group {np.mean(rstd):.2f}",
        flush=True,
    )
    return float(np.mean(rstd))


def main():
    from multimodal_embedding_tpu.cli.train_rl import main as train_main
    from multimodal_embedding_tpu.cli.verify_rl import main as verify_main

    OUT.mkdir(parents=True, exist_ok=True)
    base = OUT / "base_params.npz"
    common = [
        "--task", "fintech", "--arch", "qwen3", "--model-size", "debug",
        "--seed", "42",
    ]
    # stage 1: pretrain only (epochs via a 0-step GRPO run is not supported;
    # instead run train with 0 epochs? the CLI trains immediately after
    # pretraining, so do it in one go — but probe diversity FIRST by saving
    # the base via a pretrain-only helper)
    from multimodal_embedding_tpu.cli.train_rl import (
        build_model, default_qwen3_config,  # noqa: F401 (arch sanity)
    )
    from multimodal_embedding_tpu.models.checkpoint import save_params
    from multimodal_embedding_tpu.rl.datasets import generate_fintech_dataset
    from multimodal_embedding_tpu.rl.pretrain import format_pairs, supervised_pretrain
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.rl import tokenizer as tok

    cfg = default_qwen3_config("debug", tok.VOCAB_SIZE)
    params = QWEN3.init(jax.random.key(42), cfg)
    ds = generate_fintech_dataset(64, seed=42)
    pairs = format_pairs(
        ds, "decision",
        ["STANDARD_LOAN", "MANUAL_REVIEW", "REJECT_RISK", "A_PLUS_TIER"],
        seed=42,
    )
    params, losses = supervised_pretrain(
        params, cfg, pairs, 500, arch=QWEN3, seed=42,
    )
    print(f"pretrain CE: {losses[0]:.3f} -> {np.mean(losses[-20:]):.3f}", flush=True)
    save_params(str(base), params, cfg)

    rstd = probe_diversity(str(base), temperature=1.0)
    if rstd < 1.0:
        print("WARNING: near-zero group reward variance — GRPO will have "
              "little signal; continuing anyway for the record", flush=True)

    rc = train_main(
        common + [
            "--base-params", str(base),
            "--dataset-size", "64", "--epochs", "10",
            "--num-generations", "8", "--grad-accum", "4",
            "--learning-rate", "2e-4", "--temperature", "1.0",
            "--max-new-tokens", "40",
            "--output-dir", str(OUT),
        ]
    )
    assert rc == 0
    stats = np.load(OUT / "training_stats.npz")
    r = stats["mean_reward"]
    k = 32
    print(f"reward first-{k}: {r[:k].mean():.2f}  last-{k}: {r[-k:].mean():.2f}",
          flush=True)
    print(f"parse first-{k}: {stats['parse_rate'][:k].mean():.2f}  "
          f"last-{k}: {stats['parse_rate'][-k:].mean():.2f}", flush=True)
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
