"""GRPO learning demonstration, take 3 (r5): the SUPPORT task.

Takes 1-2 (fintech) failed for reward-structure reasons measured on the toy
model, not trainer bugs:
- take 1: 2000 pretrain steps made the policy deterministic (CE 0.0075) —
  zero within-group variance, zero GRPO signal; lr 1e-3 collapsed the format
  (verify: base 100% clean JSON / 20.3% acc -> trained 0% / 0%).
- take 2: CE 0.205 kept diversity (parse 0.12, unique 8/8) but fintech's
  reward makes valid-but-wrong JSON (~-14, avg -18 with the asymmetric
  penalties) WORSE than braced garbage (-4), and random accuracy is 25%, so
  EV(valid JSON) ~ -5.75 < -4: the only way up is the +31 correct decision,
  whose rule (numeric thresholds read from bytes) a 2-layer d64 model cannot
  discover from ~3% of rollouts. The policy settled at the -4.75 local
  optimum exactly as the math predicts.

The support task (the reference's own demo task, train_rl_pure_lora.py) has
the OPPOSITE gradient geometry: valid JSON is +2 (vs -3 braced garbage),
correct category +15 on top, and the ticket->category mapping is keyword
surface form over 12 template texts — learnable by a tiny byte-LM. GRPO's
job: random-category JSON (+2-ish, ~25% acc) -> correct routing (+17).

Protocol unchanged: format-pretrain (RANDOM categories — accuracy stays at
chance) -> GRPO -> verify trained vs the SAME base with --baseline.
Runs on the forced-CPU backend. Outputs under benchmarks/rl_demo3/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = Path(__file__).resolve().parent / "rl_demo3"
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
    pairs = format_pairs(ds, "category", CHOICES, seed=42)
    params, losses = supervised_pretrain(params, cfg, pairs, 500, arch=QWEN3, seed=42)
    print(f"pretrain CE: {losses[0]:.3f} -> {np.mean(losses[-20:]):.3f}", flush=True)
    save_params(str(base), params, cfg)

    probe_diversity(str(base), temperature=1.0)

    # kl_beta 0.01 (not the reference's 0.04): the anchor is the format-only
    # base at parse~0.12, and the demo's whole point is to move AWAY from it;
    # 0.04 measurably froze the climb (take-3 first run, epochs 0-8 flat).
    rc = train_main(
        common + [
            "--base-params", str(base),
            "--dataset-size", "64", "--epochs", "20",
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
