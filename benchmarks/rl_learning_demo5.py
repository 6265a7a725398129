"""GRPO learning demonstration, take 5 (r5): the FINTECH task.

Take 4 (support task) answered the open question from VERDICT r4: the
trainer *does* maximize its reward (mean −2.62 → +8.61 over 16 epochs,
sampled reward with the merged adapters 2.95 → 6.94), but greedy accuracy
vs the dataset answers stayed at chance — because the support reward is
DEGENERATE, faithfully to the reference (train_rl_pure_lora.py:53-64): it
keyword-routes on the FULL prompt string, and the system line every prompt
carries ("... one of BILLING, TECHNICAL, SHIPPING, OTHER") contains the
keyword "bill", so the reward-optimal policy is "always BILLING" — exactly
what the policy learned (greedy train-set accuracy 21.9% ≈ the 14/64
answer↔reward agreement rate). The reference has the same property
(its system message lists 'Allowed categories: ["BILLING", ...]' and TRL
passes the stringified chat to the reward), which is why its verify_rl.py
only scores FORMAT rates for this task, never accuracy.

The reference's accuracy-measured RL demonstration is the FINTECH task
(train_rl_hard.py + verify_rl_debug.py:52-95, the recorded 28% baseline):
the reward derives the target from prompt fields by the rule hierarchy, and
the dataset answers come from the same rules — reward↔answer agreement is
64/64 on our generator (both seeds). So the end-to-end claim "GRPO training
lifts ground-truth accuracy over the same-base baseline" is demonstrated
here: balanced format pretrain (accuracy at chance by construction) → GRPO
on fintech_reward → verify trained vs base with --baseline.

Decision head bytes are distinct (S/M/R/A), prompts are 289-303 bytes and
encode() keeps the LAST 256, so every decision-relevant field (revenue,
burn, founder, NPS) survives truncation. Runs on the forced-CPU backend.
Outputs under benchmarks/rl_demo5/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = Path(__file__).resolve().parent / "rl_demo5"
CHOICES = ["STANDARD_LOAN", "MANUAL_REVIEW", "REJECT_RISK", "A_PLUS_TIER"]


def main():
    from multimodal_embedding_tpu.cli.train_rl import (
        default_qwen3_config, main as train_main,
    )
    from multimodal_embedding_tpu.cli.verify_rl import main as verify_main
    from multimodal_embedding_tpu.models.checkpoint import save_params
    from multimodal_embedding_tpu.rl.datasets import generate_fintech_dataset
    from multimodal_embedding_tpu.rl.pretrain import format_pairs, supervised_pretrain
    from multimodal_embedding_tpu.rl.policy import QWEN3
    from multimodal_embedding_tpu.rl import tokenizer as tok

    OUT.mkdir(parents=True, exist_ok=True)
    base = OUT / "base_params.npz"
    common = [
        "--task", "fintech", "--arch", "qwen3", "--model-size", "debug",
        "--seed", "42",
    ]

    cfg = default_qwen3_config("debug", tok.VOCAB_SIZE)
    params = QWEN3.init(jax.random.key(42), cfg)
    ds = generate_fintech_dataset(64, seed=42)
    pairs = format_pairs(ds, "decision", CHOICES, balanced=True)
    params, losses = supervised_pretrain(params, cfg, pairs, 2500, arch=QWEN3, seed=42)
    print(f"pretrain CE: {losses[0]:.3f} -> {np.mean(losses[-20:]):.3f}", flush=True)
    save_params(str(base), params, cfg)

    rc = train_main(
        common + [
            "--base-params", str(base),
            "--dataset-size", "64", "--epochs", "32",
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

    # Held-out verification (verify_rl uses seed+1 = fresh applications) —
    # trained vs the SAME pretrained base (reference verify_rl_debug.py:52-95).
    rc = verify_main(
        common + [
            "--base-params", str(base), "--dataset-size", "64",
            "--adapters", str(OUT / "lora_adapters.npz"), "--baseline",
        ]
    )
    assert rc == 0


if __name__ == "__main__":
    main()
