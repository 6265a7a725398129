"""Qwen3 decoder parity vs HF ``Qwen3ForCausalLM`` (random weights, offline).

The reference trains Qwen/Qwen3-14B with TRL GRPO (train_rl_pure_lora.py:74-82);
our JAX decoder must match the HF forward semantics: per-head QK-RMSNorm,
plain RMSNorm gain, SwiGLU, rope theta 1e6, untied LM head. Position ids are
passed explicitly to HF (cumsum(mask)-1) to pin the left-padding convention.

A fast tiny-config test runs in the default suite; the truncated-true-width
test (real 14B widths/heads, 2 layers) is slow-marked — per-layer numerics at
width 5120 in f32 AND bf16 params (pattern: tests/test_full_arch_parity.py).
"""

import gc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_embedding_tpu.models.convert import cast_params
from multimodal_embedding_tpu.models.qwen3 import (
    Qwen3Config,
    qwen3_apply,
    qwen3_config_from_hf,
    qwen3_embed,
    qwen3_init,
    qwen3_lm_logits,
    qwen3_params_from_hf,
)


def _cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a.reshape(a.shape[0], -1).astype(np.float64)
    b = b.reshape(b.shape[0], -1).astype(np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def _hf_model(seed: int, *, dim, layers, heads, kv_heads, head_dim, mlp, vocab,
              tie=False):
    from transformers import Qwen3Config as HFQwen3Config, Qwen3ForCausalLM

    hf_cfg = HFQwen3Config(
        vocab_size=vocab,
        hidden_size=dim,
        intermediate_size=mlp,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=head_dim,
        rope_theta=1e6,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(seed)
    return HFQwen3Config, Qwen3ForCausalLM(hf_cfg).eval(), hf_cfg


def _ref_logits(hf, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
    positions = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            position_ids=torch.from_numpy(positions),
        )
    return out.logits.numpy()


def _ours_logits(params, cfg, ids, mask):
    hidden = qwen3_apply(
        params, cfg, qwen3_embed(params, cfg, jnp.asarray(ids)), jnp.asarray(mask), causal=True
    )
    return np.asarray(qwen3_lm_logits(params, cfg, hidden), np.float32)


@pytest.mark.parametrize("tie", [False, True])
def test_qwen3_tiny_parity(rng, tie):
    """Tiny config, left-padded batch: logits match HF within f32 tolerance,
    both untied (14B) and tied (small Qwen3s) LM heads."""
    _, hf, hf_cfg = _hf_model(
        0, dim=64, layers=3, heads=4, kv_heads=2, head_dim=16, mlp=128, vocab=256, tie=tie
    )
    cfg = qwen3_config_from_hf(hf_cfg)
    assert cfg.tie_embeddings == tie
    params = qwen3_params_from_hf(hf.state_dict(), cfg)
    assert ("lm_head" in params) == (not tie)

    ids = rng.integers(3, 255, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[0, :4] = 0  # left padding
    ids[0, :4] = 0
    ref = _ref_logits(hf, ids, mask)
    ours = _ours_logits(params, cfg, ids, mask)
    # compare only valid positions (HF's masked rows see garbage positions)
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-5)
    del hf
    gc.collect()


def test_qwen3_init_matches_converter_shapes():
    cfg = Qwen3Config(
        vocab_size=128, dim=32, layers=2, heads=4, kv_heads=2, head_dim=8, mlp_dim=64
    )
    _, hf, hf_cfg = _hf_model(
        1, dim=32, layers=2, heads=4, kv_heads=2, head_dim=8, mlp=64, vocab=128
    )
    params = qwen3_params_from_hf(hf.state_dict(), qwen3_config_from_hf(hf_cfg))
    init = qwen3_init(jax.random.key(0), cfg)
    got = jax.tree.map(lambda a: tuple(a.shape), params)
    want = jax.tree.map(lambda a: tuple(a.shape), init)
    assert got == want
    del hf
    gc.collect()


def test_qwen3_greedy_generation_matches_hf(rng):
    """KV-cache greedy decoding (prefill + decode_step scan, left-padded
    batch) vs HF ``generate`` — pins rope positions, cache slotting, and the
    first-token logits path against the reference generation loop."""
    from multimodal_embedding_tpu.rl.generate import generate
    from multimodal_embedding_tpu.rl.policy import QWEN3

    _, hf, hf_cfg = _hf_model(
        5, dim=64, layers=2, heads=4, kv_heads=2, head_dim=16, mlp=128, vocab=256
    )
    cfg = qwen3_config_from_hf(hf_cfg)
    params = qwen3_params_from_hf(hf.state_dict(), cfg)

    ids = rng.integers(3, 255, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[0, :3] = 0
    ids[0, :3] = 0  # pad id 0

    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            max_new_tokens=6,
            do_sample=False,
            pad_token_id=0,
        )
    ref = out[:, 10:].numpy()

    toks, _ = generate(
        params, cfg, jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), jax.random.key(0),
        max_new=6, greedy=True, arch=QWEN3,
    )
    np.testing.assert_array_equal(np.asarray(toks), ref)
    del hf
    gc.collect()


@pytest.mark.slow
def test_qwen3_14b_truncated_width_parity(rng):
    """Qwen/Qwen3-14B at true widths — 5120 wide, 40 heads x 128, 8 kv heads,
    mlp 17408, untied head — truncated to 2 layers and a 8192 vocab (depth
    and vocab don't change per-layer numerics; full depth is ~28 GB). f32
    params must match tightly; bf16 params (what training runs) by cosine."""
    _, hf, hf_cfg = _hf_model(
        2, dim=5120, layers=2, heads=40, kv_heads=8, head_dim=128, mlp=17408, vocab=8192
    )
    cfg = qwen3_config_from_hf(hf_cfg)
    params = qwen3_params_from_hf(hf.state_dict(), cfg)
    params_bf16 = cast_params(params, jnp.bfloat16)

    ids = rng.integers(3, 8191, size=(2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[1, :7] = 0
    ids[1, :7] = 0
    ref = _ref_logits(hf, ids, mask)

    ours = _ours_logits(params, cfg, ids, mask)
    valid = mask.astype(bool)
    assert _cosine(ours[valid], ref[valid]).min() > 0.9999, "f32 parity failed"
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-3, atol=2e-3)

    ours_bf16 = _ours_logits(params_bf16, cfg, ids, mask)
    assert _cosine(ours_bf16[valid], ref[valid]).min() > 0.999, "bf16 parity failed"
    del hf, params, params_bf16
    gc.collect()
