"""probe --hf-parity: the one-command real-checkpoint parity gate.

Exercised offline end-to-end: a small random-weight HF CLIPModel is saved
to a local checkpoint directory (the exact artifact `from_pretrained`
consumes), converted through our loader path, and hf_parity_check must load
the HF reference back from disk, run both stacks on the same fixture, and
pass; corrupting the converted params must fail the gate.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def small_clip_checkpoint(tmp_path_factory):
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        text_config={
            "hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "vocab_size": 96,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
            "eos_token_id": 95, "bos_token_id": 94,
        },
        vision_config={
            "hidden_size": 32, "num_hidden_layers": 2, "num_attention_heads": 4,
            "intermediate_size": 64, "image_size": 32, "patch_size": 16,
            "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    torch.manual_seed(0)
    hf = CLIPModel(cfg).eval()
    d = tmp_path_factory.mktemp("clip_ckpt")
    hf.save_pretrained(d)
    return d, hf


def _our_model(hf):
    from multimodal_embedding_tpu.models.convert import (
        clip_config_from_hf,
        clip_params_from_hf,
    )
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import LoadedModel, hash_tokenizer

    cfg = clip_config_from_hf(hf.config)
    params = clip_params_from_hf(hf.state_dict(), cfg)
    info = model_info("OpenAI-CLIP-L")
    return LoadedModel(
        info=info, cfg=cfg, params=params, preprocess=info.preprocess,
        tokenize=hash_tokenizer(cfg.text.vocab_size, cfg.text.max_len, 95),
    ), info


def test_hf_parity_gate_passes_on_faithful_conversion(small_clip_checkpoint):
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_clip_checkpoint
    model, info = _our_model(hf)
    assert hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)


def test_hf_parity_gate_fails_on_corrupted_params(small_clip_checkpoint):
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_clip_checkpoint
    model, info = _our_model(hf)
    # corrupt one projection: parity must fail loudly, not silently pass
    model.params["vision"]["proj"] = model.params["vision"]["proj"] * 0.0 + 0.3
    assert not hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)


def test_hf_parity_skips_families_without_offline_reference(capsys):
    from multimodal_embedding_tpu.cli.probe import hf_parity_check
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import load_debug_model

    info = model_info("ColPali-v1.3")
    model = load_debug_model(info)
    assert hf_parity_check(model, info)  # skip (colpali_engine reference), not fail
    assert "skipped" in capsys.readouterr().out
