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


@pytest.fixture(scope="module")
def small_colpali_checkpoint(tmp_path_factory):
    """Tiny ColPaliForRetrieval (transformers-native — no colpali_engine)
    saved to disk: the artifact `probe --hf-parity --checkpoint-dir` consumes."""
    from transformers import ColPaliConfig as HFColPaliConfig, ColPaliForRetrieval
    from transformers import PaliGemmaConfig

    vlm = PaliGemmaConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=16, projection_dim=48,
        ),
        text_config=dict(
            model_type="gemma", hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=1, head_dim=12,
            intermediate_size=96, vocab_size=300, rope_theta=10000.0,
        ),
        image_token_index=280,
        projection_dim=48,
    )
    cfg = HFColPaliConfig(vlm_config=vlm, embedding_dim=16)
    torch.manual_seed(1)
    hf = ColPaliForRetrieval(cfg).eval()
    d = tmp_path_factory.mktemp("colpali_ckpt")
    hf.save_pretrained(d)
    return d, hf


def _our_colpali(hf):
    from multimodal_embedding_tpu.models.colpali import (
        colpali_config_from_hf,
        colpali_params_from_hf,
    )
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import LoadedModel, hash_tokenizer

    cfg = colpali_config_from_hf(hf.config)
    suffix = np.array([2, 17, 18, 19], np.int32)
    params = colpali_params_from_hf(hf.state_dict(), cfg, suffix)
    info = model_info("ColPali-v1.3")
    return LoadedModel(
        info=info, cfg=cfg, params=params, preprocess=info.preprocess,
        tokenize=hash_tokenizer(cfg.gemma.vocab_size, 16, 1), multi_vector=True,
    ), info


def test_hf_parity_gate_covers_colpali(small_colpali_checkpoint):
    """The one-command gate must exercise ColPali (VERDICT r3: the
    colpali_engine excuse is stale — transformers.ColPaliForRetrieval is the
    reference; reference setup check run_benchmark_openai_apple_only.py:61-104)."""
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_colpali_checkpoint
    model, info = _our_colpali(hf)
    assert hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)


def test_hf_parity_gate_fails_on_corrupted_colpali(small_colpali_checkpoint):
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_colpali_checkpoint
    model, info = _our_colpali(hf)
    model.params["emb_proj"]["w"] = model.params["emb_proj"]["w"] * 0.0 + 0.1
    assert not hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)


@pytest.fixture(scope="module")
def small_jina_checkpoint(tmp_path_factory):
    """Tiny Jina checkpoint as raw weight files (the real checkpoint schema,
    64-d heads for the config-derivation path) — the gate loads the state
    dict directly, never executing remote modeling code."""
    from tests.jina_torch_reference import Eva02Torch, JinaBertTorch, JinaClipTorch

    torch.manual_seed(2)
    vision = Eva02Torch(
        image_size=32, patch_size=16, dim=128, layers=2, heads=2,
        mlp_dim=160, proj_dim=64,
    )
    with torch.no_grad():
        vision.cls_token.normal_(std=0.02)
        vision.pos_embed.normal_(std=0.02)
    bert = JinaBertTorch(vocab=128, dim=128, layers=2, heads=2, mlp_dim=192)
    model = JinaClipTorch(vision, bert).eval()
    d = tmp_path_factory.mktemp("jina_ckpt")
    torch.save(model.state_dict(), d / "pytorch_model.bin")
    return d, model


def _our_jina(hf):
    from multimodal_embedding_tpu.models.jina import jina_config_from_sd, jina_params_from_hf
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import LoadedModel, hash_tokenizer

    sd = hf.state_dict()
    cfg = jina_config_from_sd(sd)
    params = jina_params_from_hf(sd, cfg)
    info = model_info("Jina-CLIP-v1")
    return LoadedModel(
        info=info, cfg=cfg, params=params, preprocess=info.preprocess,
        tokenize=hash_tokenizer(cfg.text.vocab_size, 16, 3),
    ), info


def test_hf_parity_gate_covers_jina(small_jina_checkpoint):
    """Jina routes through the independent torch reference loaded with the
    checkpoint weights (VERDICT r3: no skip; the remote-code modeling file is
    never executed)."""
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_jina_checkpoint
    model, info = _our_jina(hf)
    assert hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)


def test_hf_parity_gate_fails_on_corrupted_jina(small_jina_checkpoint):
    from multimodal_embedding_tpu.cli.probe import hf_parity_check

    ckpt_dir, hf = small_jina_checkpoint
    model, info = _our_jina(hf)
    model.params["vision"]["proj"] = model.params["vision"]["proj"] * 0.0 + 0.2
    assert not hf_parity_check(model, info, checkpoint_dir=str(ckpt_dir), threshold=0.999)
