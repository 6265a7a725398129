"""Embedding parity: JAX towers vs HF torch reference implementations.

Builds small *random-weight* HF models locally (no network), converts the
state dicts with models/convert.py, and asserts that image/text features
match — the same numerical contract real checkpoint loading relies on
(SURVEY.md §7.3.2: per-model embedding parity is the acceptance test).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_embedding_tpu.models.convert import (
    clip_config_from_hf,
    clip_params_from_hf,
    siglip_config_from_hf,
    siglip_params_from_hf,
)
from multimodal_embedding_tpu.models.towers import encode_image, encode_text


@pytest.fixture(scope="module")
def clip_pair():
    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig(
        text_config={
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "vocab_size": 99,
            "max_position_embeddings": 16,
            "hidden_act": "quick_gelu",
            "eos_token_id": 2,
        },
        vision_config={
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 96,
            "image_size": 32,
            "patch_size": 8,
            "hidden_act": "quick_gelu",
        },
        projection_dim=24,
    )
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg).eval()
    cfg = clip_config_from_hf(hf_cfg)
    params = clip_params_from_hf(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def siglip_pair():
    from transformers import SiglipConfig, SiglipModel

    hf_cfg = SiglipConfig(
        text_config={
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 64,
            "vocab_size": 99,
            "max_position_embeddings": 16,
        },
        vision_config={
            "hidden_size": 48,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 96,
            "image_size": 32,
            "patch_size": 8,
        },
    )
    torch.manual_seed(1)
    model = SiglipModel(hf_cfg).eval()
    cfg = siglip_config_from_hf(hf_cfg)
    params = siglip_params_from_hf(model.state_dict(), cfg)
    return model, cfg, params


def test_clip_image_parity(clip_pair, rng):
    model, cfg, params = clip_pair
    pixels = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_clip_text_parity(clip_pair, rng):
    model, cfg, params = clip_pair
    ids = rng.integers(3, 98, size=(4, 12))
    ids[:, -1] = 98  # highest vocab id = EOS convention (legacy argmax pooling)
    ids[1, 7] = 98  # duplicate high id: argmax picks the first
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    ours = np.asarray(encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_siglip_image_parity(siglip_pair, rng):
    model, cfg, params = siglip_pair
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_siglip_text_parity(siglip_pair, rng):
    model, cfg, params = siglip_pair
    ids = rng.integers(3, 99, size=(4, 16))
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    ours = np.asarray(encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_siglip_ragged_patch_grid_parity(rng):
    """384/14-style non-divisible geometry: the conv drops trailing pixels."""
    from transformers import SiglipConfig, SiglipModel

    hf_cfg = SiglipConfig(
        text_config={"hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
                     "intermediate_size": 64, "vocab_size": 99, "max_position_embeddings": 16},
        vision_config={"hidden_size": 48, "num_hidden_layers": 1, "num_attention_heads": 4,
                       "intermediate_size": 96, "image_size": 30, "patch_size": 14},
    )
    torch.manual_seed(2)
    model = SiglipModel(hf_cfg).eval()
    cfg = siglip_config_from_hf(hf_cfg)
    params = siglip_params_from_hf(model.state_dict(), cfg)
    pixels = rng.standard_normal((2, 30, 30, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_native_checkpoint_roundtrip(clip_pair, tmp_path, rng):
    """Converted params save/reload without torch; embeddings identical."""
    from multimodal_embedding_tpu.models.checkpoint import load_params, save_params

    _, cfg, params = clip_pair
    p = tmp_path / "clip.npz"
    save_params(p, params, cfg)
    params2, cfg2 = load_params(p)
    assert cfg2 == cfg
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    e1 = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    e2 = np.asarray(encode_image(params2, cfg2, jnp.asarray(pixels)))
    np.testing.assert_array_equal(e1, e2)


def test_load_model_native_cache(tmp_path, rng, monkeypatch):
    """load_model round-trips through the native cache: second load skips
    transformers entirely."""
    from transformers import CLIPConfig, CLIPModel

    from multimodal_embedding_tpu.models import zoo
    from multimodal_embedding_tpu.models.registry import model_info

    hf_cfg = CLIPConfig(
        text_config={"hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 4,
                     "intermediate_size": 64, "vocab_size": 99, "max_position_embeddings": 16,
                     "hidden_act": "quick_gelu", "eos_token_id": 2},
        vision_config={"hidden_size": 48, "num_hidden_layers": 1, "num_attention_heads": 4,
                       "intermediate_size": 96, "image_size": 32, "patch_size": 8,
                       "hidden_act": "quick_gelu"},
        projection_dim=24,
    )
    torch.manual_seed(5)
    local = tmp_path / "hf_ckpt"
    CLIPModel(hf_cfg).save_pretrained(local)
    monkeypatch.setattr(zoo, "hf_tokenizer", lambda info: (lambda texts: (None, None)))

    info = model_info("OpenAI-CLIP-L")
    cache = tmp_path / "native"
    m1 = zoo.load_model(info, dtype=jnp.float32, checkpoint_dir=str(local),
                        native_cache_dir=str(cache))
    assert (cache / "OpenAI-CLIP-L.npz").exists()

    # second load must not need transformers' model classes
    import transformers as _t

    monkeypatch.setattr(_t, "CLIPModel", None)
    m2 = zoo.load_model(info, dtype=jnp.float32, native_cache_dir=str(cache))
    px = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    e1 = np.asarray(encode_image(m1.params, m1.cfg, jnp.asarray(px)))
    e2 = np.asarray(encode_image(m2.params, m2.cfg, jnp.asarray(px)))
    np.testing.assert_array_equal(e1, e2)


def test_bf16_attention_mode_close_to_f32(clip_pair, rng):
    from multimodal_embedding_tpu.models.layers import set_attention_impl

    model, cfg, params = clip_pair
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    e_f32 = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    try:
        set_attention_impl("xla_bf16")
        e_bf16 = np.asarray(encode_image(params, cfg, jnp.asarray(pixels)))
    finally:
        set_attention_impl("xla")
    cos = (e_f32 * e_bf16).sum(-1) / (
        np.linalg.norm(e_f32, axis=-1) * np.linalg.norm(e_bf16, axis=-1)
    )
    assert cos.min() > 0.999
