"""ColPali parity: JAX PaliGemma stack vs HF ColPaliForRetrieval (random
small config, no network)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_embedding_tpu.models.colpali import (
    colpali_config_from_hf,
    colpali_image_fwd,
    colpali_params_from_hf,
    colpali_text_fwd,
)

SUFFIX_IDS = np.array([1, 7, 8, 9], np.int32)


@pytest.fixture(scope="module")
def colpali_pair():
    from transformers import ColPaliConfig as HFColPaliConfig, ColPaliForRetrieval
    from transformers import PaliGemmaConfig

    vlm = PaliGemmaConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14, projection_dim=48,
        ),
        text_config=dict(
            model_type="gemma", hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=1, head_dim=16,
            intermediate_size=96, vocab_size=512, rope_theta=10000.0,
        ),
        image_token_index=500,
        projection_dim=48,
    )
    hf_cfg = HFColPaliConfig(vlm_config=vlm, embedding_dim=16)
    torch.manual_seed(0)
    hf = ColPaliForRetrieval(hf_cfg).eval()
    cfg = colpali_config_from_hf(hf_cfg)
    params = colpali_params_from_hf(hf.state_dict(), cfg, SUFFIX_IDS)
    return hf, cfg, params


def test_image_parity(colpali_pair, rng):
    hf, cfg, params = colpali_pair
    b, s = 2, 28
    n_patches = (s // 14) ** 2  # 4
    pixels = rng.standard_normal((b, s, s, 3)).astype(np.float32)

    ids = np.concatenate(
        [np.full((b, n_patches), 500, np.int64), np.tile(SUFFIX_IDS, (b, 1))], axis=1
    )
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones_like(torch.from_numpy(ids)),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
    ref = out.embeddings.numpy()

    ours = np.asarray(colpali_image_fwd(params, cfg, jnp.asarray(pixels)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_query_parity(colpali_pair, rng):
    hf, cfg, params = colpali_pair
    ids = rng.integers(2, 499, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[1, 7:] = 0  # right padding
    ids[1, 7:] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    ref = out.embeddings.numpy()

    ours = np.asarray(colpali_text_fwd(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_left_padded_query_parity(colpali_pair, rng):
    """ColPaliProcessor left-pads query batches — positions must follow the
    attention mask, not raw indices."""
    hf, cfg, params = colpali_pair
    ids = rng.integers(2, 499, size=(2, 8)).astype(np.int64)
    mask = np.ones((2, 8), np.int64)
    mask[0, :3] = 0  # left padding
    ids[0, :3] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    ref = out.embeddings.numpy()
    ours = np.asarray(colpali_text_fwd(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
