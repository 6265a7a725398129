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


# --- processor semantics: our wrapping vs transformers.ColPaliProcessor --------
#
# The reference drives ColPali through processor.process_queries /
# process_images (reference main.py:397-404). We rebuild the HF processor
# offline (tokenizers-BPE Gemma tokenizer, no network) and assert our
# colpali_processing wrapping produces identical token streams, then identical
# embeddings through the full process->forward pipelines.

from multimodal_embedding_tpu.models.colpali_processing import (  # noqa: E402
    ColPaliPrompts,
    image_input_ids,
    image_prompt_suffix_ids,
    process_queries_ids,
    prompts_from_processor,
)

IMAGE_SEQ_LEN = 4  # (28/14)^2 patches


@pytest.fixture(scope="module")
def hf_colpali_processor():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import GemmaTokenizerFast, SiglipImageProcessor
    from transformers.models.colpali.processing_colpali import ColPaliProcessor

    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<pad>", "<eos>", "<bos>", "<unk>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "Describe the image.",
        "Query: a photo of a cat sitting on a mat",
        "a man riding a horse on the beach",
        "two dogs playing with a red ball in the park",
    ]
    tk.train_from_iterator(corpus * 10, trainer)
    tok = GemmaTokenizerFast(
        tokenizer_object=tk,
        pad_token="<pad>",
        bos_token="<bos>",
        eos_token="<eos>",
        unk_token="<unk>",
        padding_side="left",
    )
    sip = SiglipImageProcessor(
        size={"height": 28, "width": 28}, image_seq_length=IMAGE_SEQ_LEN
    )
    return ColPaliProcessor(image_processor=sip, tokenizer=tok, query_prefix="Query: ")


QUERIES = [
    "a photo of a cat",
    "two dogs playing with a red ball in the park on the beach",
    "zebra unseen words",  # exercises byte-level fallback pieces
]


def test_process_queries_token_parity(hf_colpali_processor):
    proc = hf_colpali_processor
    ref = proc.process_queries(QUERIES, return_tensors="np")
    ids, mask = process_queries_ids(proc.tokenizer, QUERIES, prompts_from_processor(proc))
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(mask, ref["attention_mask"].astype(np.int32))
    # the 10 augmentation pad tokens are attended (mask 1); only batch padding is 0
    assert mask[0].sum() < mask[1].sum() and mask.max() == 1


def test_process_queries_long_query_parity(hf_colpali_processor):
    """ColPaliProcessor's nominal max_length=50 is inert — long queries are
    NOT truncated (verified vs transformers 4.57); we must match exactly."""
    proc = hf_colpali_processor
    long_query = " ".join(["word unseen"] * 60)
    ref = proc.process_queries([long_query], return_tensors="np")
    ids, mask = process_queries_ids(
        proc.tokenizer, [long_query], prompts_from_processor(proc)
    )
    assert ids.shape[1] == ref["input_ids"].shape[1] > 50
    np.testing.assert_array_equal(ids, ref["input_ids"].astype(np.int32))


def test_process_images_token_parity(hf_colpali_processor, rng):
    from PIL import Image

    proc = hf_colpali_processor
    imgs = [
        Image.fromarray(rng.integers(0, 256, (28, 28, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    ref = proc.process_images(imgs, return_tensors="np")
    ours = image_input_ids(
        proc.tokenizer, proc.image_token_id, IMAGE_SEQ_LEN, 2, prompts_from_processor(proc)
    )
    np.testing.assert_array_equal(ours, ref["input_ids"].astype(np.int32))
    assert ref["attention_mask"].min() == 1  # image prompts are unpadded


@pytest.fixture(scope="module")
def colpali_pair_for_processor(hf_colpali_processor):
    """HF ColPali model sized to the offline tokenizer's id space, with the
    processor's real image token id and suffix ids."""
    from transformers import ColPaliConfig as HFColPaliConfig, ColPaliForRetrieval
    from transformers import PaliGemmaConfig

    proc = hf_colpali_processor
    vlm = PaliGemmaConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=28, patch_size=14, projection_dim=48,
        ),
        text_config=dict(
            model_type="gemma", hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=1, head_dim=16,
            intermediate_size=96, vocab_size=2048, rope_theta=10000.0,
        ),
        image_token_index=proc.image_token_id,
        projection_dim=48,
    )
    hf_cfg = HFColPaliConfig(vlm_config=vlm, embedding_dim=16)
    torch.manual_seed(1)
    hf = ColPaliForRetrieval(hf_cfg).eval()
    cfg = colpali_config_from_hf(hf_cfg)
    suffix_ids = image_prompt_suffix_ids(proc.tokenizer, prompts_from_processor(proc))
    params = colpali_params_from_hf(hf.state_dict(), cfg, suffix_ids)
    return hf, cfg, params


def test_full_query_pipeline_parity(hf_colpali_processor, colpali_pair_for_processor):
    """String -> our wrapping -> our forward  ==  string -> HF processor -> HF."""
    proc = hf_colpali_processor
    hf, cfg, params = colpali_pair_for_processor

    batch = proc.process_queries(QUERIES, return_tensors="pt")
    with torch.no_grad():
        ref = hf(**batch).embeddings.numpy()

    ids, mask = process_queries_ids(proc.tokenizer, QUERIES, prompts_from_processor(proc))
    ours = np.asarray(colpali_text_fwd(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_full_image_pipeline_parity(hf_colpali_processor, colpali_pair_for_processor, rng):
    """Image -> our preprocess+forward  ==  image -> HF processor -> HF."""
    from PIL import Image

    from multimodal_embedding_tpu.ops.preprocess import (
        PreprocessConfig, SIGLIP_MEAN, SIGLIP_STD, preprocess_batch,
    )

    proc = hf_colpali_processor
    hf, cfg, params = colpali_pair_for_processor
    raw = [rng.integers(0, 256, (28, 28, 3), dtype=np.uint8) for _ in range(2)]

    batch = proc.process_images([Image.fromarray(r) for r in raw], return_tensors="pt")
    with torch.no_grad():
        ref = hf(**batch).embeddings.numpy()

    pre = PreprocessConfig(image_size=28, resize_mode="exact", mean=SIGLIP_MEAN, std=SIGLIP_STD)
    pixels = preprocess_batch(pre, raw)
    ours = np.asarray(colpali_image_fwd(params, cfg, jnp.asarray(pixels)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
