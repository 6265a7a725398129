"""Preprocessing parity: MXU-matmul resize vs PIL, HF-processor semantics."""

import numpy as np
import pytest
from PIL import Image

from multimodal_embedding_tpu.ops.preprocess import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    PreprocessConfig,
    make_preprocess_fn,
    pil_resize_matrix,
    preprocess_batch,
    shortest_edge_size,
)


def _pil_resize(img: np.ndarray, size_wh, resample) -> np.ndarray:
    return np.asarray(Image.fromarray(img).resize(size_wh, resample=resample))


@pytest.mark.parametrize("in_hw,out_hw", [((64, 48), (32, 24)), ((37, 53), (96, 80)), ((100, 100), (224, 224))])
@pytest.mark.parametrize("interp,pil_resample", [("bicubic", Image.BICUBIC), ("bilinear", Image.BILINEAR)])
def test_resize_matrix_matches_pil(rng, in_hw, out_hw, interp, pil_resample):
    h, w = in_hw
    oh, ow = out_hw
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref = _pil_resize(img, (ow, oh), pil_resample).astype(np.float32)

    wv = pil_resize_matrix(h, oh, interp)
    wh = pil_resize_matrix(w, ow, interp)

    def quant(x):
        return np.clip(np.round(x), 0, 255)

    # PIL pass order: horizontal, quantize to uint8, vertical, quantize
    ours = quant(np.einsum("pw,hwc->hpc", wh, img.astype(np.float32)))
    ours = quant(np.einsum("oh,hpc->opc", wv, ours))
    # PIL uses 8-bit fixed-point weights; we use float32 — allow 1 level.
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_shortest_edge_matches_hf():
    # HF get_resize_output_image_size(default_to_square=False)
    assert shortest_edge_size(480, 640, 224) == (224, int(224 * 640 / 480))
    assert shortest_edge_size(640, 480, 336) == (int(336 * 640 / 480), 336)
    assert shortest_edge_size(224, 224, 224) == (224, 224)


def test_full_pipeline_matches_hf_clip_processor(rng):
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 64},
        do_center_crop=True,
        crop_size={"height": 64, "width": 64},
        do_rescale=True,
        do_normalize=True,
        image_mean=list(OPENAI_CLIP_MEAN),
        image_std=list(OPENAI_CLIP_STD),
    )
    cfg = PreprocessConfig(image_size=64)

    img = rng.integers(0, 256, size=(97, 123, 3), dtype=np.uint8)
    ref = proc(images=Image.fromarray(img), return_tensors="np")["pixel_values"][0]  # [3,64,64]
    ours = preprocess_batch(cfg, [img])[0]  # [64,64,3]
    ours_chw = np.transpose(ours, (2, 0, 1))
    # fixed-point resize differences propagate through normalize (~2/255/std)
    assert np.max(np.abs(ours_chw - ref)) < 0.05
    assert np.mean(np.abs(ours_chw - ref)) < 0.005


def test_exact_resize_mode_matches_hf_siglip(rng):
    pytest.importorskip("transformers")
    from transformers import SiglipImageProcessor

    proc = SiglipImageProcessor(size={"height": 48, "width": 48})
    cfg = PreprocessConfig(
        image_size=48, resize_mode="exact", mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)
    )
    img = rng.integers(0, 256, size=(80, 60, 3), dtype=np.uint8)
    ref = proc(images=Image.fromarray(img), return_tensors="np")["pixel_values"][0]
    ours = np.transpose(preprocess_batch(cfg, [img])[0], (2, 0, 1))
    assert np.max(np.abs(ours - ref)) < 0.05


def test_mixed_geometry_batch(rng):
    cfg = PreprocessConfig(image_size=32)
    imgs = [
        rng.integers(0, 256, size=(50, 70, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(64, 40, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(50, 70, 3), dtype=np.uint8),
    ]
    out = preprocess_batch(cfg, imgs)
    assert out.shape == (3, 32, 32, 3)
    # same-geometry images must be processed by the same compiled fn
    single = preprocess_batch(cfg, [imgs[2]])[0]
    np.testing.assert_allclose(out[2], single, atol=1e-5)


def test_pallas_preprocess_matches_xla_path(rng):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA matmul path."""
    import jax.numpy as jnp

    from multimodal_embedding_tpu.ops.preprocess_pallas import preprocess_pallas

    cfg = PreprocessConfig(image_size=32)
    h, w = 50, 70
    imgs = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
    ref = preprocess_batch(cfg, list(imgs))
    nchw = jnp.asarray(imgs.transpose(0, 3, 1, 2))
    got = np.asarray(preprocess_pallas(nchw, cfg, h, w, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_registry_matches_reference_models():
    """7 default models with the reference's names and ids (reference
    main.py:129-137). ColPali keeps a model-pinned batch size like the
    reference (which uses 4 for GPU OOM headroom); ours is the measured v5e
    optimum, documented in COMPAT.md."""
    from multimodal_embedding_tpu.models.registry import get_models_to_test

    models = get_models_to_test("all", default_batch_size=32)
    by_name = {m.name: m for m in models}
    assert set(by_name) == {
        "ColPali-v1.3", "SigLIP-400M", "LAION-CLIP-H", "Jina-CLIP-v1",
        "MetaCLIP-H14", "OpenAI-CLIP-L", "Apple-DFN5B-H",
    }
    assert by_name["ColPali-v1.3"].batch_size == 8
    assert by_name["OpenAI-CLIP-L"].hf_id == "openai/clip-vit-large-patch14-336"
    assert by_name["LAION-CLIP-H"].hf_id == "laion/CLIP-ViT-H-14-laion2B-s32B-b79K"
    assert by_name["MetaCLIP-H14"].trust_remote_code
    assert by_name["SigLIP-400M"].preprocess.image_size == 384
    assert by_name["Apple-DFN5B-H"].preprocess.image_size == 378
