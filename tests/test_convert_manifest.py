"""Converter key-manifest drift tests.

tests/manifests/*.json pin the exact state-dict keys+shapes of each HF
checkpoint, captured from locally-instantiated full-architecture HF models
(tools/gen_convert_manifests.py, meta device — no network). These tests run
every converter against a synthetic state dict built from its manifest, so:

- converter drift (expecting a key the checkpoint doesn't have) fails as a
  clear KeyError against the pinned manifest, offline;
- shape drift fails against the shape pytree of the random-init builders
  (via jax.eval_shape — no weight memory);
- a transformers upgrade that renames checkpoint keys is caught by
  regenerating manifests (tools/gen_convert_manifests.py) and diffing.
"""

import gc
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

MANIFESTS = Path(__file__).parent / "manifests"


class ManifestStateDict(dict):
    """Lazily materializes float16 zeros per manifest key; unknown keys
    raise with the manifest name so drift reads as what it is."""

    def __init__(self, name: str):
        self.name = name
        self.shapes = json.loads((MANIFESTS / f"{name}.json").read_text())
        self.accessed: set[str] = set()
        super().__init__()

    def __getitem__(self, key):
        if key not in self.shapes:
            raise KeyError(
                f"converter expects '{key}' which is not in the {self.name} "
                f"checkpoint manifest — converter/HF key drift"
            )
        self.accessed.add(key)
        return np.zeros(self.shapes[key], np.float16)

    def __contains__(self, key):
        return key in self.shapes

    def keys(self):
        return self.shapes.keys()

    def __iter__(self):
        return iter(self.shapes)

    def __len__(self):
        return len(self.shapes)

    def items(self):  # jina's _StrictSD copies via items()
        return ((k, self[k]) for k in self.shapes)


def _shape_tree(params):
    return jax.tree.map(lambda a: tuple(a.shape), params)


def _assert_same_shapes(converted, init_shapes, model):
    got = _shape_tree(converted)
    want = jax.tree.map(lambda s: tuple(s.shape), init_shapes)
    assert got == want, f"{model}: converted param shapes != init builder shapes"


DENSE = ["OpenAI-CLIP-L", "LAION-CLIP-H", "MetaCLIP-H14", "Apple-DFN5B-H"]


@pytest.mark.parametrize("name", DENSE)
def test_clip_converter_matches_manifest(name):
    from multimodal_embedding_tpu.models.arch import full_arch_config
    from multimodal_embedding_tpu.models.convert import clip_params_from_hf
    from multimodal_embedding_tpu.models.towers import dual_encoder_init

    cfg = full_arch_config(name)
    sd = ManifestStateDict(name)
    params = clip_params_from_hf(sd, cfg)
    assert sd.accessed, "converter read nothing"

    init_shapes = jax.eval_shape(
        lambda: dual_encoder_init(jax.random.key(0), cfg, jnp.float16)
    )
    _assert_same_shapes(params, init_shapes, name)
    del params
    gc.collect()


def test_siglip_converter_matches_manifest():
    from multimodal_embedding_tpu.models.arch import full_arch_config
    from multimodal_embedding_tpu.models.convert import siglip_params_from_hf
    from multimodal_embedding_tpu.models.towers import dual_encoder_init

    cfg = full_arch_config("SigLIP-400M")
    sd = ManifestStateDict("SigLIP-400M")
    params = siglip_params_from_hf(sd, cfg)
    init_shapes = jax.eval_shape(
        lambda: dual_encoder_init(jax.random.key(0), cfg, jnp.float16)
    )
    _assert_same_shapes(params, init_shapes, "SigLIP-400M")
    del params
    gc.collect()


@pytest.mark.slow
def test_colpali_converter_matches_manifest():
    from multimodal_embedding_tpu.models.arch import full_colpali_config
    from multimodal_embedding_tpu.models.colpali import colpali_init, colpali_params_from_hf

    cfg = full_colpali_config()
    sd = ManifestStateDict("ColPali-v1.3")
    suffix = np.array([2, 10, 11, 12, 13, 14], np.int32)
    params = colpali_params_from_hf(sd, cfg, suffix)
    init_shapes = jax.eval_shape(
        lambda: colpali_init(jax.random.key(0), cfg, suffix, jnp.float16)
    )
    _assert_same_shapes(params, init_shapes, "ColPali-v1.3")
    del params
    gc.collect()


def test_jina_converter_matches_manifest():
    from multimodal_embedding_tpu.models.arch import full_jina_config
    from multimodal_embedding_tpu.models.jina import (
        eva02_init,
        jina_bert_init,
        jina_params_from_hf,
    )

    cfg = full_jina_config()
    sd = ManifestStateDict("Jina-CLIP-v1")
    params = jina_params_from_hf(sd, cfg)
    init_shapes = jax.eval_shape(
        lambda: {
            "vision": eva02_init(jax.random.key(0), cfg.vision, jnp.float16),
            "text": jina_bert_init(jax.random.key(1), cfg.text, jnp.float16),
        }
    )
    # the real checkpoint's EVA02 head is nn.Linear WITH bias; the random
    # init omits it (jina.py's forward supports both)
    init_shapes["vision"]["proj_b"] = jax.ShapeDtypeStruct((cfg.vision.proj_dim,), jnp.float16)
    _assert_same_shapes(params, init_shapes, "Jina-CLIP-v1")
    del params
    gc.collect()


def test_manifest_drift_raises_clearly():
    sd = ManifestStateDict("OpenAI-CLIP-L")
    with pytest.raises(KeyError, match="key drift"):
        sd["text_model.nonexistent.weight"]
