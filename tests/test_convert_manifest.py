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


def test_qwen3_manifest_matches_converter_key_schema():
    """Qwen/Qwen3-14B manifest vs the converter's expected key/shape set,
    derived programmatically (materializing a 14B fp16 state dict is ~28 GB,
    so unlike the smaller models this checks the contract symbolically;
    live-HF key drift is covered at tiny scale by
    tests/test_qwen3_parity.py::test_qwen3_init_matches_converter_shapes)."""
    import json as _json

    from multimodal_embedding_tpu.models.qwen3 import QWEN3_14B as cfg

    man = _json.loads((MANIFESTS / "Qwen3-14B.json").read_text())
    expect = {
        "model.embed_tokens.weight": [cfg.vocab_size, cfg.dim],
        "model.norm.weight": [cfg.dim],
        "lm_head.weight": [cfg.vocab_size, cfg.dim],
    }
    for i in range(cfg.layers):
        lp = f"model.layers.{i}"
        expect.update(
            {
                f"{lp}.input_layernorm.weight": [cfg.dim],
                f"{lp}.post_attention_layernorm.weight": [cfg.dim],
                f"{lp}.self_attn.q_proj.weight": [cfg.heads * cfg.head_dim, cfg.dim],
                f"{lp}.self_attn.k_proj.weight": [cfg.kv_heads * cfg.head_dim, cfg.dim],
                f"{lp}.self_attn.v_proj.weight": [cfg.kv_heads * cfg.head_dim, cfg.dim],
                f"{lp}.self_attn.o_proj.weight": [cfg.dim, cfg.heads * cfg.head_dim],
                f"{lp}.self_attn.q_norm.weight": [cfg.head_dim],
                f"{lp}.self_attn.k_norm.weight": [cfg.head_dim],
                f"{lp}.mlp.gate_proj.weight": [cfg.mlp_dim, cfg.dim],
                f"{lp}.mlp.up_proj.weight": [cfg.mlp_dim, cfg.dim],
                f"{lp}.mlp.down_proj.weight": [cfg.dim, cfg.mlp_dim],
            }
        )
    assert man == expect


def test_manifest_drift_raises_clearly():
    sd = ManifestStateDict("OpenAI-CLIP-L")
    with pytest.raises(KeyError, match="key drift"):
        sd["text_model.nonexistent.weight"]
