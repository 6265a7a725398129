"""Jina-CLIP tower tests: numerical parity vs an independent torch
reference (tests/jina_torch_reference.py, written separately from
models/jina.py), strict-converter drift detection, and architecture-level
structural invariants.

The real checkpoint needs trust_remote_code (unavailable offline, see
models/jina.py); the torch reference doubles as a synthetic state dict with
the real checkpoint's key naming.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from multimodal_embedding_tpu.models.jina import (
    JinaClipConfig,
    alibi_slopes,
    debug_jina_config,
    eva02_apply,
    eva02_init,
    jina_bert_apply,
    jina_bert_init,
    jina_config_from_sd,
    jina_params_from_hf,
)


def test_alibi_slopes_power_of_two():
    s = alibi_slopes(8)
    expected = [2 ** (-i) for i in range(1, 9)]
    np.testing.assert_allclose(s, expected, rtol=1e-6)


def test_alibi_slopes_non_power_of_two():
    s = alibi_slopes(12)
    assert len(s) == 12
    assert np.all(s > 0) and np.all(s <= 1.0)
    # first 8 are the 8-head slopes
    np.testing.assert_allclose(s[:8], alibi_slopes(8), rtol=1e-6)


@pytest.fixture(scope="module")
def jina_setup():
    cfg = debug_jina_config()
    kv, kt = jax.random.split(jax.random.key(0))
    vparams = eva02_init(kv, cfg.vision)
    tparams = jina_bert_init(kt, cfg.text)
    return cfg, vparams, tparams


def test_eva02_shapes_and_determinism(jina_setup, rng):
    cfg, vparams, _ = jina_setup
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    out1 = np.asarray(eva02_apply(vparams, cfg.vision, jnp.asarray(px)))
    out2 = np.asarray(eva02_apply(vparams, cfg.vision, jnp.asarray(px)))
    assert out1.shape == (2, 24)
    np.testing.assert_array_equal(out1, out2)
    assert np.isfinite(out1).all()


def test_jina_bert_mask_invariance(jina_setup, rng):
    """Changing token ids at masked positions must not change the embedding."""
    cfg, _, tparams = jina_setup
    ids = rng.integers(1, 256, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[:, 8:] = 0
    ids2 = ids.copy()
    ids2[:, 8:] = 77  # mutate padding content
    e1 = np.asarray(jina_bert_apply(tparams, cfg.text, jnp.asarray(ids), jnp.asarray(mask)))
    e2 = np.asarray(jina_bert_apply(tparams, cfg.text, jnp.asarray(ids2), jnp.asarray(mask)))
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_jina_bert_alibi_position_sensitivity(jina_setup, rng):
    """ALiBi (not positional embeddings) must make token ORDER matter.

    Note: full sequence REVERSAL is a genuine symmetry of symmetric ALiBi +
    mean pooling (|i-j| is reversal-invariant), so use a roll instead."""
    cfg, _, tparams = jina_setup
    ids = rng.integers(1, 256, size=(1, 8)).astype(np.int32)
    rolled = np.roll(ids, 3, axis=1)
    mask = np.ones((1, 8), np.int32)
    e1 = np.asarray(jina_bert_apply(tparams, cfg.text, jnp.asarray(ids), jnp.asarray(mask)))
    e2 = np.asarray(jina_bert_apply(tparams, cfg.text, jnp.asarray(rolled), jnp.asarray(mask)))
    assert np.abs(e1 - e2).max() > 1e-4

    # and full reversal IS (correctly) a symmetry
    rev = ids[:, ::-1].copy()
    e3 = np.asarray(jina_bert_apply(tparams, cfg.text, jnp.asarray(rev), jnp.asarray(mask)))
    np.testing.assert_allclose(e1, e3, atol=1e-5)


# --- numerical parity vs the independent torch reference -----------------------


@pytest.fixture(scope="module")
def jina_torch_pair():
    """Torch reference model (real-checkpoint key naming, 64-d heads so the
    config derivation path is exercised) + converted JAX params."""
    from tests.jina_torch_reference import Eva02Torch, JinaBertTorch, JinaClipTorch

    torch.manual_seed(0)
    vision = Eva02Torch(
        image_size=32, patch_size=16, dim=128, layers=2, heads=2,
        mlp_dim=160, proj_dim=64,
    )
    with torch.no_grad():
        vision.cls_token.normal_(std=0.02)
        vision.pos_embed.normal_(std=0.02)
    bert = JinaBertTorch(vocab=128, dim=128, layers=2, heads=2, mlp_dim=192)
    model = JinaClipTorch(vision, bert).eval()

    sd = model.state_dict()
    cfg = jina_config_from_sd(sd)
    params = jina_params_from_hf(sd, cfg)
    return model, cfg, params


def test_jina_config_derivation(jina_torch_pair):
    _, cfg, _ = jina_torch_pair
    assert cfg.vision.dim == 128 and cfg.vision.heads == 2 and cfg.vision.layers == 2
    assert cfg.vision.image_size == 32 and cfg.vision.proj_dim == 64
    assert cfg.vision.mlp_dim == 160
    assert cfg.text.vocab_size == 128 and cfg.text.mlp_dim == 192
    assert cfg.text.heads == 2 and cfg.text.layers == 2


def test_eva02_numerical_parity(jina_torch_pair, rng):
    model, cfg, params = jina_torch_pair
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(px.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(eva02_apply(params["vision"], cfg.vision, jnp.asarray(px)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_jina_bert_numerical_parity(jina_torch_pair, rng):
    model, cfg, params = jina_torch_pair
    ids = rng.integers(1, 128, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[1, 9:] = 0  # right padding
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    ours = np.asarray(
        jina_bert_apply(params["text"], cfg.text, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_converter_fails_loudly_on_missing_key(jina_torch_pair):
    model, cfg, _ = jina_torch_pair
    sd = dict(model.state_dict())
    del sd["vision_model.blocks.1.mlp.w3.weight"]
    with pytest.raises(KeyError, match="blocks.1.mlp.w3.weight"):
        jina_params_from_hf(sd, cfg)


def test_converter_fails_loudly_on_unknown_key(jina_torch_pair):
    model, cfg, _ = jina_torch_pair
    sd = dict(model.state_dict())
    sd["text_model.transformer.encoder.layer.0.mlp.extra_gate.weight"] = (
        sd["text_model.transformer.encoder.layer.0.mlp.wo.bias"]
    )
    with pytest.raises(ValueError, match="extra_gate"):
        jina_params_from_hf(sd, cfg)


def test_converter_ignores_known_non_weights(jina_torch_pair):
    """Rope buffers / pooler / logit_scale in the checkpoint must not trip
    the strict leftover check (pooler.* is present in the reference sd)."""
    model, cfg, _ = jina_torch_pair
    sd = dict(model.state_dict())
    sd["logit_scale"] = torch.tensor(2.6592)
    sd["vision_model.rope.freqs_cos"] = torch.zeros(4)
    jina_params_from_hf(sd, cfg)  # no raise


def test_jina_cli_end_to_end(tmp_path):
    import pandas as pd

    from multimodal_embedding_tpu.cli.main import main

    out = tmp_path / "jina.csv"
    rc = main(
        [
            "--dataset", "synthetic", "--debug-models", "--models", "Jina-CLIP-v1",
            "--sample-size", "16", "--bootstrap-iterations", "5", "--output", str(out),
        ]
    )
    assert rc == 0
    df = pd.read_csv(out)
    assert df.iloc[0]["Model"] == "Jina-CLIP-v1"
