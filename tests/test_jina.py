"""Structural tests for the Jina-CLIP towers (EVA02 + JinaBERT).

The real checkpoint needs trust_remote_code (unavailable offline, see
models/jina.py), so these validate architecture-level invariants instead of
HF parity.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_embedding_tpu.models.jina import (
    JinaClipConfig,
    alibi_slopes,
    debug_jina_config,
    eva02_apply,
    eva02_init,
    jina_bert_apply,
    jina_bert_init,
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
