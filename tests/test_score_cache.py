"""Score-matrix checkpoint/resume keying.

The cache key must cover everything that changes the numerics of the score
matrices: model, dataset fingerprint, backend, attention/layer impls,
preprocess impl and maxsim impl — a rerun with a different numerics flag
must MISS the cache (silent reuse would report statistics computed under
different numerics).
"""

import numpy as np

from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.stats.score_cache import (
    dataset_fingerprint,
    load_scores,
    numerics_fingerprint,
    save_scores,
)


def _records(n=8):
    return [{"imgid": i, "captions": [f"cap {i} {j}" for j in range(5)]} for i in range(n)]


def test_roundtrip(tmp_path):
    recs = _records()
    s1 = np.arange(64, dtype=np.float32).reshape(8, 8)
    s2 = np.arange(320, dtype=np.float32).reshape(8, 40)
    save_scores(str(tmp_path), "m", recs, s1, s2, 12.5)
    got = load_scores(str(tmp_path), "m", recs)
    assert got is not None
    np.testing.assert_array_equal(got[0], s1)
    np.testing.assert_array_equal(got[1], s2)
    assert got[2] == 12.5


def test_dataset_change_misses(tmp_path):
    recs = _records()
    save_scores(str(tmp_path), "m", recs, np.zeros((8, 8)), np.zeros((8, 40)), 1.0)
    other = _records()
    other[0]["captions"][0] = "different first caption"
    assert load_scores(str(tmp_path), "m", other) is None
    assert dataset_fingerprint(recs) != dataset_fingerprint(other)


def test_numerics_flag_change_misses(tmp_path):
    recs = _records()
    save_scores(str(tmp_path), "m", recs, np.zeros((8, 8)), np.zeros((8, 40)), 1.0)
    # different preprocess impl -> miss
    assert load_scores(str(tmp_path), "m", recs, preprocess_impl="pallas") is None
    # different maxsim impl -> miss
    assert load_scores(str(tmp_path), "m", recs, maxsim_impl="pallas") is None
    # same flags -> hit; 'auto' maxsim resolves to 'xla' on CPU, so the
    # explicit equivalent hits too
    assert load_scores(str(tmp_path), "m", recs) is not None
    assert load_scores(str(tmp_path), "m", recs, maxsim_impl="xla") is not None


def test_attention_impl_change_misses(tmp_path):
    recs = _records()
    prev = layers._ATTENTION_IMPL
    try:
        layers.set_attention_impl("xla")
        save_scores(str(tmp_path), "m", recs, np.zeros((8, 8)), np.zeros((8, 40)), 1.0)
        layers.set_attention_impl("xla_bf16")
        assert load_scores(str(tmp_path), "m", recs) is None
        layers.set_attention_impl("xla")
        assert load_scores(str(tmp_path), "m", recs) is not None
    finally:
        layers.set_attention_impl(prev)


def test_numerics_fingerprint_resolves_auto():
    prev = layers._ATTENTION_IMPL
    try:
        layers.set_attention_impl("auto")
        fp = numerics_fingerprint()
        assert "auto" not in fp  # resolved per backend, never the literal "auto"
    finally:
        layers.set_attention_impl(prev)
