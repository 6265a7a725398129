"""Offline protocol tests for the network-gated dataset loaders.

``datasets.load_dataset`` is monkeypatched with fixture datasets so the full
COCO protocol (prefilter >=5 captions → cache → refilter loadable → >=4900
abort → shuffle/sample, reference main.py:754-787), the Flickr30k/DocVQA
record schemas (v15 adapters), and Winoground's real-branch + gated-skip
(v28:413-461) are locked without network access.
"""

import numpy as np
import pytest
from PIL import Image

from multimodal_embedding_tpu.data import coco as coco_mod
from multimodal_embedding_tpu.data.coco import load_benchmark_dataset
from multimodal_embedding_tpu.data.download import prepare_dataset_cache


class FakeDataset:
    """Just enough of the HF Dataset surface for the loaders: len/iter/select/
    shuffle/filter, returning plain dict rows."""

    def __init__(self, rows):
        self.rows = list(rows)

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        return iter(self.rows)

    def select(self, idx):
        return FakeDataset([self.rows[i] for i in idx])

    def shuffle(self, seed):
        perm = np.random.default_rng(seed).permutation(len(self.rows))
        return FakeDataset([self.rows[i] for i in perm])

    def filter(self, fn):
        return FakeDataset([r for r in self.rows if fn(r)])


def _png(seed: int, size=(24, 20)) -> Image.Image:
    arr = np.random.default_rng(seed).integers(0, 256, (*size, 3), dtype=np.uint8)
    return Image.fromarray(arr)


def _patch_load_dataset(monkeypatch, fake, record):
    def load_dataset(name, *args, **kwargs):
        record.append((name, args, kwargs))
        if isinstance(fake, Exception):
            raise fake
        return fake

    monkeypatch.setattr("datasets.load_dataset", load_dataset)


# --- COCO (reference main.py:754-787) -----------------------------------------


def _coco_rows(n: int, n_caps=5):
    # 'sentences' arrives as a STRINGIFIED list in yerevann/coco-karpathy
    # (reference main.py:220-226 ast.literal_eval path)
    return [
        {
            "sentences": str([f"caption {i} variant {j}" for j in range(n_caps)]),
            "imgid": 1000 + i,
            "url": f"http://127.0.0.1:9/{i}.jpg",  # dead port: any download fails fast
        }
        for i in range(n)
    ]


def _seed_cache(rows, cache_dir):
    cache_dir.mkdir(parents=True, exist_ok=True)
    for r in rows:
        _png(r["imgid"]).save(cache_dir / f"{r['imgid']}.jpg")


def test_coco_protocol_prefilter_cache_refilter_shuffle(monkeypatch, tmp_path):
    rows = _coco_rows(8)
    rows[2]["sentences"] = str(["only", "four", "captions", "here"])  # prefiltered out
    _seed_cache([r for i, r in enumerate(rows) if i != 2], tmp_path / "cache")

    calls = []
    _patch_load_dataset(monkeypatch, FakeDataset(rows), calls)
    monkeypatch.setattr(coco_mod, "MIN_COCO_SIZE", 5)

    records = load_benchmark_dataset(
        "coco", cache_dir=tmp_path / "cache", workers=2, sample_size=6, seed=42
    )
    assert calls[0][0] == "yerevann/coco-karpathy"
    assert calls[0][2].get("split") == "test"
    # 8 raw - 1 prefiltered = 7 cached/loadable; sample_size=6 -> shuffled pick
    assert len(records) == 6
    for r in records:
        assert r["image"].dtype == np.uint8 and r["image"].ndim == 3
        assert len(r["captions"]) == 5 and r["captions"][0].startswith("caption")
        assert r["imgid"] != 1002  # the prefiltered row never survives

    # deterministic: same seed -> same selection/order
    records2 = load_benchmark_dataset(
        "coco", cache_dir=tmp_path / "cache", workers=2, sample_size=6, seed=42
    )
    assert [r["imgid"] for r in records] == [r["imgid"] for r in records2]


def test_coco_min_size_abort(monkeypatch, tmp_path):
    """<MIN_COCO_SIZE loadable images aborts the run (reference main.py:781-783)."""
    rows = _coco_rows(4)
    _seed_cache(rows, tmp_path / "cache")
    _patch_load_dataset(monkeypatch, FakeDataset(rows), [])
    monkeypatch.setattr(coco_mod, "MIN_COCO_SIZE", 5)
    with pytest.raises(SystemExit):
        load_benchmark_dataset("coco", cache_dir=tmp_path / "cache", workers=2, sample_size=10)


def test_prepare_cache_99pct_abort(tmp_path):
    """>1% download failures abort (reference main.py:216-218). Cached rows
    hit the verify path; the uncached row's URL is a dead local port."""
    rows = _coco_rows(3)
    _seed_cache(rows[:2], tmp_path / "cache")
    with pytest.raises(SystemExit):
        prepare_dataset_cache(FakeDataset(rows), tmp_path / "cache", workers=2)


def test_corrupt_cache_entry_is_deleted_and_refetched(tmp_path):
    """Cache-hit verify deletes corrupt files (reference main.py:177-182);
    the re-download then fails (dead port) -> 99% abort. The corrupt file
    must be gone."""
    rows = _coco_rows(2)
    _seed_cache(rows[:1], tmp_path / "cache")
    bad = tmp_path / "cache" / f"{rows[1]['imgid']}.jpg"
    bad.write_bytes(b"not a jpeg")
    with pytest.raises(SystemExit):
        prepare_dataset_cache(FakeDataset(rows), tmp_path / "cache", workers=2)
    assert not bad.exists()


# --- Flickr30k / DocVQA (v15-era adapters, SURVEY.md §7.4) ---------------------


def test_flickr30k_schema_and_split_filter(monkeypatch):
    rows = [
        {
            "image": _png(i),
            "caption": [f"flickr cap {i}.{j}" for j in range(6)],
            "split": "test" if i % 2 == 0 else "train",
        }
        for i in range(6)
    ]
    rows[0]["caption"] = ["too", "few"]  # <5 captions -> skipped
    calls = []
    _patch_load_dataset(monkeypatch, FakeDataset(rows), calls)
    records = load_benchmark_dataset("flickr30k", sample_size=100)
    assert calls[0][0] == "nlphuji/flickr30k"
    # rows 0,2,4 have split=='test'; row 0 is dropped for caption count
    assert len(records) == 2
    for r in records:
        assert r["image"].dtype == np.uint8
        assert len(r["captions"]) == 5
        assert all(isinstance(c, str) for c in r["captions"])


def test_docvqa_schema(monkeypatch):
    rows = [
        {"question": f"what is on page {i}?", "image": _png(i)} for i in range(4)
    ]
    rows[1]["question"] = None  # skipped
    calls = []
    _patch_load_dataset(monkeypatch, FakeDataset(rows), calls)
    records = load_benchmark_dataset("docvqa", sample_size=100)
    assert calls[0][0] == "lmms-lab/DocVQA"
    assert calls[0][2].get("split") == "validation"
    assert len(records) == 3
    for r in records:
        assert len(r["captions"]) == 1 and r["captions"][0].startswith("what is")
        assert r["image"].ndim == 3


# --- Winoground (gated dataset, v28:413-461) -----------------------------------


def test_winoground_real_branch(monkeypatch):
    from multimodal_embedding_tpu.analysis.winoground import load_winoground

    rows = [
        {
            "image_0": _png(10 + i),
            "image_1": _png(20 + i),
            "caption_0": f"an old person kisses a young person {i}",
            "caption_1": f"a young person kisses an old person {i}",
        }
        for i in range(5)
    ]
    calls = []
    _patch_load_dataset(monkeypatch, FakeDataset(rows), calls)
    monkeypatch.setenv("HF_TOKEN", "fixture-token")
    records = load_winoground(sample_size=3)
    assert calls[0][0] == "facebook/winoground"
    assert calls[0][2].get("token") == "fixture-token"  # auth forwarded
    assert len(records) == 3
    for r in records:
        assert r["image_0"].dtype == np.uint8 and r["image_1"].dtype == np.uint8
        assert r["caption_0"] != r["caption_1"]


def test_winoground_gated_skip(monkeypatch, caplog):
    """Unauthenticated/offline load degrades to an empty list + warning, not
    a crash of the model loop."""
    import logging

    from multimodal_embedding_tpu.analysis.winoground import load_winoground

    _patch_load_dataset(monkeypatch, RuntimeError("401: gated dataset"), [])
    with caplog.at_level(logging.WARNING, logger="mme_tpu"):
        records = load_winoground(sample_size=3)
    assert records == []
    assert any("Winoground unavailable" in m for m in caplog.messages)
