"""Offline tests for the L5 data/network layer (reference main.py:169-218,
754-787): downloader retry/verify/abort semantics against a local HTTP
server, and the HF dataset adapters (coco / flickr30k / docvqa / winoground)
against in-memory ``datasets.Dataset`` fixtures — no network."""

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from multimodal_embedding_tpu.data.download import (
    download_image_task,
    load_cached_image,
    prepare_dataset_cache,
)


def _jpeg_bytes(seed: int = 0, size: int = 24) -> bytes:
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


class _ImageServer:
    """Local HTTP server: /img<i>.jpg serves a jpeg; /fail404 404s; /flaky
    fails (500) the first `flaky_failures` times, then serves a jpeg."""

    def __init__(self, flaky_failures: int = 2):
        state = {"flaky_left": flaky_failures, "hits": []}
        self.state = state

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                state["hits"].append(self.path)
                if self.path.startswith("/fail"):
                    self.send_response(404)
                    self.end_headers()
                    return
                if self.path.startswith("/flaky") and state["flaky_left"] > 0:
                    state["flaky_left"] -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                body = _jpeg_bytes(seed=hash(self.path) % 1000)
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture(scope="module")
def image_server():
    srv = _ImageServer()
    yield srv
    srv.close()


def test_download_success_and_cache_hit(image_server, tmp_path):
    item = {"idx": 0, "url": f"{image_server.url}/img0.jpg", "imgid": "a0"}
    idx, ok = download_image_task(item, tmp_path)
    assert (idx, ok) == (0, True)
    assert (tmp_path / "a0.jpg").exists()
    hits_before = len(image_server.state["hits"])
    # second call is a verified cache hit — no request goes out
    idx, ok = download_image_task(item, tmp_path)
    assert ok and len(image_server.state["hits"]) == hits_before


def test_corrupt_cache_evicted_and_redownloaded(image_server, tmp_path):
    (tmp_path / "bad.jpg").write_bytes(b"not a jpeg at all")
    item = {"idx": 1, "url": f"{image_server.url}/img1.jpg", "imgid": "bad"}
    idx, ok = download_image_task(item, tmp_path)
    assert ok
    with Image.open(tmp_path / "bad.jpg") as img:
        img.verify()  # replaced by a valid file


def test_retry_with_backoff_then_success(image_server, tmp_path, monkeypatch):
    sleeps = []
    monkeypatch.setattr("multimodal_embedding_tpu.data.download.time.sleep", sleeps.append)
    image_server.state["flaky_left"] = 2
    item = {"idx": 2, "url": f"{image_server.url}/flaky.jpg", "imgid": "fl"}
    idx, ok = download_image_task(item, tmp_path)
    assert ok
    assert sleeps == [0.5, 1.0]  # 0.5 * 2**attempt exponential backoff


def test_download_gives_up_after_retries(image_server, tmp_path, monkeypatch):
    monkeypatch.setattr("multimodal_embedding_tpu.data.download.time.sleep", lambda s: None)
    item = {"idx": 3, "url": f"{image_server.url}/fail404.jpg", "imgid": "nf"}
    idx, ok = download_image_task(item, tmp_path)
    assert (idx, ok) == (3, False)
    assert not (tmp_path / "nf.jpg").exists()


def test_prepare_cache_aborts_below_99pct(image_server, tmp_path, monkeypatch):
    monkeypatch.setattr("multimodal_embedding_tpu.data.download.time.sleep", lambda s: None)
    ds = [
        {"url": f"{image_server.url}/img{i}.jpg", "imgid": f"p{i}"} for i in range(9)
    ] + [{"url": f"{image_server.url}/fail404.jpg", "imgid": "p9"}]
    with pytest.raises(SystemExit):
        prepare_dataset_cache(ds, tmp_path, workers=4)


def test_prepare_cache_success(image_server, tmp_path):
    ds = [{"url": f"{image_server.url}/img{i}.jpg", "imgid": f"s{i}"} for i in range(5)]
    prepare_dataset_cache(ds, tmp_path, workers=4)  # no raise
    for i in range(5):
        img = load_cached_image({"imgid": f"s{i}"}, tmp_path)
        assert img is not None and img.mode == "RGB"


# --- HF dataset adapters on in-memory fixtures ----------------------------------

datasets = pytest.importorskip("datasets")


def _pil(seed: int):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))


def test_load_coco_with_fixture(image_server, tmp_path, monkeypatch):
    """Full _load_coco flow: prefilter >=5 captions -> cache -> refilter ->
    size gate -> shuffle/sample -> records."""
    import multimodal_embedding_tpu.data.coco as coco_mod

    n = 8
    fixture = datasets.Dataset.from_dict(
        {
            "url": [f"{image_server.url}/coco{i}.jpg" for i in range(n)],
            "imgid": [f"c{i}" for i in range(n)],
            # item 3 has only 4 captions -> prefiltered out
            "sentences": [
                str([f"caption {i} variant {j}" for j in range(4 if i == 3 else 5)])
                for i in range(n)
            ],
        }
    )
    monkeypatch.setattr(
        coco_mod, "MIN_COCO_SIZE", 5
    )  # the real >=4900 gate, scaled to the fixture
    called = {}

    def fake_load_dataset(name, split=None, **kw):
        called["name"], called["split"] = name, split
        return fixture

    monkeypatch.setattr("datasets.load_dataset", fake_load_dataset)
    records = coco_mod._load_coco(tmp_path, workers=4, sample_size=6, seed=0)
    assert called == {"name": "yerevann/coco-karpathy", "split": "test"}
    assert len(records) == 6  # 7 valid after prefilter, sampled to 6
    for r in records:
        assert r["image"].dtype == np.uint8 and len(r["captions"]) == 5


def test_load_coco_aborts_when_too_small(image_server, tmp_path, monkeypatch):
    import multimodal_embedding_tpu.data.coco as coco_mod

    fixture = datasets.Dataset.from_dict(
        {
            "url": [f"{image_server.url}/tiny0.jpg"],
            "imgid": ["t0"],
            "sentences": [str([f"c{j}" for j in range(5)])],
        }
    )
    monkeypatch.setattr("datasets.load_dataset", lambda *a, **k: fixture)
    with pytest.raises(SystemExit):  # 1 < MIN_COCO_SIZE (4900)
        coco_mod._load_coco(tmp_path, workers=2, sample_size=5, seed=0)


def test_load_flickr30k_with_fixture(monkeypatch):
    from multimodal_embedding_tpu.data.coco import _load_flickr30k

    n = 6
    fixture = datasets.Dataset.from_dict(
        {
            "image": [_pil(i) for i in range(n)],
            "caption": [[f"flickr cap {i}.{j}" for j in range(6 if i else 3)] for i in range(n)],
            "split": ["test"] * (n - 1) + ["train"],
        }
    ).cast_column("image", datasets.Image())
    monkeypatch.setattr("datasets.load_dataset", lambda *a, **k: fixture)
    records = _load_flickr30k(sample_size=100, seed=0)
    # item 0 has <5 captions, item 5 is split=train -> 4 records remain
    assert len(records) == 4
    for r in records:
        assert r["image"].shape == (16, 16, 3) and len(r["captions"]) == 5
        assert all(isinstance(c, str) for c in r["captions"])


def test_load_docvqa_with_fixture(monkeypatch):
    from multimodal_embedding_tpu.data.coco import _load_docvqa

    fixture = datasets.Dataset.from_dict(
        {
            "image": [_pil(10 + i) for i in range(4)],
            "question": ["what is the total?", "", "who signed?", "date?"],
        }
    ).cast_column("image", datasets.Image())
    monkeypatch.setattr("datasets.load_dataset", lambda *a, **k: fixture)
    records = _load_docvqa(sample_size=100, seed=0)
    assert len(records) == 3  # empty question dropped
    assert records[0]["captions"] == ["what is the total?"]


def test_load_winoground_hf_branch(monkeypatch):
    from multimodal_embedding_tpu.analysis.winoground import load_winoground

    fixture = datasets.Dataset.from_dict(
        {
            "image_0": [_pil(20 + i) for i in range(3)],
            "image_1": [_pil(30 + i) for i in range(3)],
            "caption_0": [f"an old dog {i}" for i in range(3)],
            "caption_1": [f"a dog old {i}" for i in range(3)],
        }
    ).cast_column("image_0", datasets.Image()).cast_column("image_1", datasets.Image())
    seen = {}

    def fake_load_dataset(name, split=None, token=None, **kw):
        seen["name"], seen["token"] = name, token
        return fixture

    monkeypatch.setattr("datasets.load_dataset", fake_load_dataset)
    monkeypatch.setenv("HF_TOKEN", "hf_dummy_token")
    records = load_winoground(sample_size=2)
    assert seen == {"name": "facebook/winoground", "token": "hf_dummy_token"}
    assert len(records) == 2
    assert records[0]["image_0"].shape == (16, 16, 3)
    assert records[0]["caption_1"] == "a dog old 0"


def test_load_winoground_gated_skip(monkeypatch, caplog):
    """Unauthenticated access to the gated dataset degrades to a skip."""
    from multimodal_embedding_tpu.analysis.winoground import load_winoground

    def deny(*a, **k):
        raise RuntimeError("401 Client Error: gated dataset")

    monkeypatch.setattr("datasets.load_dataset", deny)
    monkeypatch.delenv("HF_TOKEN", raising=False)
    monkeypatch.delenv("HUGGING_FACE_HUB_TOKEN", raising=False)
    with caplog.at_level("WARNING", logger="mme_tpu"):
        records = load_winoground()
    assert records == []
    assert any("HF_TOKEN" in r.message for r in caplog.records)


def test_karpathy_split_parser(tmp_path):
    """The karpathy subcommand parses the official dataset_*.json format
    (reference download_karpathy_split.py:98-133): restval merges into train,
    imgid/cocoid/filename fallbacks, per-split ID files."""
    import json

    from multimodal_embedding_tpu.cli.inspect_data import (
        find_karpathy_json,
        main as inspect_main,
        parse_karpathy_split,
    )

    data = {
        "images": [
            {"split": "train", "imgid": 1, "filename": "a.jpg"},
            {"split": "restval", "imgid": 2, "filename": "b.jpg"},  # -> train
            {"split": "val", "cocoid": 30, "filename": "c.jpg"},  # no imgid
            {"split": "test", "filename": "4567.jpg"},  # filename fallback
            {"split": "test", "imgid": 5, "filename": "e.jpg"},
        ]
    }
    src = tmp_path / "cache" / "dataset_flickr30k.json"
    src.parent.mkdir()
    src.write_text(json.dumps(data))

    # locate step (find_karpathy_split.py's manual approach, automated)
    assert find_karpathy_json([str(tmp_path)]) == src
    assert find_karpathy_json([str(tmp_path / "nope")]) is None

    out = tmp_path / "ids"
    counts = parse_karpathy_split(src, out, "flickr30k")
    assert counts == {"train": 2, "val": 1, "test": 2}
    assert (out / "flickr30k_train_ids.txt").read_text() == "1\n2"
    assert (out / "flickr30k_val_ids.txt").read_text() == "30"
    assert (out / "flickr30k_test_ids.txt").read_text() == "4567\n5"

    # CLI surface
    rc = inspect_main(
        ["karpathy", "--json", str(src), "--out-dir", str(tmp_path / "ids2")]
    )
    assert rc == 0
    assert (tmp_path / "ids2" / "flickr30k_test_ids.txt").exists()
    assert inspect_main(["karpathy", "--json", str(tmp_path / "missing.json")]) == 1
    assert inspect_main(
        ["karpathy", "--search-dirs", str(tmp_path / "nope"), "--out-dir", str(tmp_path)]
    ) == 1
