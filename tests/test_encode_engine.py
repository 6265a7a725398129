"""Encoding engine: transport paths and device cache agree, sharding works."""

import numpy as np
import pytest

import jax

from multimodal_embedding_tpu.models.encode import (
    AsyncImageStager,
    EncodingEngine,
    stage_images,
)
from multimodal_embedding_tpu.models.registry import model_info
from multimodal_embedding_tpu.models.zoo import load_debug_model
from multimodal_embedding_tpu.parallel.mesh import get_mesh


@pytest.fixture(scope="module")
def setup():
    model = load_debug_model(model_info("OpenAI-CLIP-L"), seed=0)
    mesh = get_mesh()
    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8) for _ in range(10)
    ] + [rng.integers(0, 256, size=(80, 80, 3), dtype=np.uint8) for _ in range(9)]
    return model, mesh, images


def test_device_vs_cached_paths_agree(setup):
    model, mesh, images = setup
    eng = EncodingEngine(model, mesh, batch_size=8, transport="device")
    direct = np.asarray(eng.encode_images(images).embeddings)

    cache = stage_images(images, mesh, batch_size=8)
    cached = np.asarray(eng.encode_images_cached(cache).embeddings)
    np.testing.assert_allclose(direct, cached, rtol=1e-5, atol=1e-5)

    norms = np.linalg.norm(direct, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_streaming_stager_matches_cached(setup):
    """Overlapped staging (background thread + per-slice streaming encode)
    must produce bit-identical embeddings to the blocking staged path, and
    the assembled cache from wait() must serve later models identically."""
    model, mesh, images = setup
    eng = EncodingEngine(model, mesh, batch_size=8, transport="device")
    cache = stage_images(images, mesh, batch_size=8)
    cached = np.asarray(eng.encode_images_cached(cache).embeddings)

    stager = AsyncImageStager(images, mesh, batch_size=8)
    eng.warmup_streaming(stager)
    res = eng.encode_images_streaming(stager)
    np.testing.assert_array_equal(np.asarray(res.embeddings), cached)
    assert res.seconds > 0

    after = stager.wait()
    assert after.n_images == len(images)
    again = np.asarray(eng.encode_images_cached(after).embeddings)
    np.testing.assert_array_equal(again, cached)


def test_streaming_stager_multi_slice(setup):
    """Force multiple <=128MB slices per group by monkeypatching the slice
    planner is overkill — instead use enough images that slice_plan covers
    both geometry groups and chunk iteration order is exercised."""
    model, mesh, images = setup
    stager = AsyncImageStager(images, mesh, batch_size=8)
    chunks = list(stager.chunks())
    assert sum(c[3] for c in chunks) == len(images)
    seen = sorted(i for c in chunks for i in c[1])
    assert seen == list(range(len(images)))
    assert stager.wait().stage_seconds is not None


def test_stager_defers_cache_assembly(setup):
    """The monolithic per-geometry cache must NOT exist while model 1 is
    consuming slices — assembling it early keeps a second full copy of the
    images in HBM for model 1's whole encode (measured +4.25 GB at 5k; the
    ColPali-first full7 OOM). wait() assembles it at the model-2 handoff and
    drops the slice references."""
    model, mesh, images = setup
    stager = AsyncImageStager(images, mesh, batch_size=8)
    list(stager.chunks())  # consume fully (staging thread finishes)
    assert stager._cache is None  # no second copy during model 1
    cache = stager.wait()
    assert stager._chunks == []  # slice refs dropped after assembly
    assert cache.n_images == len(images)
    assert sum(g[3] for g in cache.groups) == len(images)
    assert stager.wait() is cache  # idempotent


def test_host_vs_device_transport_close(setup):
    """Host PIL resize vs device matmul resize differ by <=1 uint8 level per
    pixel; embeddings of a smooth model must be close."""
    model, mesh, images = setup
    dev = EncodingEngine(model, mesh, batch_size=8, transport="device")
    host = EncodingEngine(model, mesh, batch_size=8, transport="host")
    e_dev = np.asarray(dev.encode_images(images).embeddings)
    e_host = np.asarray(host.encode_images(images).embeddings)
    # cosine similarity of the two paths' embeddings
    cos = np.sum(e_dev * e_host, axis=-1)
    assert np.all(cos > 0.999), cos.min()


def test_cached_rebatching(setup):
    """Cache staged at batch 8, consumed by an engine with batch 4."""
    model, mesh, images = setup
    cache = stage_images(images, mesh, batch_size=8)
    eng8 = EncodingEngine(model, mesh, batch_size=8, transport="device")
    eng4 = EncodingEngine(model, mesh, batch_size=4, transport="device")
    e8 = np.asarray(eng8.encode_images_cached(cache).embeddings)
    e4 = np.asarray(eng4.encode_images_cached(cache).embeddings)
    np.testing.assert_allclose(e8, e4, rtol=1e-5, atol=1e-5)


def test_multivector_padded_text_batch(setup):
    """ColPali text path with a batch-padded final chunk (n % wide-batch != 0):
    embeddings AND the returned token mask must be trimmed consistently, and
    each row must equal its single-text encoding (models/encode.py pads the
    last chunk by repeating the final row)."""
    _, mesh, _ = setup
    cp = load_debug_model(model_info("ColPali-v1.3"), seed=0)
    eng = EncodingEngine(cp, mesh, batch_size=4)
    texts = [f"query with {i} words " + "pad " * (i % 3) for i in range(10)]
    out = eng.encode_texts(texts)  # wide text batch is 128 -> one padded chunk
    assert out.embeddings.shape[0] == 10
    assert out.mask is not None and out.mask.shape[0] == 10
    assert out.mask.shape[1] == out.embeddings.shape[1]  # [N, T] vs [N, T, D]
    for i in (0, 7, 9):
        single = eng.encode_texts([texts[i]])
        np.testing.assert_allclose(
            np.asarray(out.embeddings[i]), np.asarray(single.embeddings[0]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(out.mask[i]), np.asarray(single.mask[0])
        )


def test_multivector_maskless_tokenizer(setup):
    """A multi-vector model whose tokenizer yields no attention mask must
    come back with mask=None (downstream MaxSim treats all tokens valid)."""
    _, mesh, _ = setup
    cp = load_debug_model(model_info("ColPali-v1.3"), seed=0)
    base_tok = cp.tokenize
    cp.tokenize = lambda texts: (base_tok(texts)[0], None)
    eng = EncodingEngine(cp, mesh, batch_size=4)
    out = eng.encode_texts([f"maskless query {i}" for i in range(5)])
    assert out.embeddings.shape[0] == 5
    assert out.mask is None


def test_text_dispatch_chunked_matches_scan(setup):
    """The r2-era per-chunk text dispatch (kept for A/B diagnostics,
    benchmarks/ab_midsize.py) must be numerically identical to the scanned
    whole-sweep dispatch."""
    model, mesh, _ = setup
    texts = [f"caption number {i} with words" for i in range(37)]
    eng = EncodingEngine(model, mesh, batch_size=8)
    scan = np.asarray(eng.encode_texts(texts).embeddings)
    eng.text_dispatch = "chunked"
    chunked = np.asarray(eng.encode_texts(texts).embeddings)
    np.testing.assert_array_equal(scan, chunked)


def test_text_encoding_batching(setup):
    model, mesh, _ = setup
    eng = EncodingEngine(model, mesh, batch_size=8)
    texts = [f"a photo of object {i}" for i in range(19)]
    out = eng.encode_texts(texts)
    assert out.embeddings.shape[0] == 19
    # order stability: same text -> same embedding
    out2 = eng.encode_texts([texts[3]])
    np.testing.assert_allclose(
        np.asarray(out.embeddings[3]), np.asarray(out2.embeddings[0]), rtol=1e-5, atol=1e-5
    )


def test_warmup_texts_warms_the_timed_sweep(setup):
    """warmup_texts(text_sets) must warm the exact scan shapes the timed
    encode will use — the sweep's scan length nb AND padded token length are
    baked into the jit, so a generic tiny warmup does not warm it (this cost
    one full tower compile per sweep shape inside the timed phase before the
    fix; see the warmup_texts docstring for why it runs rather than
    AOT-compiles)."""
    model, mesh, _ = setup
    eng = EncodingEngine(model, mesh, batch_size=8)
    set_small = [f"a photo of object {i}" for i in range(19)]
    set_large = [f"a photo of object {i}" for i in range(300)]
    eng.warmup_texts([set_small, set_large])
    keys = [k for k in eng._pre_fns if k[0] == "texts"]
    assert len(keys) == 2
    # 300 captions at wide text batch 128 -> 3 scan steps; 19 -> 1
    assert sorted(k[1] for k in keys) == [1, 3]
    # the real encode must reuse the warmed sweeps (cache hit, no new key)
    out = eng.encode_texts(set_large)
    assert out.embeddings.shape[0] == 300
    assert len([k for k in eng._pre_fns if k[0] == "texts"]) == 2
    # and the warmed path matches a from-scratch engine bit-for-bit
    fresh = EncodingEngine(model, mesh, batch_size=8)
    ref = fresh.encode_texts(set_large)
    np.testing.assert_array_equal(np.asarray(out.embeddings), np.asarray(ref.embeddings))


def test_native_staging_kernel_equivalence(rng):
    """BOTH staging implementations run and agree: the numpy fallback and the
    C++ kernel (single- and multi-threaded paths), forced explicitly so the
    test does not silently cover only whichever path 'auto' picks on this
    host's core count."""
    from multimodal_embedding_tpu.utils.native import _load, hwc_to_chw_batch

    imgs = [rng.integers(0, 256, (37, 53, 3), dtype=np.uint8) for _ in range(5)]
    ref = np.stack([im.transpose(2, 0, 1) for im in imgs])
    np.testing.assert_array_equal(hwc_to_chw_batch(imgs, impl="numpy"), ref)

    # the toolchain is part of this environment: the kernel must build
    assert _load() is not None, "native staging kernel failed to build"
    np.testing.assert_array_equal(
        hwc_to_chw_batch(imgs, impl="native", n_threads=1), ref
    )
    np.testing.assert_array_equal(
        hwc_to_chw_batch(imgs, impl="native", n_threads=3), ref
    )


def test_sharded_batch_apply(setup):
    """Public data-parallel map utility: tail padding, multi-output pytrees."""
    import jax.numpy as jnp

    from multimodal_embedding_tpu.parallel import sharded_batch_apply

    _, mesh, _ = setup
    x = np.arange(26 * 4, dtype=np.float32).reshape(26, 4)

    def fn(a):
        return a * 2.0, jnp.sum(a, axis=-1)

    y, s = sharded_batch_apply(fn, x, mesh=mesh, batch_size=8)
    np.testing.assert_allclose(np.asarray(y), x * 2.0)
    np.testing.assert_allclose(np.asarray(s), x.sum(-1))


def test_device_cache_is_batch_sharded(setup):
    """Staged image cache arrays must actually shard over the data axis."""
    _, mesh, images = setup
    cache = stage_images(images, mesh, batch_size=8)
    for _, _, dev, _ in cache.groups:
        sharding = dev.sharding
        # batch axis (dim 1) sharded across the 8 virtual devices
        assert len(sharding.device_set) == mesh.devices.size
        spec = sharding.spec
        assert spec[1] == "data", spec


def test_streaming_empty_stager_returns_empty_result(setup):
    """Zero images through the streaming path mirrors encode_images' empty
    guard instead of raising IndexError (round-4 advisor finding)."""
    model, mesh, _ = setup
    eng = EncodingEngine(model, mesh, batch_size=8, transport="device")
    stager = AsyncImageStager([], mesh, batch_size=8)
    res = eng.encode_images_streaming(stager)
    assert res.embeddings.shape[0] == 0
    assert res.seconds == 0.0
