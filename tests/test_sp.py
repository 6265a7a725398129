"""Sequence-parallel attention (parallel/sp.py) vs the unsharded SDPA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embedding_tpu.parallel.mesh import get_mesh
from multimodal_embedding_tpu.parallel.sp import sp_attention, sp_shardings

NEG_INF = -1e30


def _ref_attention(q, k, v, key_mask=None, causal=False):
    b, h, t, dh = q.shape
    kvh = k.shape[1]
    g = h // kvh
    qg = q.reshape(b, kvh, g, t, dh)
    logits = jnp.einsum("bkgqd,bkKd->bkgqK", qg, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(dh))
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, None, :], logits, NEG_INF)
    if causal:
        cm = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(cm[None, None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgqK,bkKd->bkgqd", attn, v, preferred_element_type=jnp.float32)
    return out.reshape(b, h, t, dh).astype(q.dtype)


def _qkv(b=2, h=4, kvh=4, t=64, dh=16, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, h, t, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, kvh, t, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, kvh, t, dh), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_sp_attention_matches_reference(causal):
    mesh = get_mesh(n_data=1, n_model=8)
    q, k, v = _qkv()
    want = _ref_attention(q, k, v, causal=causal)

    act_sh, _ = sp_shardings(mesh)
    qs, ks, vs = (jax.device_put(x, act_sh) for x in (q, k, v))
    got = sp_attention(qs, ks, vs, mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sp_attention_key_mask_and_gqa():
    mesh = get_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(h=4, kvh=2)
    mask = jnp.arange(64)[None, :] < jnp.asarray([64, 40])[:, None]
    want = _ref_attention(q, k, v, key_mask=mask, causal=True)

    act_sh, mask_sh = sp_shardings(mesh)
    got = sp_attention(
        jax.device_put(q, act_sh),
        jax.device_put(k, act_sh),
        jax.device_put(v, act_sh),
        mesh,
        key_mask=jax.device_put(mask, mask_sh),
        causal=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sp_attention_output_stays_sequence_sharded():
    mesh = get_mesh(n_data=1, n_model=8)
    q, k, v = _qkv()
    act_sh, _ = sp_shardings(mesh)
    out = sp_attention(
        jax.device_put(q, act_sh), jax.device_put(k, act_sh), jax.device_put(v, act_sh), mesh
    )
    assert out.sharding.spec == act_sh.spec


def test_colpali_gemma_sp_end_to_end_matches_unsharded():
    """Sequence parallelism consumed by the real model path: the ColPali
    image/text forwards (Gemma prefix-LM over image-patch + suffix tokens)
    with the token dim sharded over 8 devices must reproduce the unsharded
    multi-vector embeddings exactly."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_embedding_tpu.models import layers
    from multimodal_embedding_tpu.models.colpali import colpali_image_fwd, colpali_text_fwd
    from multimodal_embedding_tpu.models.registry import model_info
    from multimodal_embedding_tpu.models.zoo import load_debug_model
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    cp = load_debug_model(model_info("ColPali-v1.3"), seed=0)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)  # 4 patches + 4 suffix = 8 tokens
    ids, qmask = cp.tokenize(["a small query", "another query with more words"])
    ids, qmask = jnp.asarray(ids), jnp.asarray(qmask)

    assert layers.get_sp_mesh() is None
    want_img = np.asarray(colpali_image_fwd(cp.params, cp.cfg, px))
    want_txt = np.asarray(colpali_text_fwd(cp.params, cp.cfg, ids, qmask))

    mesh = get_mesh(n_data=1, n_model=8)
    layers.set_sp_mesh(mesh)
    try:
        rep = NamedSharding(mesh, P())
        with mesh:
            got_img = np.asarray(
                jax.jit(lambda p, x: colpali_image_fwd(p, cp.cfg, x))(
                    jax.device_put(cp.params, rep), jax.device_put(px, rep)
                )
            )
            got_txt = np.asarray(
                jax.jit(lambda p, i, m: colpali_text_fwd(p, cp.cfg, i, m))(
                    jax.device_put(cp.params, rep),
                    jax.device_put(ids, rep), jax.device_put(qmask, rep),
                )
            )
    finally:
        layers.set_sp_mesh(None)

    # not strictly bit-for-bit: the sharded local attention contracts via a
    # differently-shaped einsum than the unsharded grouped-query path, so
    # XLA's per-element dot ordering can differ at the last ulp; everything
    # else (projections, norms, MLPs) is token-local and exact
    np.testing.assert_allclose(got_img, want_img, atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(got_txt, want_txt, atol=3e-5, rtol=3e-5)


def test_sp_mesh_skips_indivisible_sequences():
    """Sequences that don't divide the model axis fall through to the
    single-chip attention paths (no shard_map assert)."""
    import numpy as np

    from multimodal_embedding_tpu.models import layers
    from multimodal_embedding_tpu.models.gemma import GemmaConfig, gemma_apply, gemma_init
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    cfg = GemmaConfig(vocab_size=64, dim=32, layers=2, heads=4, kv_heads=1, head_dim=8, mlp_dim=64)
    params = gemma_init(jax.random.key(5), cfg)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 11, cfg.dim)), jnp.float32)  # 11 % 8 != 0
    want = np.asarray(gemma_apply(params, cfg, x))
    layers.set_sp_mesh(get_mesh(n_data=1, n_model=8))
    try:
        got = np.asarray(gemma_apply(params, cfg, x))
    finally:
        layers.set_sp_mesh(None)
    np.testing.assert_array_equal(got, want)
