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
