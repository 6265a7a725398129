"""Fused attention kernel (interpret mode on CPU) vs the XLA SDPA paths.

The kernel must be numerically interchangeable with the default "xla"
implementation (f32 QK^T + f32 softmax + bf16 PV): these tests drive it
through the raw op, through ``layers.mha`` and through the Gemma decoder
(MQA + prefix-LM / causal masking), on odd (pad-exercising) shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.ops.attention_pallas import fused_attention


def _sdpa_ref(q, k, v, key_mask=None, causal=False, sm_scale=None):
    """Straight-line einsum reference. q [B,H,Tq,Dh], k/v [B,KVH,Tk,Dh]."""
    b, h, tq, dh = q.shape
    _, kvh, tk, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(dh)
    k = jnp.repeat(k, h // kvh, axis=1)
    v = jnp.repeat(v, h // kvh, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    valid = jnp.ones((b, 1, tq, tk), bool)
    if key_mask is not None:
        valid &= key_mask[:, None, None, :].astype(bool)
    if causal:
        valid &= jnp.tril(jnp.ones((tq, tk), bool))[None, None]
    logits = jnp.where(valid, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize(
    "b,h,kvh,tq,tk,dh,causal,masked",
    [
        (2, 4, 4, 37, 37, 64, False, False),  # ViT-like odd seq, pad both dims
        (2, 4, 4, 37, 37, 64, False, True),  # key-validity mask
        (1, 4, 4, 33, 33, 64, True, True),  # causal + mask (decoder prefill)
        (2, 8, 1, 29, 29, 32, False, True),  # Gemma MQA prefix-LM
        (2, 8, 2, 19, 19, 32, True, False),  # grouped-query causal
        (2, 2, 2, 9, 41, 16, False, True),  # cross attention (Tq != Tk)
        (1, 2, 2, 200, 200, 64, False, False),  # multi-q-block path
    ],
)
def test_fused_attention_matches_reference(b, h, kvh, tq, tk, dh, causal, masked):
    ks = jax.random.split(jax.random.key(0), 4)
    q = _rand(ks[0], (b, h, tq, dh))
    k = _rand(ks[1], (b, kvh, tk, dh))
    v = _rand(ks[2], (b, kvh, tk, dh))
    key_mask = None
    if masked:
        key_mask = jax.random.bernoulli(ks[3], 0.8, (b, tk))
        key_mask = key_mask.at[:, 0].set(True)  # keep every row attendable

    # force the multi-block query path on the long case
    block_q = 64 if tq >= 200 else None
    got = fused_attention(
        q, k, v, key_mask=key_mask, causal=causal, block_q=block_q, interpret=True
    )
    want = _sdpa_ref(q, k, v, key_mask=key_mask, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_attention_bf16_matches_xla_numerics():
    """bf16 q/k/v: kernel casts probabilities to bf16 before PV exactly like
    the XLA path — results should agree to bf16 resolution."""
    ks = jax.random.split(jax.random.key(1), 3)
    q = _rand(ks[0], (2, 4, 37, 64), jnp.bfloat16)
    k = _rand(ks[1], (2, 4, 37, 64), jnp.bfloat16)
    v = _rand(ks[2], (2, 4, 37, 64), jnp.bfloat16)
    got = fused_attention(q, k, v, interpret=True).astype(jnp.float32)
    want = _sdpa_ref(q, k, v).astype(jnp.float32)
    assert got.dtype == jnp.float32 and want.shape == got.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)


@pytest.fixture
def pallas_impl():
    prev = layers._ATTENTION_IMPL
    layers.set_attention_impl("pallas")
    yield
    layers.set_attention_impl(prev)


def test_mha_pallas_impl_matches_xla(pallas_impl):
    from multimodal_embedding_tpu.models.layers import linear_init, mha

    key = jax.random.key(2)
    d, heads, t, bsz = 48, 4, 21, 3
    ks = jax.random.split(key, 5)
    p = {n: linear_init(k, d, d) for n, k in zip("qkvo", ks[:4])}
    x = _rand(ks[4], (bsz, t, d))
    mask = jnp.array([[True] * t, [True] * (t - 5) + [False] * 5, [True] * t])

    got = mha(p, x, heads, mask=mask)
    layers.set_attention_impl("xla")
    want = mha(p, x, heads, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    layers.set_attention_impl("pallas")
    got_c = mha(p, x, heads, causal=True)
    layers.set_attention_impl("xla")
    want_c = mha(p, x, heads, causal=True)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), atol=2e-5, rtol=2e-5)


def test_gemma_pallas_impl_matches_xla(pallas_impl):
    from multimodal_embedding_tpu.models.gemma import GemmaConfig, gemma_apply, gemma_init

    cfg = GemmaConfig(
        vocab_size=64, dim=32, layers=2, heads=4, kv_heads=1, head_dim=8, mlp_dim=64
    )
    params = gemma_init(jax.random.key(3), cfg)
    x = _rand(jax.random.key(4), (2, 11, cfg.dim))
    attn_mask = jnp.array([[0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1], [1] * 11], jnp.int32)

    for causal in (False, True):
        got = gemma_apply(params, cfg, x, attn_mask, causal=causal)
        layers.set_attention_impl("xla")
        want = gemma_apply(params, cfg, x, attn_mask, causal=causal)
        layers.set_attention_impl("pallas")
        # pad-query rows are garbage in both impls (kernel: zero attention;
        # XLA: uniform average) — every consumer masks them; compare valid rows
        valid = np.asarray(attn_mask, bool)
        np.testing.assert_allclose(
            np.asarray(got)[valid], np.asarray(want)[valid], atol=3e-5, rtol=3e-5
        )


def test_auto_impl_resolves_by_backend():
    """"auto" (the default) takes the Pallas kernel on TPU and the
    max-parity f32 XLA path elsewhere; explicit impls pass through."""
    prev = layers._ATTENTION_IMPL
    try:
        layers.set_attention_impl("auto")
        # conftest forces the CPU backend for the whole test session
        assert layers.get_attention_impl() == (
            "pallas" if jax.default_backend() == "tpu" else "xla"
        )
        layers.set_attention_impl("xla_bf16")
        assert layers.get_attention_impl() == "xla_bf16"
    finally:
        layers.set_attention_impl(prev)


@pytest.mark.parametrize(
    "b,h,kvh,tq,tk,dh,causal,masked",
    [
        (2, 8, 1, 19, 19, 128, True, True),  # Gemma-style MQA prefix/causal
        (2, 8, 2, 19, 19, 128, True, False),  # grouped-query causal
        (1, 4, 1, 33, 33, 256, False, True),  # MQA, 2 lane tiles per head
    ],
)
def test_fused_attention_packed_gqa(b, h, kvh, tq, tk, dh, causal, masked):
    """Packed layout with grouped-query/multi-query attention (Dh >= 128)
    matches the reference — the Gemma decoder configuration."""
    ks = jax.random.split(jax.random.key(7), 4)
    q = _rand(ks[0], (b, h, tq, dh))
    k = _rand(ks[1], (b, kvh, tk, dh))
    v = _rand(ks[2], (b, kvh, tk, dh))
    key_mask = None
    if masked:
        key_mask = jax.random.bernoulli(ks[3], 0.8, (b, tk))
        key_mask = key_mask.at[:, 0].set(True)

    want = _sdpa_ref(q, k, v, key_mask=key_mask, causal=causal)

    def pack(x):  # [B,H,T,Dh] -> [B,T,H*Dh]
        bb, hh, tt, dd = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(bb, tt, hh * dd)

    got = fused_attention(
        pack(q), pack(k), pack(v),
        key_mask=key_mask, causal=causal, interpret=True,
        layout="packed", num_heads=h, num_kv_heads=kvh,
    )
    got = jnp.swapaxes(got.reshape(b, tq, h, dh), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize(
    "b,h,tq,tk,dh,causal,masked",
    [
        (2, 4, 37, 37, 64, False, False),  # 2 heads per 128-lane block
        (2, 4, 37, 37, 64, False, True),
        (1, 4, 33, 33, 64, True, True),
        (2, 8, 19, 19, 32, True, False),  # 4 heads per block
        (2, 2, 9, 41, 64, False, True),  # cross attention
        (1, 2, 21, 21, 128, False, False),  # 1 head per block
        (1, 8, 19, 19, 80, False, True),  # ViT-H head dim: 8 heads / 640 lanes
        (1, 16, 9, 17, 72, False, False),  # SigLIP head dim: 16 heads / 1152 lanes
    ],
)
def test_fused_attention_packed_layout(b, h, tq, tk, dh, causal, masked):
    """The packed [B, T, H*Dh] layout (raw projection output) matches the
    reference on every masking mode."""
    ks = jax.random.split(jax.random.key(11), 4)
    q = _rand(ks[0], (b, h, tq, dh))
    k = _rand(ks[1], (b, h, tk, dh))
    v = _rand(ks[2], (b, h, tk, dh))
    key_mask = None
    if masked:
        key_mask = jax.random.bernoulli(ks[3], 0.8, (b, tk))
        key_mask = key_mask.at[:, 0].set(True)

    want = _sdpa_ref(q, k, v, key_mask=key_mask, causal=causal)

    def pack(x):  # [B,H,T,Dh] -> [B,T,H*Dh]
        bb, hh, tt, dd = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(bb, tt, hh * dd)

    got = fused_attention(
        pack(q), pack(k), pack(v),
        key_mask=key_mask, causal=causal, interpret=True,
        layout="packed", num_heads=h,
    )
    got = jnp.swapaxes(got.reshape(b, tq, h, dh), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal,masked", [(True, False), (True, True), (False, True)])
def test_fused_attention_packed_multi_q_block(causal, masked):
    """Packed layout with block_q < Tq (the production Gemma @1030 shape
    resolves to ~2 q-blocks with causal row offsets via program_id) — the
    combination of head-group lane slicing and multi-block causal masking."""
    b, h, tq, tk, dh = 1, 2, 200, 200, 64
    ks = jax.random.split(jax.random.key(17), 4)
    q = _rand(ks[0], (b, h, tq, dh))
    k = _rand(ks[1], (b, h, tk, dh))
    v = _rand(ks[2], (b, h, tk, dh))
    key_mask = None
    if masked:
        key_mask = jax.random.bernoulli(ks[3], 0.8, (b, tk)).at[:, 0].set(True)

    want = _sdpa_ref(q, k, v, key_mask=key_mask, causal=causal)

    def pack(x):
        bb, hh, tt, dd = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(bb, tt, hh * dd)

    got = fused_attention(
        pack(q), pack(k), pack(v),
        key_mask=key_mask, causal=causal, block_q=64, interpret=True,
        layout="packed", num_heads=h,
    )
    got = jnp.swapaxes(got.reshape(b, tq, h, dh), 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_mha_packed_path_matches_xla(pallas_impl):
    """d=128/heads=2 (dh=64) qualifies for the packed kernel path inside
    mha; result must match the XLA SDPA."""
    from multimodal_embedding_tpu.models.layers import linear_init, mha

    d, heads, t, bsz = 128, 2, 23, 2
    ks = jax.random.split(jax.random.key(5), 5)
    p = {n: linear_init(k, d, d) for n, k in zip("qkvo", ks[:4])}
    x = _rand(ks[4], (bsz, t, d))
    mask = jnp.array([[True] * t, [True] * (t - 7) + [False] * 7])

    got = mha(p, x, heads, mask=mask)
    layers.set_attention_impl("xla")
    want = mha(p, x, heads, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_gemma_pallas_packed_branch_matches_xla(pallas_impl):
    """head_dim 128 routes the Gemma decoder through the packed-layout
    kernel branch (the real PaliGemma config is head_dim 256)."""
    from multimodal_embedding_tpu.models.gemma import GemmaConfig, gemma_apply, gemma_init

    cfg = GemmaConfig(
        vocab_size=64, dim=32, layers=2, heads=2, kv_heads=1, head_dim=128, mlp_dim=64
    )
    params = gemma_init(jax.random.key(9), cfg)
    x = _rand(jax.random.key(10), (2, 11, cfg.dim))
    attn_mask = jnp.array([[0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1], [1] * 11], jnp.int32)

    for causal in (False, True):
        got = gemma_apply(params, cfg, x, attn_mask, causal=causal)
        layers.set_attention_impl("xla")
        want = gemma_apply(params, cfg, x, attn_mask, causal=causal)
        layers.set_attention_impl("pallas")
        valid = np.asarray(attn_mask, bool)
        np.testing.assert_allclose(
            np.asarray(got)[valid], np.asarray(want)[valid], atol=2e-4, rtol=2e-4
        )


def test_attention_impl_for_shape_dispatch(monkeypatch):
    """The measured crossover table: kernel at long seq (or medium seq with
    a lane-clean head dim), bf16-logit SDPA for lane-unfriendly head dims
    at any shorter length, f32 SDPA for lane-clean short sequences."""
    prev = layers._ATTENTION_IMPL
    try:
        layers.set_attention_impl("auto")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert layers.attention_impl_for(64, 577) == "pallas"  # ViT-L
        assert layers.attention_impl_for(72, 729) == "pallas"  # SigLIP
        assert layers.attention_impl_for(256, 1030) == "pallas"  # Gemma
        assert layers.attention_impl_for(80, 257) == "xla_bf16"  # ViT-H
        assert layers.attention_impl_for(64, 77) == "xla"  # CLIP/LAION text
        assert layers.attention_impl_for(72, 64) == "xla_bf16"  # SigLIP text
        assert layers.attention_impl_for(64, 64) == "xla"  # lane-clean short
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert layers.attention_impl_for(64, 577) == "xla"
        layers.set_attention_impl("pallas")  # explicit choice passes through
        assert layers.attention_impl_for(80, 257) == "pallas"
    finally:
        layers.set_attention_impl(prev)


@pytest.mark.parametrize(
    "layout,causal,masked",
    [("bhtd", False, False), ("bhtd", True, True), ("packed", False, True), ("packed", True, False)],
)
def test_fused_attention_grads_match_xla(layout, causal, masked):
    """The kernel's custom_vjp (XLA-recompute backward) produces the same
    q/k/v gradients as differentiating the plain SDPA — the GRPO trainer
    differentiates through the fused forward."""
    b, h, t, dh = 2, 4, 21, 64
    ks = jax.random.split(jax.random.key(13), 4)
    q = _rand(ks[0], (b, h, t, dh))
    k = _rand(ks[1], (b, h, t, dh))
    v = _rand(ks[2], (b, h, t, dh))
    key_mask = None
    if masked:
        key_mask = jax.random.bernoulli(ks[3], 0.8, (b, t)).at[:, 0].set(True)

    def pack(x):
        bb, hh, tt, dd = x.shape
        return jnp.swapaxes(x, 1, 2).reshape(bb, tt, hh * dd)

    if layout == "packed":
        def loss_fused(q_, k_, v_):
            o = fused_attention(
                pack(q_), pack(k_), pack(v_), key_mask=key_mask, causal=causal,
                interpret=True, layout="packed", num_heads=h,
            )
            return jnp.sum(o * o)
    else:
        def loss_fused(q_, k_, v_):
            o = fused_attention(q_, k_, v_, key_mask=key_mask, causal=causal, interpret=True)
            return jnp.sum(o * o)

    def loss_ref(q_, k_, v_):
        o = _sdpa_ref(q_, k_, v_, key_mask=key_mask, causal=causal)
        return jnp.sum(o * o)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-4, rtol=5e-4)
