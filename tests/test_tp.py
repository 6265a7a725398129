"""Tensor parallelism (model-axis param sharding) on the virtual CPU mesh.

Megatron-style column/row splits are pure sharding annotations — the forward
functions are unchanged and GSPMD derives the collectives. These tests prove
(a) the specs land where intended, (b) TP(+DP) outputs match the unsharded
forward, for both the dual-encoder towers and the Gemma decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_embedding_tpu.models.gemma import GemmaConfig, gemma_apply, gemma_init
from multimodal_embedding_tpu.models.towers import dual_encoder_init, encode_image, encode_text
from multimodal_embedding_tpu.models.zoo import debug_dual_config
from multimodal_embedding_tpu.parallel.mesh import get_mesh
from multimodal_embedding_tpu.parallel.tp import shard_params_tp, tp_specs


def test_tp_specs_place_column_and_row_splits():
    cfg = debug_dual_config("dense")
    params = dual_encoder_init(jax.random.key(0), cfg)
    specs = tp_specs(params, n_model=4)
    enc = specs["vision"]["encoder"]
    assert enc["attn"]["q"]["w"] == P(None, None, "model")
    assert enc["attn"]["q"]["b"] == P(None, "model")
    assert enc["attn"]["o"]["w"] == P(None, "model", None)
    assert enc["attn"]["o"]["b"] == P()
    assert enc["mlp"]["fc1"]["w"] == P(None, None, "model")
    assert enc["mlp"]["fc2"]["w"] == P(None, "model", None)
    assert specs["vision"]["pos"] == P()
    assert specs["text"]["tok"] == P()


def test_tp_specs_fall_back_to_replication_on_indivisible_dims():
    cfg = debug_dual_config("dense")
    params = dual_encoder_init(jax.random.key(0), cfg)
    # debug dims are 32/48-wide: a 7-way split divides nothing
    specs = tp_specs(params, n_model=7)
    flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in flat)


def test_tp_gemma_specs():
    cfg = GemmaConfig(vocab_size=64, dim=32, layers=2, heads=4, kv_heads=1, head_dim=8, mlp_dim=64)
    params = gemma_init(jax.random.key(0), cfg)
    specs = tp_specs(params, n_model=4)
    lay = specs["layers"]
    assert lay["attn"]["q"] == P(None, None, "model")
    assert lay["attn"]["o"] == P(None, "model", None)
    assert lay["mlp"]["gate"] == P(None, None, "model")
    assert lay["mlp"]["up"] == P(None, None, "model")
    assert lay["mlp"]["down"] == P(None, "model", None)
    assert specs["embed"] == P()


def test_tp_dual_encoder_matches_unsharded():
    cfg = debug_dual_config("dense")
    params = dual_encoder_init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    n = 8
    px = jnp.asarray(rng.normal(size=(n, cfg.vision.image_size, cfg.vision.image_size, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, cfg.text.vocab_size, (n, cfg.text.max_len)), jnp.int32)

    want_img = np.asarray(encode_image(params, cfg, px))
    want_txt = np.asarray(encode_text(params, cfg, ids))

    mesh = get_mesh(n_data=2, n_model=4)
    sharded = shard_params_tp(params, mesh)
    q = sharded["vision"]["encoder"]["attn"]["q"]["w"]
    assert q.sharding.spec == P(None, None, "model")

    batch = NamedSharding(mesh, P("data"))
    with mesh:
        got_img = np.asarray(
            jax.jit(lambda p, x: encode_image(p, cfg, x))(sharded, jax.device_put(px, batch))
        )
        got_txt = np.asarray(
            jax.jit(lambda p, x: encode_text(p, cfg, x))(sharded, jax.device_put(ids, batch))
        )
    np.testing.assert_allclose(got_img, want_img, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got_txt, want_txt, atol=2e-5, rtol=2e-5)


def test_tp_gemma_matches_unsharded():
    cfg = GemmaConfig(
        vocab_size=64, dim=32, layers=2, heads=4, kv_heads=1, head_dim=8, mlp_dim=64
    )
    params = gemma_init(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 9, cfg.dim)), jnp.float32)
    mask = jnp.ones((4, 9), jnp.int32)

    want = np.asarray(gemma_apply(params, cfg, x, mask))

    mesh = get_mesh(n_data=2, n_model=4)
    sharded = shard_params_tp(params, mesh)
    batch = NamedSharding(mesh, P("data"))
    with mesh:
        got = np.asarray(
            jax.jit(lambda p, e, m: gemma_apply(p, cfg, e, m))(
                sharded, jax.device_put(x, batch), jax.device_put(mask, batch)
            )
        )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_get_mesh_rejects_oversized_model_axis():
    """--tensor-parallel beyond the device count must fail with a clear
    error, not a 0-sized data axis and a downstream ZeroDivisionError."""
    import pytest

    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    devices = jax.devices()[:1]
    with pytest.raises(ValueError, match="tensor-parallel"):
        get_mesh(n_model=2, devices=devices)
    with pytest.raises(ValueError, match="devices"):
        get_mesh(n_data=4, n_model=1, devices=devices[:1] * 1)


def test_tp_packed_attention_kernel_matches_unsharded():
    """The fused packed-layout attention kernel composes with TP: shard_map
    runs one per-chip kernel on each column-split head shard; the result
    matches the unsharded kernel and the XLA SDPA."""
    from multimodal_embedding_tpu.models import layers

    b, t, heads, dh = 4, 9, 8, 64
    d = heads * dh
    ks = jax.random.split(jax.random.key(21), 4)
    qf, kf, vf = (jax.random.normal(k, (b, t, d)) for k in ks[:3])
    mask = jnp.asarray(np.random.default_rng(0).random((b, t)) < 0.8).at[:, 0].set(True)

    prev_impl, prev_mesh = layers._ATTENTION_IMPL, layers._TP_MESH
    try:
        layers.set_attention_impl("pallas")
        layers.set_tp_mesh(None)
        want_kernel = np.asarray(layers.attention_core(qf, kf, vf, heads, mask=mask))
        layers.set_attention_impl("xla")
        want_xla = np.asarray(layers.attention_core(qf, kf, vf, heads, mask=mask))

        mesh = get_mesh(n_data=2, n_model=4)
        layers.set_attention_impl("pallas")
        layers.set_tp_mesh(mesh)
        col = NamedSharding(mesh, P("data", None, "model"))
        row = NamedSharding(mesh, P("data", None))
        with mesh:
            got = np.asarray(
                layers.attention_core(
                    jax.device_put(qf, col), jax.device_put(kf, col),
                    jax.device_put(vf, col), heads,
                    mask=jax.device_put(mask, row),
                )
            )
    finally:
        layers.set_attention_impl(prev_impl)
        layers.set_tp_mesh(prev_mesh)

    np.testing.assert_allclose(got, want_kernel, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got, want_xla, atol=2e-5, rtol=2e-5)


def test_tp_encoder_with_pallas_impl_matches_replicated():
    """Full encoder stack under TP with --attention-impl pallas: the kernel
    no longer falls back — sharded output equals the replicated forward."""
    from multimodal_embedding_tpu.models import layers
    from multimodal_embedding_tpu.models.layers import encoder_stack, encoder_stack_init

    dim, heads, mlp, t, bsz = 512, 8, 256, 17, 4
    stacked = encoder_stack_init(jax.random.key(22), 2, dim, mlp)
    x = jax.random.normal(jax.random.key(23), (bsz, t, dim))

    prev_impl, prev_mesh = layers._ATTENTION_IMPL, layers._TP_MESH
    try:
        layers.set_attention_impl("pallas")
        layers.set_tp_mesh(None)
        want = np.asarray(encoder_stack(stacked, x, heads, "gelu"))

        mesh = get_mesh(n_data=2, n_model=4)
        layers.set_tp_mesh(mesh)
        sharded = shard_params_tp(stacked, mesh)
        batch = NamedSharding(mesh, P("data"))
        with mesh:
            got = np.asarray(
                jax.jit(lambda p, h: encoder_stack(p, h, heads, "gelu"))(
                    sharded, jax.device_put(x, batch)
                )
            )
    finally:
        layers.set_attention_impl(prev_impl)
        layers.set_tp_mesh(prev_mesh)

    np.testing.assert_allclose(got, want, atol=5e-5, rtol=5e-5)


def test_tp_unfriendly_heads_fall_back_cleanly():
    """Head counts that do not split over the model axis (or leave a
    non-group-aligned local shard) must run the partition-friendly
    xla_bf16 path rather than fail."""
    from multimodal_embedding_tpu.models import layers

    b, t, heads, dh = 4, 7, 6, 64  # 6 heads % 4 chips != 0
    d = heads * dh
    ks = jax.random.split(jax.random.key(24), 3)
    qf, kf, vf = (jax.random.normal(k, (b, t, d)) for k in ks)

    prev_impl, prev_mesh = layers._ATTENTION_IMPL, layers._TP_MESH
    try:
        layers.set_attention_impl("xla")
        want = np.asarray(layers.attention_core(qf, kf, vf, heads))
        mesh = get_mesh(n_data=2, n_model=4)
        layers.set_attention_impl("pallas")
        layers.set_tp_mesh(mesh)
        with mesh:
            got = np.asarray(layers.attention_core(qf, kf, vf, heads))
    finally:
        layers.set_attention_impl(prev_impl)
        layers.set_tp_mesh(prev_mesh)
    # bf16-logit numerics vs f32: loose tolerance on CPU (bf16 emulation)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
