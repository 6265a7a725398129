"""Fused residual+LN+matmul prologue kernel and the fused encoder layer.

The kernel (ops/fused_ln_matmul.py, interpret mode on CPU) must be
numerically interchangeable with the XLA sequence
``x+delta -> layer_norm -> linear -> act``; the fused encoder stack
(layers._fused_encoder_stack) must match the plain scan layer-for-layer, and
grads must flow through the custom_vjp (the GRPO trainer differentiates
through tower forwards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.ops.fused_ln_matmul import (
    _reference,
    fused_res_norm_matmul,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize(
    "m,d,n,has_delta,act,norm",
    [
        (24, 64, 96, True, None, "ln"),  # QKV-prologue shape class
        (24, 64, 96, False, None, "ln"),  # first sublayer (no residual)
        (17, 64, 48, True, "quick_gelu", "ln"),  # MLP prologue, odd rows
        (24, 64, 40, True, "gelu_pytorch_tanh", "ln"),  # odd N tail
        (16, 32, 64, True, None, "rms_gemma"),  # Gemma RMS prologue
        (16, 32, 64, False, None, "rms_gemma"),
    ],
)
def test_kernel_matches_reference(m, d, n, has_delta, act, norm):
    ks = jax.random.split(jax.random.key(0), 6)
    x = _rand(ks[0], (m, d))
    delta = _rand(ks[1], (m, d)) if has_delta else None
    gamma = _rand(ks[2], (d,)) * 0.1
    if norm == "ln":
        beta, b = _rand(ks[3], (d,)) * 0.1, _rand(ks[5], (n,)) * 0.1
    else:
        beta, b = None, None
    w = _rand(ks[4], (d, n)) * 0.1

    got = fused_res_norm_matmul(
        x, delta, gamma, beta, w, b, norm=norm, act=act, interpret=True,
        block_m=8, block_n=32,  # force multi-block grid both ways
    )
    want = _reference(x, delta, gamma, beta, w, b, norm=norm, eps=1e-5, act=act)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), atol=2e-5, rtol=2e-5)


def test_kernel_matches_layers_ops():
    """The reference twin itself equals the existing layers primitives
    (layer_norm + linear + activation) — transitively, so does the kernel."""
    from multimodal_embedding_tpu.models.layers import layer_norm, linear

    ks = jax.random.split(jax.random.key(1), 6)
    m, d, n = 12, 48, 80
    x, delta = _rand(ks[0], (m, d)), _rand(ks[1], (m, d))
    gamma, beta = _rand(ks[2], (d,)) * 0.2, _rand(ks[3], (d,)) * 0.2
    w, b = _rand(ks[4], (d, n)) * 0.1, _rand(ks[5], (n,)) * 0.1

    x_new, y = _reference(x, delta, gamma, beta, w, b, norm="ln", eps=1e-5, act=None)
    want_xn = x + delta
    want_y = linear({"w": w, "b": b}, layer_norm({"scale": gamma, "bias": beta}, want_xn))
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(want_xn), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y), atol=1e-6, rtol=1e-6)


def test_kernel_rms_matches_gemma_norm():
    from multimodal_embedding_tpu.models.gemma import rms_norm

    ks = jax.random.split(jax.random.key(2), 3)
    m, d, n = 8, 32, 32
    x = _rand(ks[0], (m, d))
    gamma = _rand(ks[1], (d,)) * 0.1
    w = jnp.eye(d)  # identity projection isolates the norm
    _, y = fused_res_norm_matmul(
        x, None, gamma, None, w, None, norm="rms_gemma", eps=1e-6, interpret=True
    )
    want = rms_norm(gamma, x, 1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-6, rtol=2e-6)


def test_kernel_batched_input_shape():
    ks = jax.random.split(jax.random.key(3), 4)
    b, t, d, n = 2, 9, 64, 32
    x, delta = _rand(ks[0], (b, t, d)), _rand(ks[1], (b, t, d))
    gamma, beta = jnp.ones((d,)), jnp.zeros((d,))
    w = _rand(ks[2], (d, n)) * 0.1
    bias = _rand(ks[3], (n,)) * 0.1
    xn, y = fused_res_norm_matmul(x, delta, gamma, beta, w, bias, interpret=True)
    assert xn.shape == (b, t, d) and y.shape == (b, t, n)
    want = _reference(x, delta, gamma, beta, w, bias, norm="ln", eps=1e-5, act=None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want[1]), atol=2e-5, rtol=2e-5)


def test_kernel_grads_match_reference():
    ks = jax.random.split(jax.random.key(4), 6)
    m, d, n = 16, 64, 32
    x, delta = _rand(ks[0], (m, d)), _rand(ks[1], (m, d))
    gamma, beta = _rand(ks[2], (d,)) * 0.1, _rand(ks[3], (d,)) * 0.1
    w, b = _rand(ks[4], (d, n)) * 0.1, _rand(ks[5], (n,)) * 0.1

    def loss_fused(x_, delta_, gamma_, w_):
        xn, y = fused_res_norm_matmul(
            x_, delta_, gamma_, beta, w_, b, act="quick_gelu", interpret=True
        )
        return jnp.sum(xn * xn) + jnp.sum(y * y)

    def loss_ref(x_, delta_, gamma_, w_):
        xn, y = _reference(x_, delta_, gamma_, beta, w_, b, norm="ln", eps=1e-5, act="quick_gelu")
        return jnp.sum(xn * xn) + jnp.sum(y * y)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, delta, gamma, w)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, delta, gamma, w)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-5, rtol=5e-5)


# --- fused encoder stack ------------------------------------------------------


@pytest.fixture
def fused_layers():
    prev = layers._LAYER_IMPL
    layers.set_layer_impl("fused")
    yield
    layers.set_layer_impl(prev)


def _stack_params(key, n_layers, dim, mlp_dim):
    return layers.encoder_stack_init(key, n_layers, dim, mlp_dim)


@pytest.mark.parametrize("causal,masked", [(False, False), (True, True), (False, True)])
def test_fused_encoder_stack_matches_xla(fused_layers, causal, masked):
    dim, heads, mlp, t, bsz = 64, 4, 96, 13, 3
    stacked = _stack_params(jax.random.key(5), 3, dim, mlp)
    x = _rand(jax.random.key(6), (bsz, t, dim))
    mask = None
    if masked:
        mask = jnp.array([[True] * t, [True] * (t - 4) + [False] * 4, [True] * t])

    got = layers.encoder_stack(stacked, x, heads, "quick_gelu", causal=causal, mask=mask)
    layers.set_layer_impl("xla")
    want = layers.encoder_stack(stacked, x, heads, "quick_gelu", causal=causal, mask=mask)
    layers.set_layer_impl("fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)


def test_fused_encoder_stack_with_pallas_attention(fused_layers):
    """Fused prologue + the stacked-QKV attention kernel end to end (the
    production TPU configuration) vs the plain XLA scan."""
    prev = layers._ATTENTION_IMPL
    try:
        dim, heads, mlp, t, bsz = 128, 2, 192, 21, 2  # dh=64 -> packed kernel
        stacked = _stack_params(jax.random.key(7), 2, dim, mlp)
        x = _rand(jax.random.key(8), (bsz, t, dim))
        mask = jnp.array([[True] * t, [True] * (t - 6) + [False] * 6])

        layers.set_attention_impl("pallas")
        got = layers.encoder_stack(stacked, x, heads, "gelu", mask=mask)

        layers.set_attention_impl("xla")
        layers.set_layer_impl("xla")
        want = layers.encoder_stack(stacked, x, heads, "gelu", mask=mask)
        layers.set_layer_impl("fused")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    finally:
        layers.set_attention_impl(prev)


def test_fused_stack_grads_match_xla(fused_layers):
    dim, heads, mlp, t, bsz = 64, 4, 96, 9, 2
    stacked = _stack_params(jax.random.key(9), 2, dim, mlp)
    x = _rand(jax.random.key(10), (bsz, t, dim))

    def loss(params, impl):
        layers.set_layer_impl(impl)
        out = layers.encoder_stack(params, x, heads, "quick_gelu")
        return jnp.sum(out * out)

    got = jax.grad(lambda p: loss(p, "fused"))(stacked)
    want = jax.grad(lambda p: loss(p, "xla"))(stacked)
    flat_g, flat_w = jax.tree.leaves(got), jax.tree.leaves(want)
    for gg, ww in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=1e-4, rtol=1e-4)


def test_vision_tower_fused_matches_xla(fused_layers):
    """Whole-tower integration: the CLIP-style vision tower through the fused
    stack equals the XLA stack (CLS pooling + projection downstream)."""
    from multimodal_embedding_tpu.models.towers import vision_tower_apply, vision_tower_init
    from multimodal_embedding_tpu.models.zoo import debug_dual_config

    cfg = debug_dual_config("dense").vision
    params = vision_tower_init(jax.random.key(11), cfg)
    px = _rand(jax.random.key(12), (2, cfg.image_size, cfg.image_size, 3))

    got = vision_tower_apply(params, cfg, px)
    layers.set_layer_impl("xla")
    want = vision_tower_apply(params, cfg, px)
    layers.set_layer_impl("fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5)


def test_layer_impl_auto_resolution():
    """auto resolves to xla on every backend (the fused prologue measured
    SLOWER in-context on TPU — PERF.md round 3); fused is an explicit
    opt-in."""
    prev = layers._LAYER_IMPL
    try:
        layers.set_layer_impl("auto")
        assert layers.get_layer_impl() == "xla"
        layers.set_layer_impl("fused")
        assert layers.get_layer_impl() == "fused"
    finally:
        layers.set_layer_impl(prev)
