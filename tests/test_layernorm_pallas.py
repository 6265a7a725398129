"""Row-blocked Pallas LayerNorm vs the XLA implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embedding_tpu.models import layers
from multimodal_embedding_tpu.ops.layernorm_pallas import fused_layer_norm


def _ref(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def test_fused_layer_norm_matches_xla():
    ks = jax.random.split(jax.random.key(0), 3)
    for shape, dtype in [((3, 37, 256), jnp.float32), ((530, 128), jnp.bfloat16)]:
        x = jax.random.normal(ks[0], shape, dtype)
        g = jax.random.normal(ks[1], (shape[-1],), jnp.float32)
        b = jax.random.normal(ks[2], (shape[-1],), jnp.float32)
        got = fused_layer_norm(x, g, b, interpret=True).astype(jnp.float32)
        want = _ref(x, g, b).astype(jnp.float32)
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=tol, rtol=tol)


def test_fused_layer_norm_grads_match_xla():
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (2, 21, 256))
    g = jax.random.normal(ks[1], (256,))
    b = jax.random.normal(ks[2], (256,))

    def loss_fused(x_, g_, b_):
        o = fused_layer_norm(x_, g_, b_, interpret=True)
        return jnp.sum(o * o)

    def loss_ref(x_, g_, b_):
        o = _ref(x_, g_, b_)
        return jnp.sum(o * o)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=2e-4, rtol=2e-4)

