"""Gemma decoder (the language tower inside ColPali's PaliGemma backbone).

Pure-functional JAX implementation of the HF ``GemmaModel`` semantics used by
ColPali embedding extraction (reference delegates to ``colpali_engine`` /
``ColPali.from_pretrained``, reference main.py:811-813):

- token embeddings scaled by sqrt(hidden)
- RMSNorm with (1 + weight) gain, float32 statistics
- rotary position embeddings (rotate-half convention, full head_dim)
- multi-query attention (num_kv_heads may be 1), scale 1/sqrt(head_dim)
- GeGLU MLP (gate/up/down) with tanh-approximated GELU

Layers are stacked and scanned (see layers.py). Attention masking supports
the prefix-LM pattern PaliGemma uses at inference: every token attends to
every valid (non-pad) token — HF builds a non-causal mask when not training
(verified against HF ColPali in tests/test_colpali_parity.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .layers import Params


@dataclass(frozen=True)
class GemmaConfig:
    vocab_size: int
    dim: int
    layers: int
    heads: int
    kv_heads: int
    head_dim: int
    mlp_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6


def rms_norm(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + w.astype(jnp.float32))).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x [B, T, H, Dh]; rotate-half convention (HF)."""
    dh = x.shape[-1]
    half = dh // 2
    freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions[:, :, None].astype(jnp.float32) * freq[None, None, :]  # [B, T, half]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _attn(
    p: Params,
    cfg: GemmaConfig,
    x: jax.Array,
    positions: jax.Array,
    key_mask: jax.Array,
    causal: bool,
) -> jax.Array:
    """Self-attention over [B, T, D]. Masking is separable: a dynamic
    key-validity mask [B, T] (True = attend) plus a static causal flag —
    covers both the PaliGemma prefix-LM inference mask (full attention among
    valid tokens) and the training/prefill causal mask. Impl dispatch
    (sp / pallas / xla, PERF.md crossovers) lives in decoder_attn."""
    from .decoder_attn import grouped_attention

    b, t, _ = x.shape
    q = jnp.dot(x, p["q"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(x, p["k"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(x, p["v"], preferred_element_type=jnp.float32).astype(x.dtype)
    q = q.reshape(b, t, cfg.heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)

    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)

    out = grouped_attention(
        q, k, v, key_mask=key_mask, causal=causal, sm_scale=1.0 / math.sqrt(cfg.head_dim)
    )
    return jnp.dot(out, p["o"], preferred_element_type=jnp.float32).astype(x.dtype)


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    gate = jnp.dot(x, p["gate"], preferred_element_type=jnp.float32)
    up = jnp.dot(x, p["up"], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(gate, approximate=True) * up
    return jnp.dot(h.astype(x.dtype), p["down"], preferred_element_type=jnp.float32).astype(x.dtype)


def gemma_apply(
    params: Params,
    cfg: GemmaConfig,
    inputs_embeds: jax.Array,
    attn_mask: jax.Array | None = None,
    causal: bool = False,
) -> jax.Array:
    """inputs_embeds [B, T, D] (already includes the sqrt(dim) embedding
    scaling and any merged image features). Returns final hidden [B, T, D].

    causal=False gives the PaliGemma inference prefix-LM mask (full attention
    among valid tokens)."""
    b, t, _ = inputs_embeds.shape
    if attn_mask is None:
        attn_mask = jnp.ones((b, t), jnp.int32)
    positions = jnp.broadcast_to(jnp.cumsum(attn_mask, axis=-1) - 1, (b, t))
    key_mask = attn_mask > 0

    x = inputs_embeds

    def body(h, lp):
        a = _attn(
            lp["attn"], cfg, rms_norm(lp["ln1"], h, cfg.rms_eps), positions, key_mask, causal
        )
        h = h + a
        m = _mlp(lp["mlp"], rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return rms_norm(params["final_norm"], x, cfg.rms_eps)


def gemma_embed(params: Params, cfg: GemmaConfig, input_ids: jax.Array) -> jax.Array:
    """Token embeddings with Gemma's sqrt(dim) normalizer."""
    emb = params["embed"][input_ids]
    return emb * jnp.asarray(math.sqrt(cfg.dim), emb.dtype)


def gemma_lm_logits(params: Params, cfg: GemmaConfig, hidden: jax.Array) -> jax.Array:
    """Tied-embedding LM head: hidden [B, T, D] -> logits [B, T, V] (f32)."""
    return jnp.dot(
        hidden, params["embed"].T.astype(hidden.dtype), preferred_element_type=jnp.float32
    )


def gemma_prefill(
    params: Params, cfg: GemmaConfig, input_ids: jax.Array, attn_mask: jax.Array, cache_len: int
):
    """Causal prefill for generation. Returns (hidden [B,T,D], kv cache).

    kv cache: {'k': [L, B, cache_len, KVH, Dh], 'v': ...} with the first T
    positions filled. Positions are cumsum(mask)-1 (left padding supported).
    """
    b, t = input_ids.shape
    positions = jnp.cumsum(attn_mask, axis=-1) - 1
    key_mask = attn_mask > 0
    x = gemma_embed(params, cfg, input_ids)

    def body(h, lp):
        y = rms_norm(lp["ln1"], h, cfg.rms_eps)
        k = jnp.dot(y, lp["attn"]["k"], preferred_element_type=jnp.float32).astype(h.dtype)
        v = jnp.dot(y, lp["attn"]["v"], preferred_element_type=jnp.float32).astype(h.dtype)
        k = _rope(k.reshape(b, t, cfg.kv_heads, cfg.head_dim), positions, cfg.rope_theta)
        v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)
        a = _attn(lp["attn"], cfg, y, positions, key_mask, True)
        h = h + a
        m = _mlp(lp["mlp"], rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    pad = cache_len - t
    kv = {
        "k": jnp.pad(ks, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
        "v": jnp.pad(vs, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
    }
    return rms_norm(params["final_norm"], x, cfg.rms_eps), kv


def gemma_decode_step(
    params: Params,
    cfg: GemmaConfig,
    kv: dict,
    token: jax.Array,  # [B]
    pos: jax.Array,  # [B] position of this token (for rope)
    write_idx: int | jax.Array,  # cache slot to write
    cache_valid: jax.Array,  # [B, cache_len] bool — slots to attend (incl. this one)
):
    """One autoregressive step. Returns (logits [B, V], updated kv)."""
    b = token.shape[0]
    cache_len = kv["k"].shape[2]
    x = gemma_embed(params, cfg, token[:, None])  # [B, 1, D]
    positions = pos[:, None]

    def body(carry, inp):
        h = carry
        lp, kc, vc = inp
        y = rms_norm(lp["ln1"], h, cfg.rms_eps)
        q = jnp.dot(y, lp["attn"]["q"], preferred_element_type=jnp.float32).astype(h.dtype)
        k = jnp.dot(y, lp["attn"]["k"], preferred_element_type=jnp.float32).astype(h.dtype)
        v = jnp.dot(y, lp["attn"]["v"], preferred_element_type=jnp.float32).astype(h.dtype)
        q = _rope(q.reshape(b, 1, cfg.heads, cfg.head_dim), positions, cfg.rope_theta)
        k = _rope(k.reshape(b, 1, cfg.kv_heads, cfg.head_dim), positions, cfg.rope_theta)
        v = v.reshape(b, 1, cfg.kv_heads, cfg.head_dim)
        kc = jax.lax.dynamic_update_slice_in_dim(kc, k, write_idx, axis=1)
        vc = jax.lax.dynamic_update_slice_in_dim(vc, v, write_idx, axis=1)

        g = cfg.heads // cfg.kv_heads
        qh = q.reshape(b, cfg.kv_heads, g, cfg.head_dim)
        logits = jnp.einsum("bhgd,bkhd->bhgk", qh, kc, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(cfg.head_dim)
        logits = jnp.where(cache_valid[:, None, None, :], logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        o = jnp.einsum("bhgk,bkhd->bhgd", attn, vc, preferred_element_type=jnp.float32)
        o = o.astype(h.dtype).reshape(b, 1, cfg.heads * cfg.head_dim)
        o = jnp.dot(o, lp["attn"]["o"], preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + o
        m = _mlp(lp["mlp"], rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], kv["k"], kv["v"]))
    x = rms_norm(params["final_norm"], x, cfg.rms_eps)
    logits = gemma_lm_logits(params, cfg, x)[:, 0]
    return logits, {"k": ks, "v": vs}


def gemma_init(key, cfg: GemmaConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.layers + 1)

    def one(k):
        kk = jax.random.split(k, 7)
        s = 0.02
        return {
            "ln1": jnp.zeros((cfg.dim,), dtype),
            "attn": {
                "q": jax.random.normal(kk[0], (cfg.dim, cfg.heads * cfg.head_dim), dtype) * s,
                "k": jax.random.normal(kk[1], (cfg.dim, cfg.kv_heads * cfg.head_dim), dtype) * s,
                "v": jax.random.normal(kk[2], (cfg.dim, cfg.kv_heads * cfg.head_dim), dtype) * s,
                "o": jax.random.normal(kk[3], (cfg.heads * cfg.head_dim, cfg.dim), dtype) * s,
            },
            "ln2": jnp.zeros((cfg.dim,), dtype),
            "mlp": {
                "gate": jax.random.normal(kk[4], (cfg.dim, cfg.mlp_dim), dtype) * s,
                "up": jax.random.normal(kk[5], (cfg.dim, cfg.mlp_dim), dtype) * s,
                "down": jax.random.normal(kk[6], (cfg.mlp_dim, cfg.dim), dtype) * s,
            },
        }

    layers = [one(k) for k in ks[: cfg.layers]]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embed": jax.random.normal(ks[-1], (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "layers": stacked,
        "final_norm": jnp.zeros((cfg.dim,), dtype),
    }
