"""Qwen3 decoder — the reference's actual RL base model family.

Pure-functional JAX implementation of the HF ``Qwen3ForCausalLM`` semantics
(the reference loads ``Qwen/Qwen3-14B`` for GRPO training and verification,
reference train_rl_pure_lora.py:74-82, verify_rl.py:18-28):

- plain token embeddings (no Gemma sqrt(dim) scaling)
- RMSNorm with plain ``w * normed`` gain, float32 statistics, normed value
  cast back to the input dtype BEFORE the gain multiply (HF Qwen3RMSNorm)
- grouped-query attention with **per-head QK-RMSNorm** applied between the
  q/k projections and rope (Qwen3's signature deviation from Llama/Gemma)
- rotary embeddings (rotate-half), theta 1e6, no bias on any projection
- gated SwiGLU MLP: down(silu(gate(x)) * up(x))
- untied LM head by default (Qwen3-14B ships a separate ``lm_head``);
  tied variant supported for the small Qwen3 configs

Layers are stacked and scanned; the attention impl dispatch (sp / pallas /
xla by shape) is shared with Gemma via models/decoder_attn.py. The module
mirrors gemma.py's function surface so the RL stack (rl/policy.py) can swap
architectures.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .gemma import _rope
from .layers import Params


@dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int
    dim: int
    layers: int
    heads: int
    kv_heads: int
    head_dim: int
    mlp_dim: int
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    tie_embeddings: bool = False


def qwen3_rms_norm(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    """HF Qwen3RMSNorm: f32 statistics, cast back, then gain in param dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * w.astype(x.dtype)


def _qkv(p: Params, cfg: Qwen3Config, x: jax.Array, positions: jax.Array):
    """Projections + per-head QK-RMSNorm + rope -> q [B,T,H,Dh], k/v [B,T,KVH,Dh]."""
    b, t, _ = x.shape
    q = jnp.dot(x, p["q"], preferred_element_type=jnp.float32).astype(x.dtype)
    k = jnp.dot(x, p["k"], preferred_element_type=jnp.float32).astype(x.dtype)
    v = jnp.dot(x, p["v"], preferred_element_type=jnp.float32).astype(x.dtype)
    q = q.reshape(b, t, cfg.heads, cfg.head_dim)
    k = k.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    v = v.reshape(b, t, cfg.kv_heads, cfg.head_dim)
    # Qwen3's q_norm/k_norm: RMSNorm over head_dim only (modeling_qwen3.py
    # Qwen3Attention), BEFORE rope
    q = qwen3_rms_norm(p["q_norm"], q, cfg.rms_eps)
    k = qwen3_rms_norm(p["k_norm"], k, cfg.rms_eps)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    return q, k, v


def _attn(
    p: Params,
    cfg: Qwen3Config,
    x: jax.Array,
    positions: jax.Array,
    key_mask: jax.Array,
    causal: bool,
) -> jax.Array:
    from .decoder_attn import grouped_attention

    q, k, v = _qkv(p, cfg, x, positions)
    out = grouped_attention(
        q, k, v, key_mask=key_mask, causal=causal, sm_scale=1.0 / math.sqrt(cfg.head_dim)
    )
    return jnp.dot(out, p["o"], preferred_element_type=jnp.float32).astype(x.dtype)


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    gate = jnp.dot(x, p["gate"], preferred_element_type=jnp.float32)
    up = jnp.dot(x, p["up"], preferred_element_type=jnp.float32)
    h = jax.nn.silu(gate) * up
    return jnp.dot(h.astype(x.dtype), p["down"], preferred_element_type=jnp.float32).astype(x.dtype)


def qwen3_embed(params: Params, cfg: Qwen3Config, input_ids: jax.Array) -> jax.Array:
    return params["embed"][input_ids]


def qwen3_apply(
    params: Params,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,
    attn_mask: jax.Array | None = None,
    causal: bool = True,
) -> jax.Array:
    """inputs_embeds [B, T, D] -> final hidden [B, T, D] (post final norm)."""
    b, t, _ = inputs_embeds.shape
    if attn_mask is None:
        attn_mask = jnp.ones((b, t), jnp.int32)
    positions = jnp.broadcast_to(jnp.cumsum(attn_mask, axis=-1) - 1, (b, t))
    key_mask = attn_mask > 0

    x = inputs_embeds

    def body(h, lp):
        a = _attn(
            lp["attn"], cfg, qwen3_rms_norm(lp["ln1"], h, cfg.rms_eps), positions, key_mask, causal
        )
        h = h + a
        m = _mlp(lp["mlp"], qwen3_rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return qwen3_rms_norm(params["final_norm"], x, cfg.rms_eps)


def qwen3_lm_logits(params: Params, cfg: Qwen3Config, hidden: jax.Array) -> jax.Array:
    """LM head: hidden [B, T, D] -> logits [B, T, V] (f32). Untied head when
    the params carry one (Qwen3-14B), tied embeddings otherwise."""
    head = params["lm_head"] if "lm_head" in params else params["embed"].T
    return jnp.dot(hidden, head.astype(hidden.dtype), preferred_element_type=jnp.float32)


def qwen3_prefill(
    params: Params, cfg: Qwen3Config, input_ids: jax.Array, attn_mask: jax.Array, cache_len: int
):
    """Causal prefill for generation. Returns (hidden [B,T,D], kv cache) —
    same cache layout as gemma_prefill: {'k': [L, B, cache_len, KVH, Dh], 'v'}."""
    b, t = input_ids.shape
    positions = jnp.cumsum(attn_mask, axis=-1) - 1
    key_mask = attn_mask > 0
    x = qwen3_embed(params, cfg, input_ids)

    def body(h, lp):
        y = qwen3_rms_norm(lp["ln1"], h, cfg.rms_eps)
        q, k, v = _qkv(lp["attn"], cfg, y, positions)
        from .decoder_attn import grouped_attention

        out = grouped_attention(
            q, k, v, key_mask=key_mask, causal=True, sm_scale=1.0 / math.sqrt(cfg.head_dim)
        )
        a = jnp.dot(out, lp["attn"]["o"], preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + a
        m = _mlp(lp["mlp"], qwen3_rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, (k, v)

    x, (ks, vs) = jax.lax.scan(body, x, params["layers"])
    pad = cache_len - t
    kv = {
        "k": jnp.pad(ks, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
        "v": jnp.pad(vs, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0))),
    }
    return qwen3_rms_norm(params["final_norm"], x, cfg.rms_eps), kv


def qwen3_decode_step(
    params: Params,
    cfg: Qwen3Config,
    kv: dict,
    token: jax.Array,  # [B]
    pos: jax.Array,  # [B] rope position of this token
    write_idx: int | jax.Array,  # cache slot to write
    cache_valid: jax.Array,  # [B, cache_len] bool — slots to attend (incl. this one)
):
    """One autoregressive step. Returns (logits [B, V], updated kv)."""
    b = token.shape[0]
    x = qwen3_embed(params, cfg, token[:, None])  # [B, 1, D]
    positions = pos[:, None]

    def body(carry, inp):
        h = carry
        lp, kc, vc = inp
        y = qwen3_rms_norm(lp["ln1"], h, cfg.rms_eps)
        q, k, v = _qkv(lp["attn"], cfg, y, positions)
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
        m = _mlp(lp["mlp"], qwen3_rms_norm(lp["ln2"], h, cfg.rms_eps))
        return h + m, (kc, vc)

    x, (ks, vs) = jax.lax.scan(body, x, (params["layers"], kv["k"], kv["v"]))
    x = qwen3_rms_norm(params["final_norm"], x, cfg.rms_eps)
    logits = qwen3_lm_logits(params, cfg, x)[:, 0]
    return logits, {"k": ks, "v": vs}


def qwen3_init(key, cfg: Qwen3Config, dtype=jnp.float32) -> Params:
    """Random init directly at the scan-stacked [layers, ...] shapes.

    Generating per-layer trees and jnp.stack-ing them keeps TWO copies of
    every layer weight alive at the stack point — ~15 GB transient for
    Qwen3-4B bf16, which OOMs a 16 GB v5e chip. Stacked-shape generation
    peaks at params + one weight transient instead."""
    kk = jax.random.split(key, 9)
    s = 0.02
    L = cfg.layers

    def w(k, *shape):
        return jax.random.normal(k, (L, *shape), dtype) * s

    stacked = {
        "ln1": jnp.ones((L, cfg.dim), dtype),
        "attn": {
            "q": w(kk[0], cfg.dim, cfg.heads * cfg.head_dim),
            "k": w(kk[1], cfg.dim, cfg.kv_heads * cfg.head_dim),
            "v": w(kk[2], cfg.dim, cfg.kv_heads * cfg.head_dim),
            "o": w(kk[3], cfg.heads * cfg.head_dim, cfg.dim),
            "q_norm": jnp.ones((L, cfg.head_dim), dtype),
            "k_norm": jnp.ones((L, cfg.head_dim), dtype),
        },
        "ln2": jnp.ones((L, cfg.dim), dtype),
        "mlp": {
            "gate": w(kk[4], cfg.dim, cfg.mlp_dim),
            "up": w(kk[5], cfg.dim, cfg.mlp_dim),
            "down": w(kk[6], cfg.mlp_dim, cfg.dim),
        },
    }
    params = {
        "embed": jax.random.normal(kk[7], (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "layers": stacked,
        "final_norm": jnp.ones((cfg.dim,), dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(kk[8], (cfg.dim, cfg.vocab_size), dtype) * 0.02
    return params


# --- HF checkpoint conversion -------------------------------------------------


def qwen3_config_from_hf(hf_cfg) -> Qwen3Config:
    """transformers Qwen3Config -> Qwen3Config (Qwen/Qwen3-14B config.json)."""
    return Qwen3Config(
        vocab_size=hf_cfg.vocab_size,
        dim=hf_cfg.hidden_size,
        layers=hf_cfg.num_hidden_layers,
        heads=hf_cfg.num_attention_heads,
        kv_heads=hf_cfg.num_key_value_heads,
        head_dim=getattr(hf_cfg, "head_dim", hf_cfg.hidden_size // hf_cfg.num_attention_heads),
        mlp_dim=hf_cfg.intermediate_size,
        rope_theta=float(hf_cfg.rope_theta),
        rms_eps=float(hf_cfg.rms_norm_eps),
        tie_embeddings=bool(getattr(hf_cfg, "tie_word_embeddings", False)),
    )


def qwen3_params_from_hf(sd, cfg: Qwen3Config) -> Params:
    """HF Qwen3ForCausalLM state dict -> stacked JAX params."""
    from .convert import _stack_layers, _t, _to_jnp

    layers = []
    for i in range(cfg.layers):
        lp = f"model.layers.{i}"
        layers.append(
            {
                "ln1": _t(sd[f"{lp}.input_layernorm.weight"]),
                "attn": {
                    "q": _t(sd[f"{lp}.self_attn.q_proj.weight"]).T,
                    "k": _t(sd[f"{lp}.self_attn.k_proj.weight"]).T,
                    "v": _t(sd[f"{lp}.self_attn.v_proj.weight"]).T,
                    "o": _t(sd[f"{lp}.self_attn.o_proj.weight"]).T,
                    "q_norm": _t(sd[f"{lp}.self_attn.q_norm.weight"]),
                    "k_norm": _t(sd[f"{lp}.self_attn.k_norm.weight"]),
                },
                "ln2": _t(sd[f"{lp}.post_attention_layernorm.weight"]),
                "mlp": {
                    "gate": _t(sd[f"{lp}.mlp.gate_proj.weight"]).T,
                    "up": _t(sd[f"{lp}.mlp.up_proj.weight"]).T,
                    "down": _t(sd[f"{lp}.mlp.down_proj.weight"]).T,
                },
            }
        )
    params = {
        "embed": _t(sd["model.embed_tokens.weight"]),
        "layers": _stack_layers(layers),
        "final_norm": _t(sd["model.norm.weight"]),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _t(sd["lm_head.weight"]).T
    return _to_jnp(params)


# Qwen/Qwen3-14B config.json (the reference's RL base model)
QWEN3_14B = Qwen3Config(
    vocab_size=151936,
    dim=5120,
    layers=40,
    heads=40,
    kv_heads=8,
    head_dim=128,
    mlp_dim=17408,
    rope_theta=1e6,
    rms_eps=1e-6,
    tie_embeddings=False,
)
