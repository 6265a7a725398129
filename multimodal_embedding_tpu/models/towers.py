"""Dual-encoder towers: ViT image encoders and text transformers in pure JAX.

Covers both architecture families the benchmark needs (SURVEY.md §2.1 A5):

- ``clip`` style (OpenAI-CLIP-L, LAION-CLIP-H, MetaCLIP-H14, Apple-DFN5B-H):
  class token + learned positions, pre-layernorm encoder, CLS pooling through
  a final layernorm, linear projection; causal text tower pooled at the EOS
  position.
- ``siglip`` style (SigLIP-400M, and the vision tower inside ColPali's
  PaliGemma): no class token, patch bias, MAP attention-pooling head;
  bidirectional text tower pooled at the last token through a head linear.

Patchification is a reshape + matmul (stride == patch size makes the conv a
dense matmul — MXU-native), and the encoder is a ``lax.scan`` over stacked
layer params (see layers.py).

Checkpoint conversion from HF lives in convert.py; parity vs the HF torch
implementations is enforced in tests/test_tower_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    encoder_stack,
    encoder_stack_init,
    layer_norm,
    linear,
    linear_init,
    ln_init,
    mha,
    mlp_block,
)

Style = Literal["clip", "siglip"]


@dataclass(frozen=True)
class VisionConfig:
    image_size: int
    patch_size: int
    dim: int
    layers: int
    heads: int
    mlp_dim: int
    proj_dim: int | None  # None => pooled output is the embedding (siglip)
    style: Style = "clip"
    act: str = "quick_gelu"
    ln_eps: float = 1e-5
    use_head: bool = True  # siglip only: False => return the full post-LN
    # patch sequence [B, N, D] (PaliGemma's headless vision tower)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclass(frozen=True)
class TextConfig:
    vocab_size: int
    max_len: int
    dim: int
    layers: int
    heads: int
    mlp_dim: int
    proj_dim: int | None
    style: Style = "clip"
    act: str = "quick_gelu"
    ln_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclass(frozen=True)
class DualEncoderConfig:
    vision: VisionConfig
    text: TextConfig
    family: Style = "clip"


# --- vision tower -----------------------------------------------------------


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, patch*patch*3] with (ph, pw, c) flatten order.

    Non-divisible sizes crop the trailing pixels, matching a stride=patch
    'valid' conv (e.g. SigLIP-So400m: 384 px / patch 14 -> 27x27 grid, last
    6 pixels dropped)."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x[:, : gh * patch, : gw * patch]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, c]
    return x.reshape(b, gh * gw, patch * patch * c)


def vision_tower_apply(params: Params, cfg: VisionConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, S, S, 3] (normalized f32/bf16) -> embeddings [B, E].

    Returns the *unnormalized* image features (L2 normalization happens in the
    encode pipeline, matching reference main.py:414).
    """
    dtype = params["patch"]["w"].dtype
    x = patchify(pixels.astype(dtype), cfg.patch_size)
    x = jnp.dot(x, params["patch"]["w"], preferred_element_type=jnp.float32).astype(dtype)
    if "b" in params["patch"]:
        x = x + params["patch"]["b"]

    if cfg.style == "clip":
        cls = jnp.broadcast_to(params["cls"], (x.shape[0], 1, cfg.dim)).astype(dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"].astype(dtype)

    if cfg.style == "clip":
        x = layer_norm(params["pre_ln"], x, cfg.ln_eps)
    x = encoder_stack(params["encoder"], x, cfg.heads, cfg.act, ln_eps=cfg.ln_eps)

    if cfg.style == "clip":
        pooled = layer_norm(params["post_ln"], x[:, 0], cfg.ln_eps)
        return jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)

    # siglip: post-LN over all tokens, then MAP attention-pooling head
    x = layer_norm(params["post_ln"], x, cfg.ln_eps)
    if not cfg.use_head:
        return x  # [B, N, D] patch sequence (PaliGemma vision tower)
    head = params["head"]
    probe = jnp.broadcast_to(head["probe"], (x.shape[0], 1, cfg.dim)).astype(dtype)
    h = mha(head["attn"], probe, cfg.heads, kv=x)
    h = h + mlp_block(head["mlp"], layer_norm(head["ln"], h, cfg.ln_eps), cfg.act)
    pooled = h[:, 0]
    if cfg.proj_dim is not None:
        pooled = jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)
    return pooled.astype(jnp.float32)


def vision_tower_init(key, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    n_tok = cfg.n_patches + (1 if cfg.style == "clip" else 0)
    p: Params = {
        "patch": {"w": jax.random.normal(ks[0], (cfg.patch_size**2 * 3, cfg.dim), dtype) * 0.02},
        "pos": jax.random.normal(ks[1], (n_tok, cfg.dim), dtype) * 0.02,
        "encoder": encoder_stack_init(ks[2], cfg.layers, cfg.dim, cfg.mlp_dim, dtype),
        "post_ln": ln_init(cfg.dim, dtype),
    }
    if cfg.style == "clip":
        p["cls"] = jax.random.normal(ks[3], (cfg.dim,), dtype) * 0.02
        p["pre_ln"] = ln_init(cfg.dim, dtype)
        p["proj"] = jax.random.normal(ks[4], (cfg.dim, cfg.proj_dim), dtype) * cfg.dim**-0.5
    else:
        p["patch"]["b"] = jnp.zeros((cfg.dim,), dtype)
        if not cfg.use_head:
            return p
        hk = jax.random.split(ks[5], 6)
        p["head"] = {
            "probe": jax.random.normal(hk[0], (1, 1, cfg.dim), dtype) * 0.02,
            "attn": {
                "q": linear_init(hk[1], cfg.dim, cfg.dim, dtype),
                "k": linear_init(hk[2], cfg.dim, cfg.dim, dtype),
                "v": linear_init(hk[3], cfg.dim, cfg.dim, dtype),
                "o": linear_init(hk[4], cfg.dim, cfg.dim, dtype),
            },
            "ln": ln_init(cfg.dim, dtype),
            "mlp": {
                "fc1": linear_init(hk[5], cfg.dim, cfg.mlp_dim, dtype),
                "fc2": linear_init(hk[5], cfg.mlp_dim, cfg.dim, dtype),
            },
        }
        if cfg.proj_dim is not None:
            p["proj"] = jax.random.normal(ks[6], (cfg.dim, cfg.proj_dim), dtype) * cfg.dim**-0.5
    return p


# --- text tower --------------------------------------------------------------


def text_tower_apply(
    params: Params, cfg: TextConfig, input_ids: jax.Array, attn_mask: jax.Array | None = None
) -> jax.Array:
    """input_ids [B, T] -> embeddings [B, E] (unnormalized)."""
    dtype = params["tok"].dtype
    t = input_ids.shape[1]
    x = params["tok"][input_ids] + params["pos"][:t]
    x = x.astype(dtype)

    causal = cfg.style == "clip"
    x = encoder_stack(
        params["encoder"], x, cfg.heads, cfg.act, causal=causal, mask=attn_mask, ln_eps=cfg.ln_eps
    )
    x = layer_norm(params["final_ln"], x, cfg.ln_eps)

    if cfg.style == "clip":
        # EOS pooling, replicating HF CLIPTextTransformer exactly: configs with
        # the legacy eos_token_id == 2 pool at argmax(input_ids) (the real EOS,
        # 49407, is the highest vocab id); newer configs pool at the first
        # occurrence of eos_token_id.
        if cfg.eos_token_id == 2:
            eos_pos = jnp.argmax(input_ids, axis=-1)
        else:
            eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos_pos]
        return jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)

    # siglip: last token, then head linear
    pooled = x[:, -1]
    return linear(params["head"], pooled).astype(jnp.float32)


def text_tower_init(key, cfg: TextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    p: Params = {
        "tok": jax.random.normal(ks[0], (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "pos": jax.random.normal(ks[1], (cfg.max_len, cfg.dim), dtype) * 0.02,
        "encoder": encoder_stack_init(ks[2], cfg.layers, cfg.dim, cfg.mlp_dim, dtype),
        "final_ln": ln_init(cfg.dim, dtype),
    }
    if cfg.style == "clip":
        p["proj"] = jax.random.normal(ks[3], (cfg.dim, cfg.proj_dim), dtype) * cfg.dim**-0.5
    else:
        p["head"] = linear_init(ks[4], cfg.dim, cfg.dim, dtype)
    return p


# --- dual encoder ------------------------------------------------------------


def dual_encoder_init(key, cfg: DualEncoderConfig, dtype=jnp.float32) -> Params:
    kv, kt = jax.random.split(key)
    return {
        "vision": vision_tower_init(kv, cfg.vision, dtype),
        "text": text_tower_init(kt, cfg.text, dtype),
    }


def encode_image(params: Params, cfg: DualEncoderConfig, pixels: jax.Array) -> jax.Array:
    return vision_tower_apply(params["vision"], cfg.vision, pixels)


def encode_text(
    params: Params, cfg: DualEncoderConfig, input_ids: jax.Array, attn_mask: jax.Array | None = None
) -> jax.Array:
    return text_tower_apply(params["text"], cfg.text, input_ids, attn_mask)
