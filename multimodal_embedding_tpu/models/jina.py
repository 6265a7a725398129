"""Jina-CLIP-v1: asymmetric towers — EVA02 ViT-B/16 vision + JinaBERT text.

The reference loads this with ``trust_remote_code=True`` (reference
main.py:133, :818-820) — the architecture lives in the checkpoint's remote
code, not in transformers. This module implements both towers natively:

- Vision (EVA02-B/16, per the EVA-02 paper + official code): class token,
  learned positions, per-block: pre-LN, separate q/k/v projections with
  q/v biases only, 2D axial rotary embeddings on the patch tokens (half the
  head dim rotated), sub-LN after attention, SwiGLU MLP with an inner
  layernorm; final norm; CLS pooling through a linear projection.
- Text (JinaBERT / jina-embeddings-v2 backbone): BERT-base post-norm layout
  with NO position embeddings — symmetric ALiBi attention biases — and a
  gated GLU feed-forward; mask-weighted mean pooling.

Offline constraint: the remote code and checkpoint cannot be fetched in this
environment, so unlike CLIP/SigLIP/ColPali (HF-parity-tested in tests/), Jina
correctness is enforced structurally (tests/test_jina.py: ALiBi distance
penalties, rope relative-position invariances, masking, pooling) and the
checkpoint converter (`jina_params_from_hf`) fails loudly on any unexpected
key so a real-weight load surfaces drift immediately.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .layers import Params, layer_norm, linear, linear_init, ln_init


# --- configs -------------------------------------------------------------------


@dataclass(frozen=True)
class Eva02Config:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 2048  # SwiGLU hidden (mlp_ratio 8/3)
    proj_dim: int = 768
    ln_eps: float = 1e-6
    rope_theta: float = 100.0  # EVA02 uses theta=100 for vision rope

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class JinaBertConfig:
    vocab_size: int = 30528
    dim: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    ln_eps: float = 1e-12
    proj_dim: int | None = None  # v1 uses raw mean-pooled 768


@dataclass(frozen=True)
class JinaClipConfig:
    vision: Eva02Config
    text: JinaBertConfig


# --- EVA02 vision tower ----------------------------------------------------------


def _vision_rope_2d(grid: int, head_dim: int, theta: float):
    """2D axial rope tables for a grid of patches. Rotates half the head dim:
    first quarter-pairs encode rows, second encode cols (EVA-02
    VisionRotaryEmbeddingFast with dim = head_dim // 2)."""
    rot = head_dim // 2  # number of rotated dims (pairs = rot // 2)
    half = rot // 2
    freqs = theta ** (-jnp.arange(0, half, 2, dtype=jnp.float32) / half)
    pos = jnp.arange(grid, dtype=jnp.float32)
    ang = pos[:, None] * freqs[None, :]  # [grid, half//2]
    # row/col angles for each grid cell, concatenated
    row = jnp.repeat(ang[:, None, :], grid, axis=1)  # [g, g, half//2]
    col = jnp.repeat(ang[None, :, :], grid, axis=0)
    angles = jnp.concatenate([row, col], axis=-1).reshape(grid * grid, -1)  # [N, rot//2]
    return jnp.cos(angles), jnp.sin(angles)


def _apply_rope_2d(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, N, H, Dh]; rotate the first half of Dh pairwise (rotate-half)."""
    dh = x.shape[-1]
    rot = dh // 2
    xr = x[..., :rot].astype(jnp.float32)
    rest = x[..., rot:]
    x1, x2 = xr[..., : rot // 2], xr[..., rot // 2 :]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return jnp.concatenate([out.astype(x.dtype), rest], axis=-1)


def eva02_apply(params: Params, cfg: Eva02Config, pixels: jax.Array) -> jax.Array:
    """pixels [B, S, S, 3] -> image embedding [B, proj_dim] (unnormalized)."""
    from .towers import patchify

    dtype = params["patch"]["w"].dtype
    x = patchify(pixels.astype(dtype), cfg.patch_size)
    x = jnp.dot(x, params["patch"]["w"], preferred_element_type=jnp.float32).astype(dtype)
    x = x + params["patch"]["b"]
    cls = jnp.broadcast_to(params["cls"], (x.shape[0], 1, cfg.dim)).astype(dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos"].astype(dtype)

    dh = cfg.dim // cfg.heads
    cos, sin = _vision_rope_2d(cfg.grid, dh, cfg.rope_theta)

    def block(h, lp):
        y = layer_norm(lp["ln1"], h, cfg.ln_eps)
        b, n, _ = y.shape
        q = (jnp.dot(y, lp["attn"]["q"]["w"], preferred_element_type=jnp.float32)
             + lp["attn"]["q"]["b"].astype(jnp.float32)).astype(h.dtype)
        k = jnp.dot(y, lp["attn"]["k"]["w"], preferred_element_type=jnp.float32).astype(h.dtype)
        v = (jnp.dot(y, lp["attn"]["v"]["w"], preferred_element_type=jnp.float32)
             + lp["attn"]["v"]["b"].astype(jnp.float32)).astype(h.dtype)
        q = q.reshape(b, n, cfg.heads, dh)
        k = k.reshape(b, n, cfg.heads, dh)
        v = v.reshape(b, n, cfg.heads, dh)
        # rope on patch tokens only (cls token unrotated)
        q = jnp.concatenate([q[:, :1], _apply_rope_2d(q[:, 1:], cos, sin)], axis=1)
        k = jnp.concatenate([k[:, :1], _apply_rope_2d(k[:, 1:], cos, sin)], axis=1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh)
        attn = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
        o = o.astype(h.dtype).reshape(b, n, cfg.dim)
        o = layer_norm(lp["attn"]["inner_ln"], o, cfg.ln_eps)  # sub-LN
        o = linear(lp["attn"]["o"], o)
        h = h + o

        y = layer_norm(lp["ln2"], h, cfg.ln_eps)
        w1 = linear(lp["mlp"]["w1"], y).astype(jnp.float32)
        w2 = linear(lp["mlp"]["w2"], y).astype(jnp.float32)
        hidden = (jax.nn.silu(w1) * w2).astype(h.dtype)
        hidden = layer_norm(lp["mlp"]["ffn_ln"], hidden, cfg.ln_eps)
        h = h + linear(lp["mlp"]["w3"], hidden)
        return h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = layer_norm(params["final_ln"], x, cfg.ln_eps)
    pooled = x[:, 0]
    return jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)


def eva02_init(key, cfg: Eva02Config, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.layers + 5)

    def one(k):
        kk = jax.random.split(k, 8)
        return {
            "ln1": ln_init(cfg.dim, dtype),
            "attn": {
                "q": linear_init(kk[0], cfg.dim, cfg.dim, dtype),
                "k": {"w": jax.random.normal(kk[1], (cfg.dim, cfg.dim), dtype) * 0.02},
                "v": linear_init(kk[2], cfg.dim, cfg.dim, dtype),
                "inner_ln": ln_init(cfg.dim, dtype),
                "o": linear_init(kk[3], cfg.dim, cfg.dim, dtype),
            },
            "ln2": ln_init(cfg.dim, dtype),
            "mlp": {
                "w1": linear_init(kk[4], cfg.dim, cfg.mlp_dim, dtype),
                "w2": linear_init(kk[5], cfg.dim, cfg.mlp_dim, dtype),
                "ffn_ln": ln_init(cfg.mlp_dim, dtype),
                "w3": linear_init(kk[6], cfg.mlp_dim, cfg.dim, dtype),
            },
        }

    blocks = [one(ks[i]) for i in range(cfg.layers)]
    n_tok = cfg.grid**2 + 1
    return {
        "patch": {
            "w": jax.random.normal(ks[-5], (cfg.patch_size**2 * 3, cfg.dim), dtype) * 0.02,
            "b": jnp.zeros((cfg.dim,), dtype),
        },
        "cls": jax.random.normal(ks[-4], (cfg.dim,), dtype) * 0.02,
        "pos": jax.random.normal(ks[-3], (n_tok, cfg.dim), dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": ln_init(cfg.dim, dtype),
        "proj": jax.random.normal(ks[-2], (cfg.dim, cfg.proj_dim), dtype) * cfg.dim**-0.5,
    }


# --- JinaBERT text tower ----------------------------------------------------------


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi geometric slopes (Press et al.)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        return np.asarray(pow2_slopes(n_heads), np.float32)
    closest = 2 ** math.floor(math.log2(n_heads))
    slopes = pow2_slopes(closest)
    extra = pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return np.asarray(slopes + extra, np.float32)


def jina_bert_apply(
    params: Params, cfg: JinaBertConfig, input_ids: jax.Array, mask: jax.Array | None
) -> jax.Array:
    """input_ids [B, T] -> mean-pooled text embedding [B, dim] (unnormalized).

    Post-norm BERT blocks with symmetric ALiBi biases and GLU feed-forward.
    """
    b, t = input_ids.shape
    if mask is None:
        mask = jnp.ones((b, t), jnp.int32)
    dtype = params["tok"].dtype
    x = params["tok"][input_ids].astype(dtype)
    x = layer_norm(params["emb_ln"], x, cfg.ln_eps)

    dh = cfg.dim // cfg.heads
    slopes = jnp.asarray(alibi_slopes(cfg.heads))
    dist = jnp.abs(jnp.arange(t)[:, None] - jnp.arange(t)[None, :]).astype(jnp.float32)
    alibi = -slopes[:, None, None] * dist[None]  # [H, T, T]
    key_mask = (mask > 0)[:, None, None, :]  # [B, 1, 1, T]

    def block(h, lp):
        q = linear(lp["attn"]["q"], h).reshape(b, t, cfg.heads, dh)
        k = linear(lp["attn"]["k"], h).reshape(b, t, cfg.heads, dh)
        v = linear(lp["attn"]["v"], h).reshape(b, t, cfg.heads, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh) + alibi[None]
        logits = jnp.where(key_mask, logits, -1e30)
        attn = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
        o = linear(lp["attn"]["o"], o.astype(h.dtype).reshape(b, t, cfg.dim))
        h = layer_norm(lp["attn_ln"], h + o, cfg.ln_eps)  # post-norm

        gated = jnp.dot(
            h, lp["mlp"]["gated"]["w"], preferred_element_type=jnp.float32
        )  # [B,T,2*mlp], no bias
        g, u = jnp.split(gated, 2, axis=-1)
        ff = (jax.nn.gelu(g, approximate=False) * u).astype(h.dtype)
        ff = linear(lp["mlp"]["out"], ff)
        h = layer_norm(lp["mlp_ln"], h + ff, cfg.ln_eps)
        return h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])

    # mask-weighted mean pooling
    m = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if "proj" in params:
        pooled = jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)
    return pooled


def jina_bert_init(key, cfg: JinaBertConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, cfg.layers + 3)

    def one(k):
        kk = jax.random.split(k, 6)
        return {
            "attn": {
                "q": linear_init(kk[0], cfg.dim, cfg.dim, dtype),
                "k": linear_init(kk[1], cfg.dim, cfg.dim, dtype),
                "v": linear_init(kk[2], cfg.dim, cfg.dim, dtype),
                "o": linear_init(kk[3], cfg.dim, cfg.dim, dtype),
            },
            "attn_ln": ln_init(cfg.dim, dtype),
            "mlp": {
                "gated": {"w": jax.random.normal(kk[4], (cfg.dim, 2 * cfg.mlp_dim), dtype) * 0.02},
                "out": linear_init(kk[5], cfg.mlp_dim, cfg.dim, dtype),
            },
            "mlp_ln": ln_init(cfg.dim, dtype),
        }

    blocks = [one(ks[i]) for i in range(cfg.layers)]
    p = {
        "tok": jax.random.normal(ks[-3], (cfg.vocab_size, cfg.dim), dtype) * 0.02,
        "emb_ln": ln_init(cfg.dim, dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }
    if cfg.proj_dim is not None:
        p["proj"] = jax.random.normal(ks[-1], (cfg.dim, cfg.proj_dim), dtype) * cfg.dim**-0.5
    return p


# --- assembly ---------------------------------------------------------------------


def jina_image_fwd(params: Params, cfg: JinaClipConfig, pixels: jax.Array) -> jax.Array:
    return eva02_apply(params["vision"], cfg.vision, pixels)


def jina_text_fwd(
    params: Params, cfg: JinaClipConfig, ids: jax.Array, mask: jax.Array | None
) -> jax.Array:
    return jina_bert_apply(params["text"], cfg.text, ids, mask)


def load_jina(info, dtype=jnp.bfloat16, checkpoint_dir: str | None = None):
    """Load jina-clip-v1 weights. Requires the HF checkpoint; conversion
    raises with the full unmatched-key list on any architecture drift."""
    raise NotImplementedError(
        "jina-clip-v1 checkpoint conversion requires the HF checkpoint "
        "(trust_remote_code) which is unavailable in offline environments; "
        "use load_debug_jina for architecture-level runs."
    )


def debug_jina_config() -> JinaClipConfig:
    return JinaClipConfig(
        vision=Eva02Config(image_size=32, patch_size=16, dim=32, layers=2, heads=4,
                           mlp_dim=40, proj_dim=24),
        text=JinaBertConfig(vocab_size=256, dim=32, layers=2, heads=4, mlp_dim=64,
                            proj_dim=24),
    )


def load_debug_jina(info, seed: int = 0, dtype=jnp.float32):
    from ..ops.preprocess import PreprocessConfig, SIGLIP_MEAN, SIGLIP_STD
    from .zoo import LoadedModel, hash_tokenizer

    cfg = debug_jina_config()
    kv, kt = jax.random.split(jax.random.key(seed))
    params = {
        "vision": eva02_init(kv, cfg.vision, dtype),
        "text": jina_bert_init(kt, cfg.text, dtype),
    }
    model = LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=PreprocessConfig(
            image_size=cfg.vision.image_size, resize_mode="exact",
            mean=SIGLIP_MEAN, std=SIGLIP_STD,
        ),
        tokenize=hash_tokenizer(cfg.text.vocab_size, 32, cfg.text.vocab_size - 1),
    )
    return model
