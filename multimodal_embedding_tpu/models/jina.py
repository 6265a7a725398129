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

Ground truth: an INDEPENDENT torch implementation of both towers
(tests/jina_torch_reference.py, written from the same published
architecture sources but separately from this module) provides numerical
parity targets and a synthetic state dict in the real checkpoint's key
naming; tests/test_jina.py asserts converted-weight agreement plus
structural invariants (ALiBi penalties, masking, pooling). The checkpoint
converter (`jina_params_from_hf`) is strict — it raises with the exact key
list on any layout drift, so a real-weight load surfaces architecture
mismatch immediately rather than silently mis-mapping.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .convert import _patch_w, _t, _to_jnp
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
    rope_theta: float = 10000.0  # VisionRotaryEmbeddingFast default
    rope_pt_grid: int = 16  # pt_seq_len: pretrain grid positions are rescaled to this

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


def _vision_rope_2d(grid: int, head_dim: int, theta: float, pt_grid: int = 16):
    """2D axial rope angle tables, matching EVA-02's VisionRotaryEmbeddingFast
    (rope.py in the official EVA-02 code, constructed with
    ``dim = head_dim // 2``):

    - per-axis frequencies f_j = theta^(-2j / (head_dim/2)) for
      j = 0 .. head_dim/4 - 1;
    - positions rescaled to the pretrain grid: t = arange(grid)/grid * pt_grid;
    - each per-axis angle is repeated twice (interleaved pairs), then the
      row-axis block and column-axis block are concatenated -> one angle per
      head-dim channel (the FULL head dim is rotated).

    Returns (cos, sin) of shape [grid*grid, head_dim].
    """
    rot = head_dim // 2  # per-axis rope dim
    freqs = theta ** (
        -jnp.arange(0, rot, 2, dtype=jnp.float32)[: rot // 2] / rot
    )  # [rot//2]
    t = jnp.arange(grid, dtype=jnp.float32) / grid * pt_grid
    ang = t[:, None] * freqs[None, :]  # [grid, rot//2]
    ang = jnp.repeat(ang, 2, axis=-1)  # interleaved pairs -> [grid, rot]
    row = jnp.repeat(ang[:, None, :], grid, axis=1)  # [g, g, rot]
    col = jnp.repeat(ang[None, :, :], grid, axis=0)
    angles = jnp.concatenate([row, col], axis=-1).reshape(grid * grid, head_dim)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """EVA rotate_half: interleaved pairs (x0, x1) -> (-x1, x0)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x = jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
    return x.reshape(*x.shape[:-2], -1)


def _apply_rope_2d(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, N, H, Dh] -> x*cos + rotate_half(x)*sin over the full head dim."""
    xf = x.astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + _rotate_half_interleaved(xf) * s).astype(x.dtype)


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
    cos, sin = _vision_rope_2d(cfg.grid, dh, cfg.rope_theta, cfg.rope_pt_grid)

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
    out = jnp.dot(pooled, params["proj"], preferred_element_type=jnp.float32)
    if "proj_b" in params:  # EVA02 head is nn.Linear with bias
        out = out + params["proj_b"].astype(jnp.float32)
    return out


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


# --- HF conversion -------------------------------------------------------------
#
# jina-clip-v1 state-dict schema (reconstructed from the checkpoint's remote
# code lineage: EVA-02 official `eva02` models for the vision tower, the Jina
# BERT GLU implementation for the text tower). Keys, per tower:
#
#   vision_model.patch_embed.proj.{weight,bias}     conv [D,3,P,P]
#   vision_model.cls_token                          [1,1,D]
#   vision_model.pos_embed                          [1,N+1,D]
#   vision_model.blocks.{i}.norm1.{weight,bias}
#   vision_model.blocks.{i}.attn.{q,k,v}_proj.weight   (k has no bias)
#   vision_model.blocks.{i}.attn.{q,v}_bias
#   vision_model.blocks.{i}.attn.inner_attn_ln.{weight,bias}   sub-LN
#   vision_model.blocks.{i}.attn.proj.{weight,bias}
#   vision_model.blocks.{i}.norm2.{weight,bias}
#   vision_model.blocks.{i}.mlp.{w1,w2}.{weight,bias}  SwiGLU gate/up
#   vision_model.blocks.{i}.mlp.ffn_ln.{weight,bias}
#   vision_model.blocks.{i}.mlp.w3.{weight,bias}
#   vision_model.norm.{weight,bias}
#   vision_model.head.{weight,bias}
#
#   text_model.transformer.embeddings.word_embeddings.weight
#   text_model.transformer.embeddings.token_type_embeddings.weight (folded:
#       the benchmark always passes token_type_ids=0, so row 0 is added to
#       every word embedding)
#   text_model.transformer.embeddings.LayerNorm.{weight,bias}
#   text_model.transformer.encoder.layer.{i}.attention.self.{query,key,value}.{weight,bias}
#   text_model.transformer.encoder.layer.{i}.attention.output.dense.{weight,bias}
#   text_model.transformer.encoder.layer.{i}.attention.output.LayerNorm.{weight,bias}
#   text_model.transformer.encoder.layer.{i}.mlp.gated_layers.weight   (no bias)
#   text_model.transformer.encoder.layer.{i}.mlp.wo.{weight,bias}
#   text_model.transformer.encoder.layer.{i}.mlp.layernorm.{weight,bias}
#
# The converter is strict: every consumed key is checked off and any unused
# or missing key raises with the full list, so real-checkpoint drift fails
# loudly at load time instead of silently mis-mapping.


_IGNORED_KEY_MARKERS = (
    "rope.",  # rotary cos/sin buffers — recomputed, not weights
    "freqs_",
    "pooler.",  # BERT pooler head — unused (mean pooling)
    "position_ids",  # registered buffer in some BERT variants
    "logit_scale",  # contrastive temperature — not used at inference
)


class _StrictSD:
    """State-dict view that records consumption and fails loudly on drift."""

    def __init__(self, sd):
        self.sd = {k: v for k, v in sd.items()}
        self.used: set[str] = set()

    def __getitem__(self, k: str):
        if k not in self.sd:
            raise KeyError(
                f"jina-clip conversion: expected checkpoint key {k!r} is missing "
                "— the checkpoint layout drifted from the schema in models/jina.py"
            )
        self.used.add(k)
        return self.sd[k]

    def __contains__(self, k: str) -> bool:
        return k in self.sd

    def finish(self):
        leftover = [
            k
            for k in self.sd
            if k not in self.used
            and not any(m in k for m in _IGNORED_KEY_MARKERS)
        ]
        if leftover:
            raise ValueError(
                "jina-clip conversion: unconverted checkpoint keys (layout "
                f"drift): {sorted(leftover)}"
            )


def jina_config_from_sd(sd) -> JinaClipConfig:
    """Derive tower shapes from the state dict itself (layer count, dims)."""
    import re

    v_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"vision_model\.blocks\.(\d+)\.", k))
    )
    t_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"text_model\.transformer\.encoder\.layer\.(\d+)\.", k))
    )
    pw = _t(sd["vision_model.patch_embed.proj.weight"])  # [D,3,P,P]
    dim, _, patch, _ = pw.shape
    n_pos = _t(sd["vision_model.pos_embed"]).shape[1]
    grid = int(math.isqrt(n_pos - 1))
    head_w = _t(sd["vision_model.head.weight"])  # [proj, D]
    tok = _t(sd["text_model.transformer.embeddings.word_embeddings.weight"])
    gated = _t(sd["text_model.transformer.encoder.layer.0.mlp.gated_layers.weight"])
    w1 = _t(sd["vision_model.blocks.0.mlp.w1.weight"])
    return JinaClipConfig(
        vision=Eva02Config(
            image_size=grid * patch,
            patch_size=patch,
            dim=dim,
            layers=v_layers,
            heads=dim // 64,  # EVA-02 uses 64-d heads throughout
            mlp_dim=w1.shape[0],
            proj_dim=head_w.shape[0],
        ),
        text=JinaBertConfig(
            vocab_size=tok.shape[0],
            dim=tok.shape[1],
            layers=t_layers,
            heads=tok.shape[1] // 64,
            mlp_dim=gated.shape[0] // 2,
        ),
    )


def jina_params_from_hf(sd, cfg: JinaClipConfig) -> Params:
    """Convert a jina-clip-v1 state dict to our param tree. Strict — see the
    schema comment above; raises on any missing or leftover key."""
    s = _StrictSD(sd)

    def vlin(prefix: str) -> dict:
        return {"w": _t(s[f"{prefix}.weight"]).T, "b": _t(s[f"{prefix}.bias"])}

    def vln(prefix: str) -> dict:
        return {"scale": _t(s[f"{prefix}.weight"]), "bias": _t(s[f"{prefix}.bias"])}

    blocks = []
    for i in range(cfg.vision.layers):
        bp = f"vision_model.blocks.{i}"
        blocks.append(
            {
                "ln1": vln(f"{bp}.norm1"),
                "attn": {
                    "q": {
                        "w": _t(s[f"{bp}.attn.q_proj.weight"]).T,
                        "b": _t(s[f"{bp}.attn.q_bias"]),
                    },
                    "k": {"w": _t(s[f"{bp}.attn.k_proj.weight"]).T},
                    "v": {
                        "w": _t(s[f"{bp}.attn.v_proj.weight"]).T,
                        "b": _t(s[f"{bp}.attn.v_bias"]),
                    },
                    "inner_ln": vln(f"{bp}.attn.inner_attn_ln"),
                    "o": vlin(f"{bp}.attn.proj"),
                },
                "ln2": vln(f"{bp}.norm2"),
                "mlp": {
                    "w1": vlin(f"{bp}.mlp.w1"),
                    "w2": vlin(f"{bp}.mlp.w2"),
                    "ffn_ln": vln(f"{bp}.mlp.ffn_ln"),
                    "w3": vlin(f"{bp}.mlp.w3"),
                },
            }
        )
    vision = {
        "patch": {
            "w": _patch_w(_t(s["vision_model.patch_embed.proj.weight"])),
            "b": _t(s["vision_model.patch_embed.proj.bias"]),
        },
        "cls": _t(s["vision_model.cls_token"]).reshape(-1),
        "pos": _t(s["vision_model.pos_embed"])[0],
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
        "final_ln": vln("vision_model.norm"),
        "proj": _t(s["vision_model.head.weight"]).T,
    }
    if "vision_model.head.bias" in s:
        vision["proj_b"] = _t(s["vision_model.head.bias"])

    tp = "text_model.transformer"
    tok = _t(s[f"{tp}.embeddings.word_embeddings.weight"])
    if f"{tp}.embeddings.token_type_embeddings.weight" in s:
        # token_type_ids are always 0 in retrieval encoding — fold row 0 in
        tok = tok + _t(s[f"{tp}.embeddings.token_type_embeddings.weight"])[0]
    tblocks = []
    for i in range(cfg.text.layers):
        lp = f"{tp}.encoder.layer.{i}"
        tblocks.append(
            {
                "attn": {
                    "q": vlin(f"{lp}.attention.self.query"),
                    "k": vlin(f"{lp}.attention.self.key"),
                    "v": vlin(f"{lp}.attention.self.value"),
                    "o": vlin(f"{lp}.attention.output.dense"),
                },
                "attn_ln": vln(f"{lp}.attention.output.LayerNorm"),
                "mlp": {
                    "gated": {"w": _t(s[f"{lp}.mlp.gated_layers.weight"]).T},
                    "out": vlin(f"{lp}.mlp.wo"),
                },
                "mlp_ln": vln(f"{lp}.mlp.layernorm"),
            }
        )
    text = {
        "tok": tok,
        "emb_ln": vln(f"{tp}.embeddings.LayerNorm"),
        "blocks": jax.tree.map(lambda *xs: np.stack(xs), *tblocks),
    }
    s.finish()
    return _to_jnp({"vision": vision, "text": text})


# --- assembly ---------------------------------------------------------------------


def jina_image_fwd(params: Params, cfg: JinaClipConfig, pixels: jax.Array) -> jax.Array:
    return eva02_apply(params["vision"], cfg.vision, pixels)


def jina_text_fwd(
    params: Params, cfg: JinaClipConfig, ids: jax.Array, mask: jax.Array | None
) -> jax.Array:
    return jina_bert_apply(params["text"], cfg.text, ids, mask)


def load_jina(info, dtype=jnp.bfloat16, checkpoint_dir: str | None = None):
    """Load jina-clip-v1 (reference main.py:133, :818-820 loads it via
    trust_remote_code). The strict converter raises with the full
    unmatched-key list on any architecture drift."""
    import torch
    from transformers import AutoModel, AutoTokenizer

    from .convert import cast_params
    from .zoo import LoadedModel

    src = checkpoint_dir or info.hf_id
    hf = AutoModel.from_pretrained(src, torch_dtype=torch.float32, trust_remote_code=True)
    sd = hf.state_dict()
    cfg = jina_config_from_sd(sd)
    params = cast_params(jina_params_from_hf(sd, cfg), dtype)
    del hf

    tok = AutoTokenizer.from_pretrained(src, trust_remote_code=True)

    def tokenize(texts: list[str]):
        out = tok(
            texts,
            padding=True,
            truncation=True,
            max_length=info.text_max_len,
            return_tensors="np",
        )
        return out["input_ids"].astype(np.int32), out["attention_mask"].astype(np.int32)

    return LoadedModel(
        info=info,
        cfg=cfg,
        params=params,
        preprocess=info.preprocess,
        tokenize=tokenize,
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
        weights_provenance="debug-random",
    )
    return model
