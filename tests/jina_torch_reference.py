"""Independent torch reference for Jina-CLIP-v1's towers.

Implemented from the published architecture descriptions (EVA-02 paper +
official `eva02` code structure for vision; the Jina BERT-with-ALiBi GLU
design for text), deliberately WITHOUT importing or mirroring
``multimodal_embedding_tpu/models/jina.py`` — this file is the second,
independent derivation that tests/test_jina.py checks the JAX towers
against. Module attribute names are chosen so ``state_dict()`` emits the
real checkpoint's key layout (see the schema comment in models/jina.py),
which also exercises the strict converter.
"""

from __future__ import annotations

import math

import torch
from torch import nn


# --- EVA-02 vision -----------------------------------------------------------


def vision_rope_tables(grid: int, head_dim: int, theta: float, pt_grid: int):
    """VisionRotaryEmbeddingFast tables (EVA-02 rope.py), dim = head_dim // 2:
    per-axis freqs over arange(0, dim, 2)/dim, positions arange(g)/g*pt_grid,
    each angle repeated twice (interleaved), row block then column block."""
    dim = head_dim // 2
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    t = torch.arange(grid).float() / grid * pt_grid
    ang = torch.einsum("i,j->ij", t, freqs)  # [g, dim//2]
    ang = ang.repeat_interleave(2, dim=-1)  # [g, dim]
    row = ang[:, None, :].expand(grid, grid, dim)
    col = ang[None, :, :].expand(grid, grid, dim)
    full = torch.cat([row, col], dim=-1).reshape(grid * grid, head_dim)
    return full.cos(), full.sin()


def rotate_half_interleaved(x: torch.Tensor) -> torch.Tensor:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x = torch.stack([-x[..., 1], x[..., 0]], dim=-1)
    return x.reshape(*x.shape[:-2], -1)


class Eva02SwiGLU(nn.Module):
    def __init__(self, dim: int, hidden: int, eps: float):
        super().__init__()
        self.w1 = nn.Linear(dim, hidden)
        self.w2 = nn.Linear(dim, hidden)
        self.ffn_ln = nn.LayerNorm(hidden, eps=eps)
        self.w3 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w3(self.ffn_ln(torch.nn.functional.silu(self.w1(x)) * self.w2(x)))


class Eva02Attention(nn.Module):
    def __init__(self, dim: int, heads: int, eps: float):
        super().__init__()
        self.heads = heads
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.inner_attn_ln = nn.LayerNorm(dim, eps=eps)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, rope_cos, rope_sin):
        b, n, d = x.shape
        dh = d // self.heads
        q = torch.nn.functional.linear(x, self.q_proj.weight, self.q_bias)
        k = torch.nn.functional.linear(x, self.k_proj.weight, None)
        v = torch.nn.functional.linear(x, self.v_proj.weight, self.v_bias)
        q = q.reshape(b, n, self.heads, dh).permute(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, dh).permute(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, dh).permute(0, 2, 1, 3)

        def rope(t):  # cls token (index 0) is not rotated
            patches = t[:, :, 1:, :]
            rotated = patches * rope_cos + rotate_half_interleaved(patches) * rope_sin
            return torch.cat([t[:, :, :1, :], rotated], dim=2)

        q, k = rope(q), rope(k)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(dh)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, d)
        return self.proj(self.inner_attn_ln(out))


class Eva02Block(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_dim: int, eps: float):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = Eva02Attention(dim, heads, eps)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = Eva02SwiGLU(dim, mlp_dim, eps)

    def forward(self, x, cos, sin):
        x = x + self.attn(self.norm1(x), cos, sin)
        return x + self.mlp(self.norm2(x))


class Eva02Torch(nn.Module):
    def __init__(
        self,
        image_size: int,
        patch_size: int,
        dim: int,
        layers: int,
        heads: int,
        mlp_dim: int,
        proj_dim: int,
        eps: float = 1e-6,
        rope_theta: float = 10000.0,
        rope_pt_grid: int = 16,
    ):
        super().__init__()
        grid = image_size // patch_size
        self.grid, self.heads = grid, heads
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
        self.blocks = nn.ModuleList(
            Eva02Block(dim, heads, mlp_dim, eps) for _ in range(layers)
        )
        self.norm = nn.LayerNorm(dim, eps=eps)
        self.head = nn.Linear(dim, proj_dim)
        cos, sin = vision_rope_tables(grid, dim // heads, rope_theta, rope_pt_grid)
        self.register_buffer("rope_cos", cos, persistent=False)
        self.register_buffer("rope_sin", sin, persistent=False)

    def forward(self, pixels_nchw: torch.Tensor) -> torch.Tensor:
        x = self.patch_embed.proj(pixels_nchw)  # [B, D, g, g]
        x = x.flatten(2).transpose(1, 2)  # [B, N, D]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x, self.rope_cos, self.rope_sin)
        x = self.norm(x)
        return self.head(x[:, 0])


# --- Jina BERT text ------------------------------------------------------------


def alibi_bias(heads: int, t: int) -> torch.Tensor:
    """Symmetric ALiBi: -slope_h * |i - j| (Press et al. geometric slopes)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(heads).is_integer():
        slopes = pow2_slopes(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        slopes = pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: heads - closest]
    dist = (torch.arange(t)[:, None] - torch.arange(t)[None, :]).abs().float()
    return -torch.tensor(slopes)[:, None, None] * dist[None]


class JinaBertSelfAttention(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        self.self = nn.Module()
        self.self.query = nn.Linear(dim, dim)
        self.self.key = nn.Linear(dim, dim)
        self.self.value = nn.Linear(dim, dim)
        self.output = nn.Module()
        self.output.dense = nn.Linear(dim, dim)
        self.output.LayerNorm = nn.LayerNorm(dim, eps=1e-12)

    def forward(self, x, bias, key_mask):
        b, t, d = x.shape
        dh = d // self.heads
        q = self.self.query(x).reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        k = self.self.key(x).reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        v = self.self.value(x).reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        logits = (q @ k.transpose(-2, -1)) / math.sqrt(dh) + bias[None]
        logits = logits.masked_fill(~key_mask[:, None, None, :], float(-1e30))
        out = (logits.softmax(dim=-1) @ v).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.output.LayerNorm(x + self.output.dense(out))


class JinaBertGLUMLP(nn.Module):
    def __init__(self, dim: int, mlp_dim: int):
        super().__init__()
        self.gated_layers = nn.Linear(dim, 2 * mlp_dim, bias=False)
        self.wo = nn.Linear(mlp_dim, dim)
        self.layernorm = nn.LayerNorm(dim, eps=1e-12)

    def forward(self, x):
        gated = self.gated_layers(x)
        g, u = gated.chunk(2, dim=-1)
        ff = torch.nn.functional.gelu(g, approximate="none") * u
        return self.layernorm(x + self.wo(ff))


class JinaBertLayer(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_dim: int):
        super().__init__()
        self.attention = JinaBertSelfAttention(dim, heads)
        self.mlp = JinaBertGLUMLP(dim, mlp_dim)

    def forward(self, x, bias, key_mask):
        return self.mlp(self.attention(x, bias, key_mask))


class JinaBertTorch(nn.Module):
    def __init__(self, vocab: int, dim: int, layers: int, heads: int, mlp_dim: int):
        super().__init__()
        self.heads = heads
        self.embeddings = nn.Module()
        self.embeddings.word_embeddings = nn.Embedding(vocab, dim)
        self.embeddings.token_type_embeddings = nn.Embedding(2, dim)
        self.embeddings.LayerNorm = nn.LayerNorm(dim, eps=1e-12)
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList(
            JinaBertLayer(dim, heads, mlp_dim) for _ in range(layers)
        )
        # present in the real checkpoint but unused by retrieval (mean pooling)
        self.pooler = nn.Module()
        self.pooler.dense = nn.Linear(dim, dim)

    def forward(self, ids: torch.Tensor, mask: torch.Tensor) -> torch.Tensor:
        tte = self.embeddings.token_type_embeddings(torch.zeros_like(ids))
        x = self.embeddings.word_embeddings(ids) + tte
        x = self.embeddings.LayerNorm(x)
        bias = alibi_bias(self.heads, ids.shape[1])
        key_mask = mask.bool()
        for layer in self.encoder.layer:
            x = layer(x, bias, key_mask)
        m = mask.float()[:, :, None]
        return (x * m).sum(1) / m.sum(1).clamp(min=1.0)


class JinaClipTorch(nn.Module):
    """Assembled reference whose state_dict() matches the checkpoint layout."""

    def __init__(self, vision: Eva02Torch, bert: JinaBertTorch):
        super().__init__()
        self.vision_model = vision
        self.text_model = nn.Module()
        self.text_model.transformer = bert

    def encode_image(self, pixels_nchw):
        return self.vision_model(pixels_nchw)

    def encode_text(self, ids, mask):
        return self.text_model.transformer(ids, mask)
