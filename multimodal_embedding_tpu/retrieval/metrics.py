"""On-device rank/recall metrics (reference main.py:305-383, v28:203-229).

The reference computes Recall@K with a python loop calling ``torch.topk`` per
query row. On TPU the equivalent is rank counting, fully vectorized: the
rank of the target among the gallery equals

    rank = #(scores > target_score) + #(scores == target_score AND col < target_col)

which reproduces ``torch.topk``'s deterministic tie-breaking (ties ordered by
ascending index) — ``target in topk(k)`` iff ``rank < k``. This turns each
metric into one masked reduction over the score matrix, no sort needed.

Multi-caption I2T ("ANY of the image's 5 captions in top-k", reference
main.py:360-368) is the min of the 5 per-caption ranks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_KS = (1, 5, 10)


def ranks_from_scores(scores: jax.Array, target_idx: jax.Array) -> jax.Array:
    """scores [NQ, ND] f32, target_idx [NQ] -> int32 ranks [NQ] (0-based)."""
    nq, nd = scores.shape
    tgt = jnp.take_along_axis(scores, target_idx[:, None], axis=1)  # [NQ, 1]
    cols = jnp.arange(nd)[None, :]
    greater = scores > tgt
    tie_before = (scores == tgt) & (cols < target_idx[:, None])
    return jnp.sum(greater | tie_before, axis=1).astype(jnp.int32)


def multi_target_ranks(scores: jax.Array, target_cols: jax.Array) -> jax.Array:
    """Best (minimum) rank over multiple targets per query.

    scores [NQ, ND]; target_cols [NQ, M] column indices of the M valid targets
    per query. Returns int32 [NQ].
    """
    nq, nd = scores.shape
    m = target_cols.shape[1]
    tgt = jnp.take_along_axis(scores, target_cols, axis=1)  # [NQ, M]
    cols = jnp.arange(nd)[None, :, None]  # [1, ND, 1]
    s = scores[:, :, None]  # [NQ, ND, 1]
    t = tgt[:, None, :]  # [NQ, 1, M]
    greater = s > t
    tie_before = (s == t) & (cols < target_cols[:, None, :])
    ranks = jnp.sum(greater | tie_before, axis=1)  # [NQ, M]
    return jnp.min(ranks, axis=1).astype(jnp.int32)


def recall_at_k(ranks: jax.Array, k: int) -> jax.Array:
    """Percentage of queries whose target rank < k (reference reports %)."""
    return 100.0 * jnp.mean((ranks < k).astype(jnp.float32))


def mrr(ranks: jax.Array) -> jax.Array:
    """Mean reciprocal rank (the v15-v19 metric, reference v15:82-98)."""
    return jnp.mean(1.0 / (1.0 + ranks.astype(jnp.float32)))


def compute_metrics(
    scores_t2i: jax.Array,
    scores_i2t: jax.Array,
    scores_i2t_sym: jax.Array | None = None,
    ks: tuple[int, ...] = DEFAULT_KS,
    include_mrr: bool = False,
    caps_per_image: int = 5,
) -> dict[str, float]:
    """Single-pass (non-bootstrap) metrics, v28 protocol.

    scores_t2i: [N_caps, N_img], query i targets image i (first-caption
    protocol, reference main.py:520).
    scores_i2t: [N_img, 5*N_img], image i targets captions 5i..5i+4.
    scores_i2t_sym: [N_img, N_caps] (T2I transposed), image i targets caption i.
    """
    n = scores_t2i.shape[0]
    diag = jnp.arange(n)
    out: dict[str, float] = {}

    r_t2i = ranks_from_scores(scores_t2i, diag)
    n_img = scores_t2i.shape[1]
    for k in ks:
        out[f"T2I_R@{k}"] = float(recall_at_k(r_t2i, min(k, n_img)))
    if include_mrr:
        out["T2I_MRR"] = float(mrr(r_t2i))

    cap_groups = diag[:, None] * caps_per_image + jnp.arange(caps_per_image)[None, :]
    r_i2t = multi_target_ranks(scores_i2t, cap_groups)
    for k in ks:
        out[f"I2T_R@{k}"] = float(recall_at_k(r_i2t, min(k, scores_i2t.shape[1])))
    if include_mrr:
        out["I2T_MRR"] = float(mrr(r_i2t))

    if scores_i2t_sym is not None:
        r_sym = ranks_from_scores(scores_i2t_sym, diag)
        for k in ks:
            out[f"I2T_Sym_R@{k}"] = float(recall_at_k(r_sym, min(k, scores_i2t_sym.shape[1])))

    return out
