"""Rank-counting metrics vs brute-force torch.topk-semantics emulation."""

import numpy as np
import jax.numpy as jnp

from multimodal_embedding_tpu.retrieval.metrics import (
    compute_metrics,
    mrr,
    multi_target_ranks,
    ranks_from_scores,
)


def _topk_position(row: np.ndarray, target: int) -> int:
    """Position of `target` in descending sort with ties broken by ascending
    index — torch.topk's deterministic order."""
    order = np.lexsort((np.arange(len(row)), -row))
    return int(np.where(order == target)[0][0])


def test_ranks_match_topk_semantics(rng):
    scores = rng.standard_normal((20, 15)).astype(np.float32)
    # inject exact ties
    scores[3, 4] = scores[3, 9]
    scores[7, 0] = scores[7, 14] = scores[7, 7]
    targets = rng.integers(0, 15, size=20)
    ranks = np.asarray(ranks_from_scores(jnp.asarray(scores), jnp.asarray(targets)))
    for i in range(20):
        assert ranks[i] == _topk_position(scores[i], targets[i]), i


def test_multi_target_ranks(rng):
    scores = rng.standard_normal((10, 50)).astype(np.float32)
    groups = np.stack([np.arange(5) + 5 * i for i in range(10)])
    ranks = np.asarray(multi_target_ranks(jnp.asarray(scores), jnp.asarray(groups)))
    for i in range(10):
        best = min(_topk_position(scores[i], t) for t in groups[i])
        assert ranks[i] == best


def test_compute_metrics_matches_reference_loop(rng):
    """Full-protocol check against a faithful reimplementation of the
    reference metric loops (v28:203-229 + v29 symmetric protocol)."""
    n = 30
    s_t2i = rng.standard_normal((n, n)).astype(np.float32)
    s_i2t = rng.standard_normal((n, 5 * n)).astype(np.float32)

    got = compute_metrics(jnp.asarray(s_t2i), jnp.asarray(s_i2t), jnp.asarray(s_t2i.T))

    for k in (1, 5, 10):
        t2i = sum(_topk_position(s_t2i[i], i) < k for i in range(n)) / n * 100
        i2t = (
            sum(
                any(_topk_position(s_i2t[i], 5 * i + t) < k for t in range(5))
                for i in range(n)
            )
            / n
            * 100
        )
        sym = sum(_topk_position(s_t2i.T[i], i) < k for i in range(n)) / n * 100
        assert abs(got[f"T2I_R@{k}"] - t2i) < 1e-4
        assert abs(got[f"I2T_R@{k}"] - i2t) < 1e-4
        assert abs(got[f"I2T_Sym_R@{k}"] - sym) < 1e-4


def test_mrr():
    ranks = jnp.asarray([0, 1, 4, 9])
    assert abs(float(mrr(ranks)) - np.mean([1.0, 0.5, 0.2, 0.1])) < 1e-6
