"""Retrieval search API: top-k queries against an embedding index.

Production counterpart to the benchmark's scoring stage: load an index
written by ``cli/encode_cli.py`` (or build one in memory), encode queries
with the same model, and return top-k documents via on-device matmul +
``lax.top_k`` (or the Pallas MaxSim kernel for multi-vector indexes).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.maxsim import maxsim_scores


@dataclass
class Index:
    embeddings: jax.Array  # [N, E] or [N, T, D] (multi-vector)
    ids: np.ndarray  # [N] document ids
    multi_vector: bool = False

    @classmethod
    def from_npz(cls, path: str, field: str = "image_embeddings", ids_field: str = "imgids"):
        data = np.load(path)
        emb = jnp.asarray(data[field])
        return cls(embeddings=emb, ids=np.asarray(data[ids_field]), multi_vector=emb.ndim == 3)

    def search(
        self, queries: jax.Array, k: int = 10, query_mask: jax.Array | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """queries [Q, E] (or [Q, T, D] multi-vector) -> (ids [Q, k], scores
        [Q, k]), best first."""
        if self.multi_vector:
            scores = maxsim_scores(queries, self.embeddings, q_mask=query_mask)
        else:
            scores = jnp.dot(
                queries.astype(jnp.float32),
                self.embeddings.astype(jnp.float32).T,
                preferred_element_type=jnp.float32,
            )
        k = min(k, scores.shape[1])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return self.ids[np.asarray(top_idx)], np.asarray(top_scores)


def search_texts(
    model, engine, index: Index, texts: list[str], k: int = 10
) -> list[list[tuple]]:
    """Encode text queries with the model's engine and search the index.
    Returns per-query [(doc_id, score), ...]."""
    res = engine.encode_texts(texts)
    ids, scores = index.search(res.embeddings, k=k, query_mask=res.mask)
    return [
        [(ids[q, j], float(scores[q, j])) for j in range(ids.shape[1])]
        for q in range(len(texts))
    ]
