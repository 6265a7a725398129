"""Similarity scoring engine (reference main.py:440-475, v28:390-391).

Dense: a single f32 cosine matmul on the MXU (embeddings are already
L2-normalized by the encode pipeline). Sharded along queries over the data
mesh axis when a mesh is provided — the 25k x 5k COCO matrix is ~0.26 TFLOP,
microseconds per chip.

Late interaction (ColPali): the tiled Pallas MaxSim kernel (ops/maxsim.py),
replacing the reference's host-chunked ``processor.score`` double loop.

Orientation note: scores are [n_queries, n_docs]. The reference v29 applies a
spurious final ``.t()`` to its I2T matrix (main.py:623) which breaks its own
metric indexing (the v28 lineage, v28:391, and the published numbers use
[n_img, n_caps] with no transpose); we follow the correct v28 orientation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.maxsim import maxsim_scores


def dense_scores(
    queries: jax.Array, docs: jax.Array, mesh: Mesh | None = None
) -> jax.Array:
    """[NQ, E] x [ND, E] -> [NQ, ND] float32 similarity."""
    qf = queries.astype(jnp.float32)
    df = docs.astype(jnp.float32)
    if mesh is not None:
        qf = jax.device_put(qf, NamedSharding(mesh, P("data", None)))
        df = jax.device_put(df, NamedSharding(mesh, P()))
    return jnp.dot(qf, df.T, preferred_element_type=jnp.float32)


def late_interaction_scores(
    q: jax.Array,
    d: jax.Array,
    q_mask: jax.Array | None = None,
    d_mask: jax.Array | None = None,
    *,
    impl: str = "auto",
    mesh: Mesh | None = None,
) -> jax.Array:
    """Multi-vector MaxSim scores [NQ, ND] float32 (query-sharded over the
    mesh's data axis when one is provided)."""
    return maxsim_scores(q, d, q_mask, d_mask, impl=impl, mesh=mesh)
