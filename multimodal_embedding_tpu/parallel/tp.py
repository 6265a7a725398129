"""Tensor parallelism over the mesh's ``model`` axis (Megatron-style).

The reference is single-GPU, so TP has no counterpart there (SURVEY.md §2.4);
on TPU it is the idiomatic second mesh axis: attention q/k/v and the MLP
up-projection are column-split (each chip holds a head/hidden shard), the
output projections are row-split (contraction sharded, GSPMD inserts the
psum), everything else replicates. Shardings are expressed purely as
``NamedSharding`` annotations on the parameter pytree — the forward functions
are unchanged and XLA's GSPMD partitioner derives the collectives, per the
scaling-book recipe (annotate, compile, let XLA place the all-reduces on ICI).

Applies uniformly to the dual-encoder towers (layers.py param naming:
``{q,k,v,fc1}/{w,b}`` column, ``{o,fc2}/w`` row) and to the Gemma decoder
(raw arrays named ``q/k/v/gate/up`` column, ``o/down`` row). Dimensions not
divisible by the model-axis size fall back to replication — sharding is an
optimization, never a correctness constraint.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# linear-param dict names (layers.py): {name: {"w": [.., d_in, d_out], "b": [.., d_out]}}
_COL_PARENTS = frozenset({"q", "k", "v", "fc1"})
_ROW_PARENTS = frozenset({"o", "fc2"})
# raw-array names (gemma.py): {name: [.., d_in, d_out]}
_COL_LEAVES = frozenset({"q", "k", "v", "gate", "up", "fc1"})
_ROW_LEAVES = frozenset({"o", "down", "fc2"})


def _path_names(path) -> list[str]:
    return [str(p.key) for p in path if hasattr(p, "key")]


def tp_specs(params, n_model: int):
    """PartitionSpec pytree for Megatron column/row TP at ``n_model`` shards."""

    def one(path, leaf):
        names = _path_names(path)
        rep = P()
        if leaf.ndim < 1 or not names:
            return rep
        name = names[-1]
        parent = names[-2] if len(names) >= 2 else ""

        def col():  # split the output (last) dim
            if leaf.shape[-1] % n_model:
                return rep
            return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)

        def row():  # split the contraction (second-to-last) dim
            if leaf.ndim < 2 or leaf.shape[-2] % n_model:
                return rep
            return P(*([None] * (leaf.ndim - 2)), MODEL_AXIS, None)

        if name == "w" and parent in _COL_PARENTS:
            return col()
        if name == "b" and parent in _COL_PARENTS:
            return col()
        if name == "w" and parent in _ROW_PARENTS:
            return row()
        if name in _COL_LEAVES and leaf.ndim >= 2:
            return col()
        if name in _ROW_LEAVES and leaf.ndim >= 2:
            return row()
        return rep

    return jax.tree_util.tree_map_with_path(one, params)


def tp_shardings(params, mesh: Mesh):
    """NamedSharding pytree for ``params`` on ``mesh`` (model-axis TP)."""
    n_model = int(mesh.shape[MODEL_AXIS])
    return jax.tree.map(lambda s: NamedSharding(mesh, s), tp_specs(params, n_model))


def shard_params_tp(params, mesh: Mesh):
    """Place ``params`` on ``mesh`` with TP shardings (replicated if the
    model axis is 1 — same layout the data-parallel path uses)."""
    return jax.device_put(params, tp_shardings(params, mesh))
