"""Sequence/context parallelism over the mesh's ``model`` axis.

The reference is single-GPU (SURVEY.md §2.4 — no distributed code at all);
on TPU, sequence parallelism is the idiomatic way to put more than
``batch_size`` chips on ColPali's long-sequence Gemma forward (1030
image-prefix tokens per image, §5.7): shard the *token* dim of the
activations across the model axis, all-gather K/V over ICI inside the
attention (cheap: K/V for 1030 tokens x 256 head_dim is ~2 MB/layer in
bf16), and keep every other op purely local because layernorms/MLPs are
token-independent.

Built with ``shard_map`` so the collective placement is explicit; the local
attention body matches the XLA SDPA numerics of ``layers.mha`` (f32 QK^T
accumulation, f32 softmax, finite -1e30 masking). Causal masking stays
correct under sharding by offsetting query row indices with the shard's
``axis_index``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

NEG_INF = -1e30


def sp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    key_mask: jax.Array | None = None,
    causal: bool = False,
    sm_scale: float | None = None,
    axis: str = MODEL_AXIS,
) -> jax.Array:
    """Sequence-parallel SDPA. q/k/v [B, H, T, Dh] with T sharded over
    ``axis`` (T must divide the axis size); key_mask [B, T]. Returns
    [B, H, T, Dh] sharded the same way as q.

    Grouped-query attention is supported (k/v heads dividing q heads).
    """
    b, h, t, dh = q.shape
    kvh = k.shape[1]
    assert h % kvh == 0, (h, kvh)
    n = int(mesh.shape[axis])
    assert t % n == 0, f"{axis} axis size {n} must divide sequence {t}"
    scale = 1.0 / math.sqrt(dh) if sm_scale is None else sm_scale
    shard_t = t // n

    def local(qb, kb, vb, km=None):
        idx = jax.lax.axis_index(axis)
        kf = jax.lax.all_gather(kb, axis, axis=2, tiled=True)  # [bl,kvh,T,dh]
        vf = jax.lax.all_gather(vb, axis, axis=2, tiled=True)
        g = h // kvh
        bl = qb.shape[0]  # local batch (b / data-axis shard when composed with DP)
        qg = qb.reshape(bl, kvh, g, shard_t, dh)
        logits = jnp.einsum(
            "bkgqd,bkKd->bkgqK", qg, kf, preferred_element_type=jnp.float32
        )
        logits = logits * scale  # [b, kvh, g, shard_t, T]
        if km is not None:
            kmf = jax.lax.all_gather(km, axis, axis=1, tiled=True)  # [b, T]
            logits = jnp.where(kmf[:, None, None, None, :], logits, NEG_INF)
        if causal:
            row = idx * shard_t + jax.lax.broadcasted_iota(
                jnp.int32, (shard_t, t), 0
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (shard_t, t), 1)
            logits = jnp.where((col <= row)[None, None, None], logits, NEG_INF)
        attn = jax.nn.softmax(logits, axis=-1).astype(vf.dtype)
        out = jnp.einsum(
            "bkgqK,bkKd->bkgqd", attn, vf, preferred_element_type=jnp.float32
        )
        return out.reshape(bl, h, shard_t, dh).astype(qb.dtype)

    # batch rides the data axis (composes with data parallelism when the
    # mesh has one and the batch divides it), tokens ride the model axis
    from .mesh import DATA_AXIS

    n_data = int(mesh.shape.get(DATA_AXIS, 1))
    batch_axis = DATA_AXIS if (DATA_AXIS in mesh.shape and b % max(n_data, 1) == 0 and n_data > 1) else None
    seq_spec = P(batch_axis, None, axis, None)
    mask_specs = (P(batch_axis, axis),) if key_mask is not None else ()
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec) + mask_specs,
        out_specs=seq_spec,
    )
    args = (q, k, v) + ((key_mask,) if key_mask is not None else ())
    return fn(*args)


def sp_shardings(mesh: Mesh, axis: str = MODEL_AXIS):
    """(activation, mask) NamedShardings for sequence-sharded [B,H,T,D] /
    [B,T] operands."""
    return (
        NamedSharding(mesh, P(None, None, axis, None)),
        NamedSharding(mesh, P(None, axis)),
    )
