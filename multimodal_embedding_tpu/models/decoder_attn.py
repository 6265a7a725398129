"""Shared grouped-query attention core for the decoder LMs (Gemma, Qwen3).

Takes already-projected (and rope'd / head-normed) q/k/v in [B, T, H, Dh]
layout and dispatches to the measured-fastest implementation for the shape
(PERF.md crossovers, models/layers.attention_impl_for):

- sequence parallelism over the mesh model axis when enabled and divisible,
- the fused Pallas softmax-in-VMEM kernel for long lane-clean sequences,
- XLA einsum attention (bf16 or f32 logits) otherwise.

Each decoder applies its own output projection on the returned [B, T, H*Dh].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grouped_attention(
    q: jax.Array,  # [B, T, H, Dh]
    k: jax.Array,  # [B, T, KVH, Dh]
    v: jax.Array,  # [B, T, KVH, Dh]
    *,
    key_mask: jax.Array,  # [B, T] bool, True = attend
    causal: bool,
    sm_scale: float,
) -> jax.Array:
    """Self-attention over grouped heads -> [B, T, H*Dh] (input dtype)."""
    import math

    from .layers import attention_impl_for, attention_interpret, get_sp_mesh

    b, t, heads, dh = q.shape
    kv_heads = k.shape[2]

    sp = get_sp_mesh()
    if sp is not None:
        from ..parallel.mesh import MODEL_AXIS

        if t % int(sp.shape[MODEL_AXIS]) == 0:
            # sequence parallelism (--sequence-parallel): the token dim is
            # sharded over the model axis — projections/rope are token-local,
            # attention all-gathers K/V over ICI inside the shard_map
            # (parallel/sp.py). Shapes that don't divide the axis fall
            # through to the single-chip paths.
            from ..parallel.sp import sp_attention

            out = sp_attention(
                jnp.swapaxes(q, 1, 2),
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                sp,
                key_mask=key_mask,
                causal=causal,
                sm_scale=sm_scale,
            )
            return jnp.swapaxes(out, 1, 2).astype(q.dtype).reshape(b, t, heads * dh)

    impl = attention_impl_for(dh, t)
    if impl == "pallas":
        from ..ops.attention_pallas import fused_attention

        hpb = math.lcm(dh, 128) // dh  # heads per 128-lane block
        if heads % hpb == 0 and (kv_heads == heads or hpb == 1):
            # lane-tile-aligned head dim: the kernel takes the packed
            # [B, T, H*Dh] projection layout — the flattening reshapes fuse
            # into the rope epilogue instead of materializing transposes
            out = fused_attention(
                q.reshape(b, t, heads * dh),
                k.reshape(b, t, kv_heads * dh),
                v.reshape(b, t, kv_heads * dh),
                key_mask=key_mask,
                causal=causal,
                sm_scale=sm_scale,
                interpret=attention_interpret(),
                layout="packed",
                num_heads=heads,
                num_kv_heads=kv_heads,
            )
            return out.astype(q.dtype)
        # tiny/debug head dims: transposed layout
        out = fused_attention(
            jnp.swapaxes(q, 1, 2),
            jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2),
            key_mask=key_mask,
            causal=causal,
            sm_scale=sm_scale,
            interpret=attention_interpret(),
        )
        return jnp.swapaxes(out, 1, 2).astype(q.dtype).reshape(b, t, heads * dh)

    mask = jnp.broadcast_to(key_mask[:, None, :], (b, t, t))
    if causal:
        mask = mask & jnp.tril(jnp.ones((t, t), bool))[None]

    g = heads // kv_heads  # query heads per kv head
    qg = q.reshape(b, t, kv_heads, g, dh)
    if impl == "xla_bf16":
        # bf16 logits (torch-autocast numerics): halves the dominant HBM
        # traffic of long-sequence attention matrices
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k).astype(jnp.float32)
    else:
        logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    logits = logits * sm_scale
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", attn, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, t, heads * dh)
