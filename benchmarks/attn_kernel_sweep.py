"""Sweep fused-attention kernel block sizes on tower-shaped inputs (real TPU).

Times just the attention op (QK^T + softmax + PV) for ViT-L (B,16,577,64)
and Gemma/ColPali (B,8 q-heads over 1 kv-head,1030,256) shapes, comparing the
XLA SDPA against the fused kernel at several query-block sizes.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=8):
    import jax

    from multimodal_embedding_tpu.utils.timing import hard_sync

    out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_embedding_tpu.ops.attention_pallas import fused_attention

    print(f"backend: {jax.default_backend()}")

    def xla_sdpa(q, k, v):
        h, kvh = q.shape[1], k.shape[1]
        kk = jnp.repeat(k, h // kvh, axis=1) if kvh != h else k
        vv = jnp.repeat(v, h // kvh, axis=1) if kvh != h else v
        logits = (jnp.einsum("bhqd,bhkd->bhqk", q, kk) / np.sqrt(q.shape[-1])).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, vv)

    cases = [
        ("ViT-L b32", (32, 16, 16, 577, 64)),
        ("ViT-L b64", (64, 16, 16, 577, 64)),
        ("Gemma b4", (4, 8, 1, 1030, 256)),
        ("Gemma b16", (16, 8, 1, 1030, 256)),
    ]
    for name, (b, h, kvh, t, dh) in cases:
        ks = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(ks[0], (b, h, t, dh), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, kvh, t, dh), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, kvh, t, dh), jnp.bfloat16)
        flops = 4 * b * h * t * t * dh

        dt = bench(jax.jit(xla_sdpa), q, k, v)
        print(f"{name}: xla_bf16 sdpa  {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")
        for bq in (None, 128, 256, 512):
            try:
                f = lambda q, k, v: fused_attention(q, k, v, block_q=bq)
                dt = bench(f, q, k, v)
                print(f"{name}: pallas bq={str(bq):4s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")
            except Exception as e:
                print(f"{name}: pallas bq={bq}: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
