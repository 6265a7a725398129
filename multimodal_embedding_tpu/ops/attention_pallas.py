"""Fused softmax-in-VMEM attention kernel for the encoder/decoder towers.

Motivation (measured in PERF.md): at ViT-L scale (seq 577, head_dim 64) the
XLA SDPA materializes the [B, H, T, T] logits and attention-probability
tensors in HBM — for batch 32 that is ~0.7 GB of float32 written + re-read
*per layer*, which roughly doubles layer latency versus the pure-matmul
roofline and pins the image towers at ~40% MFU. The official Pallas flash
kernel is slower still at this scale (online-softmax bookkeeping + padding
for logits that are only ~1.3 MB/head).

This kernel takes the third design point: the full logits row block fits in
VMEM at these sequence lengths, so compute QK^T -> masked f32 softmax ->
(P)V per (batch, head, query-block) grid cell without ever writing logits to
HBM. No online softmax, no rescaling passes — one MXU matmul, a VPU softmax
in registers/VMEM, one MXU matmul, write [BQ, Dh].

Semantics match ``layers.mha`` / ``gemma._attn`` XLA paths exactly:
f32 QK^T accumulation, f32 softmax with finite ``-1e30`` masking, probability
cast to the value dtype before the PV matmul (reference torch models run
softmax in f32 under bf16 autocast the same way, reference main.py:93).

Supports:
- self or cross attention (Tq != Tk)
- grouped/multi-query attention (kv_heads divides heads — Gemma MQA)
- a dynamic key-validity mask [B, Tk] plus a static causal flag
  (every mask the model zoo builds is separable into these two)

Used for all tower self-attention via ``--attention-impl pallas``
(layers.set_attention_impl); the XLA paths remain for CPU tests and parity.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    block_q: int,
    has_km: bool,
):
    """One (batch, head, query-block) grid cell.

    refs (in order):
    q_ref: [1, 1, BQ, Dh]   query rows (model dtype)
    k_ref: [1, 1, Tk, Dh]   all keys for this (batch, kv-head)
    v_ref: [1, 1, Tk, Dh]   all values
    km_ref: [1, 1, Tk]      int32 key-validity mask, only when has_km (the
                            middle singleton keeps the block TPU-tileable)
    o_ref: [1, 1, BQ, Dh]   output rows

    VPU-lean by construction: the scale multiply is fused into the mask
    select (or the exp when no mask is needed), and the softmax divide is a
    per-row reciprocal broadcast-multiplied — elementwise division over the
    [BQ, Tk] block measured ~2x the cost of the whole exp pass.
    """
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    km_ref = refs[3] if has_km else None
    o_ref = refs[-1]
    iq = pl.program_id(2)

    out = _attn_core(
        q_ref[0, 0],
        k_ref[0, 0],
        v_ref[0, 0],
        km_ref[0] if has_km else None,
        iq,
        sm_scale=sm_scale,
        causal=causal,
        block_q=block_q,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_core(q, k, v, km, iq, *, sm_scale, causal, block_q):
    """Softmax attention of one query block against all keys.

    q [BQ, Dh]; k, v [Tk, Dh]; km [1, Tk] int or None; iq = q-block index.
    Returns [BQ, Dh] f32.

    VPU economy (the [BQ, Tk] block is ~9x the size of anything [BQ, Dh], so
    every whole-block elementwise pass matters):
    - the softmax scale folds into the max-subtract:
      softmax(s*l) = exp(s*(l - max(l))) / sum — no standalone scale pass;
    - the denominator rescale happens AFTER the PV matmul on the [BQ, Dh]
      output (linearity of the matmul), not on the [BQ, Tk] probabilities.
    """
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    has_km = km is not None
    valid = None
    if has_km or causal:
        if has_km:
            valid = km != 0  # [1, Tk] broadcasts over rows
        if causal:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
            cm = col <= row
            valid = cm if valid is None else valid & cm
        logits = jnp.where(valid, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    # masked entries: (NEG_INF - m) * s is hugely negative -> exp == 0; a
    # fully-masked row has m == NEG_INF and exp(0) == 1 everywhere, zeroed
    # by the any_valid factor below
    p = jnp.exp((logits - m) * sm_scale)
    denom = jnp.sum(p, axis=-1, keepdims=True)  # [BQ, 1]
    if valid is not None:
        # Fully-masked rows (left-padded queries under causal masking) get
        # exact zeros — deterministic, and confined to positions every
        # downstream consumer masks out. (XLA leaves a uniform average.)
        any_valid = jnp.max(valid.astype(jnp.float32), axis=-1, keepdims=True)
        r = any_valid / denom
    else:
        r = 1.0 / denom

    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out * r  # deferred softmax denominator, on the small block


def _attn_kernel_packed(
    *refs, sm_scale: float, causal: bool, block_q: int, has_km: bool,
    hpb: int, dh: int,
):
    """One (batch, head-group, query-block) grid cell in the packed
    [B, T, H*Dh] layout: the lane-tile-aligned trailing block carries
    ``hpb = lcm(Dh, 128) / Dh`` heads side by side (2 for Dh=64; 1 for a
    lane-aligned Dh >= 128, which then spans Dh/128 lane tiles), so the
    kernel consumes the projection output with zero relayout copies AND
    zero HBM lane padding (a [B, H, T, 64] operand tile-pads its trailing
    dim to 128 — 2x bytes).

    q_ref: [1, BQ, hpb*Dh]; k_ref/v_ref: [1, Tk, hpb*Dh] (for grouped-query
    attention — hpb == 1 only — the kv block holds the shared kv head);
    km_ref: [1, 1, Tk] when has_km; o_ref: [1, BQ, hpb*Dh].
    """
    q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
    km_ref = refs[3] if has_km else None
    o_ref = refs[-1]
    iq = pl.program_id(2)

    q2 = q_ref[0]  # [BQ, hpb*Dh]
    k2 = k_ref[0]
    v2 = v_ref[0]
    km = km_ref[0] if has_km else None
    for j in range(hpb):  # static lane slices within the 128-lane group
        sl = slice(j * dh, (j + 1) * dh)
        out = _attn_core(
            q2[:, sl], k2[:, sl], v2[:, sl], km, iq,
            sm_scale=sm_scale, causal=causal, block_q=block_q,
        )
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


# VMEM budget for the f32 logits + low-precision probability block per grid
# cell (v5e VMEM is 16 MB less double-buffered k/v tiles).
_LOGITS_VMEM_BUDGET = 6 * 2**20


def _sdpa_reference(q, k, v, km, *, causal: bool, sm_scale: float):
    """Differentiable XLA twin of the kernel ([B, H, Tq, Dh] layout, same
    numerics: f32 logits, finite masking, f32 softmax, probs cast to the
    value dtype). Backs the kernel's custom_vjp — the backward pass
    recomputes through this instead of saving logits, so training through
    the fused forward costs no extra HBM residuals."""
    b, h, tq, dh = q.shape
    kvh = k.shape[1]
    if kvh != h:
        k = jnp.repeat(k, h // kvh, axis=1)
        v = jnp.repeat(v, h // kvh, axis=1)
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    )
    valid = None
    if km is not None:
        valid = jnp.broadcast_to(km[:, None, None, :].astype(bool), logits.shape)
    if causal:
        cm = jnp.broadcast_to(jnp.tril(jnp.ones((tq, k.shape[2]), bool))[None, None], logits.shape)
        valid = cm if valid is None else valid & cm
    if valid is not None:
        logits = jnp.where(valid, logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    if valid is not None:
        # match the kernel: fully-masked rows produce exact zeros
        any_valid = jnp.max(valid.astype(jnp.float32), axis=-1, keepdims=True)
        attn = attn * any_valid
    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "interpret", "layout", "num_heads", "num_kv_heads"
    ),
)
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int | None = None,
    interpret: bool = False,
    layout: str = "bhtd",
    num_heads: int | None = None,
    num_kv_heads: int | None = None,
) -> jax.Array:
    """Fused attention. layout "bhtd": q [B, H, Tq, Dh]; k, v
    [B, KVH, Tk, Dh] with KVH | H (grouped-query). layout "packed": q
    [B, Tq, H*Dh], k, v [B, Tk, KVH*Dh] with ``num_heads`` given (and
    ``num_kv_heads`` for grouped-query — lane-aligned Dh >= 128 only) —
    the raw projection output; no relayout copies AND no HBM lane padding
    (a transposed [B, H, T, 64] operand tile-pads its trailing dim to 128
    lanes = 2x bytes). Requires lcm(Dh, 128)/Dh to divide num_heads; note
    that lane-unfriendly head dims (80, 72) compile very slowly — the
    model layer only routes lane-clean dims here. key_mask [B, Tk]
    bool/int (True = attend). Returns q's layout/dtype.
    """
    assert layout in ("bhtd", "packed"), layout
    packed = layout == "packed"
    if packed:
        assert num_heads is not None, "packed layout needs num_heads"
        b, tq, hd = q.shape
        h = num_heads
        dh = hd // h
        assert hd == h * dh, (q.shape, h)
        # heads per trailing block: smallest head group whose lane width is a
        # multiple of the 128-lane tile (1 for Dh >= 128 lane-aligned, 2 for
        # ViT's 64, 8 for ViT-H's 80, 16 for SigLIP's 72)
        hpb = math.lcm(dh, 128) // dh
        assert h % hpb == 0, f"packed layout needs head-group {hpb} | heads {h} (Dh={dh})"
        kvh = h if num_kv_heads is None else num_kv_heads
        assert kvh == h or hpb == 1, "grouped-query packed needs lane-aligned Dh"
        assert k.shape[-1] == kvh * dh, (k.shape, kvh, dh)
        tk = k.shape[1]
    else:
        b, h, tq, dh = q.shape
        _, kvh, tk, _ = k.shape
    assert h % kvh == 0, (h, kvh)
    g = h // kvh
    if sm_scale is None:
        sm_scale = 1.0 / (dh**0.5)

    # No HBM padding: Pallas masks uneven block tails itself (OOB reads see
    # the VMEM tile pad, OOB writes are dropped), so q/k/v go in at their
    # natural shapes. Materialized jnp.pad + output slice measured ~45 ms/iter
    # of pure HBM traffic on the ViT-L b64 forward (seq 577 -> 584/640).
    lanes = _ceil_to(tk, 128)  # physical logits lane tile, for the budget only
    if block_q is None:
        rows_budget = max(128, _LOGITS_VMEM_BUDGET // (6 * lanes) // 8 * 8)
        n_q_blocks = -(-_ceil_to(tq, 8) // rows_budget)
        block_q = _ceil_to(-(-tq // n_q_blocks), 8)

    has_km = key_mask is not None
    operands = [q, k, v]
    if packed:
        q_spec = pl.BlockSpec(
            (1, block_q, hpb * dh), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
        )
        kv_spec = pl.BlockSpec(
            (1, tk, hpb * dh), lambda bi, hi, qi, _g=g: (bi, 0, hi // _g),
            memory_space=pltpu.VMEM,
        )
        out_shape = (b, tq, h * dh)
    else:
        q_spec = pl.BlockSpec(
            (1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM
        )
        kv_spec = pl.BlockSpec(
            (1, 1, tk, dh), lambda bi, hi, qi, _g=g: (bi, hi // _g, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = (b, h, tq, dh)
    in_specs = [q_spec, kv_spec, kv_spec]
    if has_km:
        operands.append(key_mask.astype(jnp.int32)[:, None, :])
        in_specs.append(
            pl.BlockSpec((1, 1, tk), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
        )

    if packed:
        grid = (b, h // hpb, -(-tq // block_q))
        kernel = functools.partial(
            _attn_kernel_packed,
            sm_scale=float(sm_scale),
            causal=causal,
            block_q=block_q,
            has_km=has_km,
            hpb=hpb,
            dh=dh,
        )
    else:
        grid = (b, h, -(-tq // block_q))
        kernel = functools.partial(
            _attn_kernel,
            sm_scale=float(sm_scale),
            causal=causal,
            block_q=block_q,
            has_km=has_km,
        )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * dh,
            bytes_accessed=2 * q.dtype.itemsize * (b * h * tq * dh + b * kvh * tk * dh),
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )

    # Differentiable: the kernel runs the primal; the backward pass
    # recomputes through the XLA twin (rematerialization — no logits saved),
    # so GRPO training differentiates straight through the fused forward.
    if packed:
        def _to_bhtd(x, nh):
            bb, tt, hdd = x.shape
            return jnp.swapaxes(x.reshape(bb, tt, nh, hdd // nh), 1, 2)

        def ref(q_, k_, v_, km_):
            o = _sdpa_reference(
                _to_bhtd(q_, h), _to_bhtd(k_, kvh), _to_bhtd(v_, kvh), km_,
                causal=causal, sm_scale=float(sm_scale),
            )
            return jnp.swapaxes(o, 1, 2).reshape(q_.shape)
    else:
        def ref(q_, k_, v_, km_):
            return _sdpa_reference(q_, k_, v_, km_, causal=causal, sm_scale=float(sm_scale))

    if has_km:
        @jax.custom_vjp
        def attn_op(q_, k_, v_, km_):
            return call(q_, k_, v_, km_)

        def attn_fwd(q_, k_, v_, km_):
            return attn_op(q_, k_, v_, km_), (q_, k_, v_, km_)

        def attn_bwd(res, g):
            q_, k_, v_, km_ = res
            _, vjp = jax.vjp(lambda a, b, c: ref(a, b, c, km_[:, 0, :]), q_, k_, v_)
            import numpy as np

            return (*vjp(g), np.zeros(km_.shape, jax.dtypes.float0))

        attn_op.defvjp(attn_fwd, attn_bwd)
        return attn_op(*operands)

    @jax.custom_vjp
    def attn_op(q_, k_, v_):
        return call(q_, k_, v_)

    def attn_fwd(q_, k_, v_):
        return attn_op(q_, k_, v_), (q_, k_, v_)

    def attn_bwd(res, g):
        q_, k_, v_ = res
        _, vjp = jax.vjp(lambda a, b, c: ref(a, b, c, None), q_, k_, v_)
        return vjp(g)

    attn_op.defvjp(attn_fwd, attn_bwd)
    return attn_op(*operands)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "sm_scale", "block_q", "interpret", "num_heads", "num_kv_heads"),
)
def fused_attention_qkv(
    qkv: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int | None = None,
    interpret: bool = False,
    num_heads: int | None = None,
    num_kv_heads: int | None = None,
) -> jax.Array:
    """Packed-layout attention over a *stacked* QKV projection output.

    qkv: [B, T, H*Dh + 2*KVH*Dh] — the single-matmul q|k|v column concat
    produced by ops/fused_ln_matmul.py's prologue kernel. The kernel reads
    q, k and v directly out of this array via block-index offsets (the same
    array is passed as three operands with different index maps), so the
    projection output flows into attention with ZERO slicing/relayout copies
    in HBM. Self-attention only (Tk == Tq). Returns [B, T, H*Dh] in qkv's
    dtype. Numerics identical to ``fused_attention(layout="packed")``.
    """
    assert num_heads is not None
    h = num_heads
    kvh = h if num_kv_heads is None else num_kv_heads
    b, t, total = qkv.shape
    dh = total // (h + 2 * kvh)
    assert total == (h + 2 * kvh) * dh, (qkv.shape, h, kvh)
    assert h % kvh == 0, (h, kvh)
    g = h // kvh
    hpb = math.lcm(dh, 128) // dh
    assert h % hpb == 0, f"packed layout needs head-group {hpb} | heads {h} (Dh={dh})"
    assert kvh == h or hpb == 1, "grouped-query packed needs lane-aligned Dh"
    assert kvh % hpb == 0 or kvh == h, (kvh, hpb)
    if sm_scale is None:
        sm_scale = 1.0 / (dh**0.5)

    lanes = _ceil_to(t, 128)
    if block_q is None:
        rows_budget = max(128, _LOGITS_VMEM_BUDGET // (6 * lanes) // 8 * 8)
        n_q_blocks = -(-_ceil_to(t, 8) // rows_budget)
        block_q = _ceil_to(-(-t // n_q_blocks), 8)

    # block-index offsets (in units of the hpb*dh block width) of the k and
    # v column ranges inside the stacked array; exact because hpb | h and
    # (hpb == 1 whenever kvh != h)
    k_off = h // hpb
    v_off = k_off + kvh // hpb

    q_spec = pl.BlockSpec(
        (1, block_q, hpb * dh), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
    )
    k_spec = pl.BlockSpec(
        (1, t, hpb * dh), lambda bi, hi, qi, _g=g, _o=k_off: (bi, 0, _o + hi // _g),
        memory_space=pltpu.VMEM,
    )
    v_spec = pl.BlockSpec(
        (1, t, hpb * dh), lambda bi, hi, qi, _g=g, _o=v_off: (bi, 0, _o + hi // _g),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, block_q, hpb * dh), lambda bi, hi, qi: (bi, qi, hi), memory_space=pltpu.VMEM
    )
    in_specs = [q_spec, k_spec, v_spec]
    has_km = key_mask is not None
    if has_km:
        in_specs.append(
            pl.BlockSpec((1, 1, t), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _attn_kernel_packed,
        sm_scale=float(sm_scale),
        causal=causal,
        block_q=block_q,
        has_km=has_km,
        hpb=hpb,
        dh=dh,
    )
    call = pl.pallas_call(
        kernel,
        grid=(b, h // hpb, -(-t // block_q)),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h * dh), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dh,
            bytes_accessed=qkv.dtype.itemsize * (2 * b * t * total),
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )

    def _to_bhtd(x, nh):
        bb, tt, hdd = x.shape
        return jnp.swapaxes(x.reshape(bb, tt, nh, hdd // nh), 1, 2)

    def ref(qkv_, km_):
        q_ = qkv_[..., : h * dh]
        k_ = qkv_[..., h * dh : (h + kvh) * dh]
        v_ = qkv_[..., (h + kvh) * dh :]
        o = _sdpa_reference(
            _to_bhtd(q_, h), _to_bhtd(k_, kvh), _to_bhtd(v_, kvh), km_,
            causal=causal, sm_scale=float(sm_scale),
        )
        return jnp.swapaxes(o, 1, 2).reshape(b, t, h * dh)

    if has_km:
        km_op = key_mask.astype(jnp.int32)[:, None, :]

        @jax.custom_vjp
        def attn_op(qkv_, km_):
            return call(qkv_, qkv_, qkv_, km_)

        def attn_fwd(qkv_, km_):
            return attn_op(qkv_, km_), (qkv_, km_)

        def attn_bwd(res, g_):
            qkv_, km_ = res
            _, vjp = jax.vjp(lambda a: ref(a, km_[:, 0, :]), qkv_)
            import numpy as np

            return (*vjp(g_), np.zeros(km_.shape, jax.dtypes.float0))

        attn_op.defvjp(attn_fwd, attn_bwd)
        return attn_op(qkv, km_op)

    @jax.custom_vjp
    def attn_op(qkv_):
        return call(qkv_, qkv_, qkv_)

    def attn_fwd(qkv_):
        return attn_op(qkv_), (qkv_,)

    def attn_bwd(res, g_):
        (qkv_,) = res
        _, vjp = jax.vjp(lambda a: ref(a, None), qkv_)
        return vjp(g_)

    attn_op.defvjp(attn_fwd, attn_bwd)
    return attn_op(qkv)
