"""Shared pure-functional transformer building blocks.

Params are nested dicts of jnp arrays; per-layer weights are *stacked* along
a leading layer axis and the encoder runs as a single ``lax.scan`` — one
compiled layer body regardless of depth, which keeps XLA compile time flat
for the ViT-H towers (32 layers) and lets the MXU see uniform matmul shapes.

Numerics: matmuls run in the params dtype (bf16 on TPU) with float32
accumulation (``preferred_element_type``); layernorm statistics and softmax
run in float32. This mirrors the reference's torch bf16 autocast behavior
(reference main.py:93) while keeping reductions exact.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


# --- initializers -----------------------------------------------------------


def linear_init(key, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    kw, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -scale, scale),
        "b": jnp.zeros((d_out,), dtype),
    }


def ln_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# --- ops --------------------------------------------------------------------


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Stays on XLA deliberately: a standalone row-blocked Pallas LN
    # (ops/layernorm_pallas.py) measured SLOWER end-to-end (298 vs 328
    # img/s, ViT-L b64) — XLA fuses the LN into neighboring elementwise
    # ops, and a custom call breaks those fusions (PERF.md).
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "quick_gelu": quick_gelu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


# Attention implementation for self-attention inside the towers:
#  - "xla":      einsum SDPA, f32 QK^T accumulation + f32 softmax (max parity
#                with HF's f32 CPU reference)
#  - "xla_bf16": bf16 QK^T logits, f32 softmax — matches torch bf16-autocast
#                numerics (what the reference actually ran on the A40) and is
#                ~12% faster on v5e (92 vs 82 TFLOPS measured, CLS cosine
#                >= 0.99995 vs f32)
#  - "pallas":   fused softmax-in-VMEM kernel (ops/attention_pallas.py) —
#                f32-softmax numerics of "xla" without the [B,H,T,T] logits
#                HBM round-trips that cap the towers at ~40% MFU
#  - "flash":    the official Pallas TPU flash-attention kernel (online
#                softmax, no [T, T] logits in HBM) — measured SLOWER at ViT
#                scale; useful for long sequences.
#  - "auto":     "pallas" on TPU, "xla" elsewhere (CPU tests keep max-parity
#                f32 numerics; the TPU path takes the fastest measured kernel)
# Module-level switch so model code stays implementation-agnostic; set via
# set_attention_impl() (the CLI exposes --attention-impl).
_ATTENTION_IMPL = "auto"

ATTENTION_IMPLS = ("auto", "xla", "xla_bf16", "pallas", "flash")


def set_attention_impl(impl: str) -> None:
    global _ATTENTION_IMPL
    assert impl in ATTENTION_IMPLS
    _ATTENTION_IMPL = impl


def get_attention_impl() -> str:
    """Resolved implementation name (never "auto")."""
    if _ATTENTION_IMPL == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return _ATTENTION_IMPL


def attention_impl_for(dh: int, tk: int) -> str:
    """Shape-aware resolution of "auto" (measured on v5e, PERF.md):

    - long sequences always profit from the fused kernel (the XLA path's
      [T, T] logits HBM round-trips dominate): ViT-L @577 +36%,
      SigLIP @729 +10%, Gemma @1030 -30% attention time;
    - at medium/short sequence the kernel needs a lane-clean head dim
      (Dh | 128 packed layout); lane-unfriendly dims (ViT-H's 80, SigLIP
      text's 72) pad per-head tiles to 128 lanes and lose — and for those
      dims bf16 logits beat f32 at EVERY length (ViT-H@257: kernel -11%
      vs bf16 SDPA; SigLIP text@64: bf16 +15% over f32 — the f32 [T,T,72]
      logit chain pays the 72->128 lane pad twice as hard);
    - lane-clean short sequences (CLIP/LAION text @77, Dh=64) are
      VPU/overhead-bound: the plain f32 XLA SDPA wins over both the
      kernel (-10/-13%, re-measured after the v2 VPU-lean softmax:
      benchmarks/text_impl_bench.py) and bf16 logits (tie);
    - off-TPU stays on the max-parity f32 XLA path.
    """
    if _ATTENTION_IMPL != "auto":
        return _ATTENTION_IMPL
    if jax.default_backend() != "tpu":
        return "xla"
    lane_clean = 128 % dh == 0 or dh % 128 == 0
    if tk >= 512 or (tk >= 256 and lane_clean):
        return "pallas"
    if not lane_clean:
        return "xla_bf16"
    return "xla"


def attention_interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# Tensor-parallel mesh (set by the CLI when --tensor-parallel > 1). GSPMD
# cannot auto-partition a pallas_call over the model axis, so when this is
# set, attention_core wraps the fused kernel in an explicit shard_map over
# the column-split heads — each chip runs a self-contained kernel on its
# head shard (Megatron TP composes with the kernel instead of excluding it).
_TP_MESH = None


def set_tp_mesh(mesh) -> None:
    """Register the (data, model) mesh for tensor-parallel runs (None to
    clear). Only meshes with a model axis > 1 change behavior."""
    global _TP_MESH
    _TP_MESH = mesh


def get_tp_mesh():
    from ..parallel.mesh import MODEL_AXIS

    if _TP_MESH is not None and int(_TP_MESH.shape[MODEL_AXIS]) > 1:
        return _TP_MESH
    return None


# Sequence-parallel mesh (set by the CLI when --sequence-parallel > 1).
# Shards the TOKEN dim of long-sequence decoder activations over the model
# axis: layernorms/MLPs/projections are token-local (GSPMD keeps them
# sharded), and attention all-gathers K/V over ICI inside parallel/sp.py's
# shard_map. Consumer: ColPali's 1030-token Gemma prefill (gemma._attn).
_SP_MESH = None


def set_sp_mesh(mesh) -> None:
    """Register the (data, model) mesh for sequence-parallel runs (None to
    clear). Only meshes with a model axis > 1 change behavior."""
    global _SP_MESH
    _SP_MESH = mesh


def get_sp_mesh():
    from ..parallel.mesh import MODEL_AXIS

    if _SP_MESH is not None and int(_SP_MESH.shape[MODEL_AXIS]) > 1:
        return _SP_MESH
    return None


# Encoder-layer implementation:
#  - "xla":   encoder_layer as separate XLA ops
#  - "fused": the residual+LN+matmul prologue Pallas kernel
#    (ops/fused_ln_matmul.py) feeding the stacked-QKV attention kernel
#  - "auto":  "xla" everywhere — a MEASURED NEGATIVE (round 3, PERF.md):
#    with the packed attention kernel already eliminating the relayout
#    copies, current XLA fuses residual+LN into the neighboring matmuls at
#    roofline (the LN1+QKV fusion profiles at ~178 TFLOP/s, ~= the bare
#    matmul), so the prologue kernel can only match the matmul while
#    breaking the o-proj/fc2 epilogue fusions (~0.6-1.2 ms/layer): ViT-L
#    287.6 img/s fused vs 348.1 xla. The kernel stays as a tested,
#    differentiable opt-in.
_LAYER_IMPL = "auto"

LAYER_IMPLS = ("auto", "xla", "fused")


def set_layer_impl(impl: str) -> None:
    global _LAYER_IMPL
    assert impl in LAYER_IMPLS
    _LAYER_IMPL = impl


def get_layer_impl() -> str:
    """Resolved implementation name (never "auto")."""
    if _LAYER_IMPL == "auto":
        return "xla"
    return _LAYER_IMPL


def _flash_sdpa(q: jax.Array, k: jax.Array, v: jax.Array, causal: bool) -> jax.Array:
    """q/k/v [B, T, H, Dh] -> [B, T, H, Dh] via the Pallas TPU kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    # kernel layout is [B, H, T, Dh]; pad T to a 128 multiple with masked-out
    # zero keys (segment ids separate pad from real tokens)
    b, t, h, dh = q.shape
    tp = -(-t // 128) * 128
    pad = tp - t

    def to_bhtd(x):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.swapaxes(x, 1, 2)

    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    seg = jnp.concatenate(
        [jnp.ones((b, t), jnp.int32), jnp.zeros((b, pad), jnp.int32)], axis=1
    )
    out = flash_attention(
        to_bhtd(q), to_bhtd(k), to_bhtd(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=causal,
        sm_scale=1.0 / math.sqrt(dh),
    )
    return jnp.swapaxes(out, 1, 2)[:, :t]


def packed_kernel_ok(dh: int, n_heads: int) -> bool:
    """Lane-clean head dims only: the generalized (lcm) head-grouping
    compiles pathologically slowly at Dh=80 on the remote Mosaic path —
    transposed blocks stay the default for those shapes."""
    return (128 % dh == 0 or dh % 128 == 0) and n_heads % max(1, 128 // dh) == 0


def attention_core(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    n_heads: int,
    *,
    causal: bool = False,
    mask: jax.Array | None = None,
    self_attn: bool = True,
) -> jax.Array:
    """Scaled-dot-product attention over projected activations.

    qf [B, Tq, D]; kf/vf [B, Tk, D]; mask [B, Tk] (True = attend). Dispatches
    to the implementation selected by :func:`attention_impl_for`. Returns
    [B, Tq, D] in qf's dtype (pre output-projection).
    """
    b, tq, d = qf.shape
    tk = kf.shape[1]
    dh = d // n_heads
    x = qf

    impl = attention_impl_for(dh, tk)

    tp = get_tp_mesh()
    if tp is not None and impl in ("pallas", "flash"):
        from ..parallel.mesh import MODEL_AXIS

        n = int(tp.shape[MODEL_AXIS])
        if (
            impl == "pallas"
            and self_attn
            and n_heads % n == 0
            and packed_kernel_ok(dh, n_heads // n)
        ):
            return _tp_packed_attention(qf, kf, vf, mask, n_heads, causal=causal, tp_mesh=tp)
        # shapes the per-chip kernel cannot take (or flash): the bf16-logit
        # einsum SDPA partitions cleanly under the Megatron shardings
        impl = "xla_bf16"

    if impl == "pallas" and packed_kernel_ok(dh, n_heads):
        # packed layout: the kernel consumes the raw [B, T, H*Dh] projection
        # output — no transpose copies, no HBM lane padding of small head dims
        from ..ops.attention_pallas import fused_attention

        out = fused_attention(
            qf, kf, vf,
            key_mask=mask,
            causal=causal,
            interpret=attention_interpret(),
            layout="packed",
            num_heads=n_heads,
        )
        return out.astype(x.dtype)

    q = qf.reshape(b, tq, n_heads, dh)
    k = kf.reshape(b, tk, n_heads, dh)
    v = vf.reshape(b, tk, n_heads, dh)

    if impl == "flash" and self_attn and mask is None:
        return _flash_sdpa(q, k, v, causal).astype(x.dtype).reshape(b, tq, d)

    if impl == "pallas":
        from ..ops.attention_pallas import fused_attention

        out = fused_attention(
            jnp.swapaxes(q, 1, 2),
            jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2),
            key_mask=mask,
            causal=causal,
            interpret=attention_interpret(),
        )
        return jnp.swapaxes(out, 1, 2).astype(x.dtype).reshape(b, tq, d)

    if impl == "xla_bf16":
        logits = (jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dh)).astype(jnp.float32)
    else:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh)
    if causal:
        cm = jnp.tril(jnp.ones((tq, tk), bool))
        logits = jnp.where(cm[None, None], logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(b, tq, d)


def _tp_packed_attention(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    mask: jax.Array | None,
    n_heads: int,
    *,
    causal: bool,
    tp_mesh,
) -> jax.Array:
    """Fused packed-layout attention under tensor parallelism.

    qf/kf/vf [B, T, D] with D column-split over the model axis (Megatron
    q/k/v projections, parallel/tp.py) and B sharded over the data axis.
    Heads are head-aligned with the column split, so each chip's shard is a
    self-contained packed attention over ``n_heads / tp`` heads — shard_map
    invokes one kernel per chip with zero collectives; the row-split output
    projection's psum happens downstream in GSPMD-land as usual.
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.attention_pallas import fused_attention
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

    n = int(tp_mesh.shape[MODEL_AXIS])
    local_heads = n_heads // n
    interp = attention_interpret()

    def local(q_, k_, v_, *m_):
        return fused_attention(
            q_, k_, v_,
            key_mask=m_[0] if m_ else None,
            causal=causal,
            interpret=interp,
            layout="packed",
            num_heads=local_heads,
        )

    spec = P(DATA_AXIS, None, MODEL_AXIS)
    mask_specs = (P(DATA_AXIS, None),) if mask is not None else ()
    fn = jax.shard_map(
        local,
        mesh=tp_mesh,
        in_specs=(spec, spec, spec) + mask_specs,
        out_specs=spec,
        # the pallas_call's out ShapeDtypeStruct carries no varying-mesh-axes
        # metadata; the body is elementwise-local per shard (no collectives)
        check_vma=False,
    )
    args = (qf, kf, vf) + ((mask,) if mask is not None else ())
    return fn(*args).astype(qf.dtype)


def mha(
    p: Params,
    x: jax.Array,
    n_heads: int,
    *,
    kv: jax.Array | None = None,
    causal: bool = False,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Multi-head attention with q/k/v/o projections.

    x: [B, Tq, D]; kv (for cross attention): [B, Tk, D].
    mask: [B, Tk] boolean key-validity mask (True = attend).
    Softmax in float32.
    """
    self_attn = kv is None
    kv = x if kv is None else kv

    qf = linear(p["q"], x)
    kf = linear(p["k"], kv)
    vf = linear(p["v"], kv)

    out = attention_core(qf, kf, vf, n_heads, causal=causal, mask=mask, self_attn=self_attn)
    return linear(p["o"], out)


def mlp_block(p: Params, x: jax.Array, act: str) -> jax.Array:
    h = linear(p["fc1"], x)
    h = ACTIVATIONS[act](h.astype(jnp.float32)).astype(x.dtype)
    return linear(p["fc2"], h)


def encoder_layer(
    p: Params, x: jax.Array, n_heads: int, act: str, *,
    causal: bool = False, mask: jax.Array | None = None, ln_eps: float = 1e-5,
) -> jax.Array:
    """Pre-LN transformer layer (CLIP/SigLIP structure)."""
    x = x + mha(p["attn"], layer_norm(p["ln1"], x, ln_eps), n_heads, causal=causal, mask=mask)
    x = x + mlp_block(p["mlp"], layer_norm(p["ln2"], x, ln_eps), act)
    return x


def encoder_stack(
    stacked: Params, x: jax.Array, n_heads: int, act: str, *,
    causal: bool = False, mask: jax.Array | None = None, ln_eps: float = 1e-5,
) -> jax.Array:
    """Scan one compiled layer body over stacked per-layer params.

    Dispatches between the plain XLA layer and the fused-prologue layer
    (residual+LN+matmul Pallas kernel feeding the attention kernel) per
    :func:`get_layer_impl`.
    """
    if get_layer_impl() == "fused":
        return _fused_encoder_stack(
            stacked, x, n_heads, act, causal=causal, mask=mask, ln_eps=ln_eps
        )

    def body(h, layer_p):
        return encoder_layer(layer_p, h, n_heads, act, causal=causal, mask=mask, ln_eps=ln_eps), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def _fused_encoder_stack(
    stacked: Params, x: jax.Array, n_heads: int, act: str, *,
    causal: bool = False, mask: jax.Array | None = None, ln_eps: float = 1e-5,
) -> jax.Array:
    """Pre-LN encoder scan built on the fused residual+LN+matmul prologue
    kernel (ops/fused_ln_matmul.py).

    Each layer runs as: one prologue kernel producing (residual stream,
    stacked QKV), the attention kernel reading q/k/v straight out of the
    stacked projection (zero relayout), the XLA output projection, a second
    prologue producing (residual stream, activated MLP hidden), and the XLA
    down projection. The scan carries ``(x, delta)`` — the residual stream
    and the not-yet-added sublayer output — so every residual add happens
    inside a kernel that was already reading both operands; the single
    deferred add materializes once after the scan.

    Numerics are op-for-op identical to :func:`encoder_layer` (same f32
    statistics, same cast points) — enforced by tests/test_fused_layer.py.
    """
    from ..ops.fused_ln_matmul import fused_res_norm_matmul

    d = x.shape[-1]
    dh = d // n_heads
    tk = x.shape[1]
    interp = attention_interpret()
    use_qkv_kernel = attention_impl_for(dh, tk) == "pallas" and packed_kernel_ok(dh, n_heads)

    def body(carry, lp):
        h, delta = carry
        w_qkv = jnp.concatenate(
            [lp["attn"]["q"]["w"], lp["attn"]["k"]["w"], lp["attn"]["v"]["w"]], axis=1
        )
        b_qkv = jnp.concatenate(
            [lp["attn"]["q"]["b"], lp["attn"]["k"]["b"], lp["attn"]["v"]["b"]]
        )
        h1, qkv = fused_res_norm_matmul(
            h, delta, lp["ln1"]["scale"], lp["ln1"]["bias"], w_qkv, b_qkv,
            norm="ln", eps=ln_eps, interpret=interp,
        )
        if use_qkv_kernel:
            from ..ops.attention_pallas import fused_attention_qkv

            attn = fused_attention_qkv(
                qkv, key_mask=mask, causal=causal, num_heads=n_heads, interpret=interp
            ).astype(h.dtype)
        else:
            attn = attention_core(
                qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :],
                n_heads, causal=causal, mask=mask,
            )
        ao = linear(lp["attn"]["o"], attn)
        h2, mlp_h = fused_res_norm_matmul(
            h1, ao, lp["ln2"]["scale"], lp["ln2"]["bias"],
            lp["mlp"]["fc1"]["w"], lp["mlp"]["fc1"]["b"],
            norm="ln", eps=ln_eps, act=act, interpret=interp,
        )
        mo = linear(lp["mlp"]["fc2"], mlp_h)
        return (h2, mo), None

    (xf, df), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), stacked)
    return xf + df


def encoder_stack_init(key, n_layers: int, dim: int, mlp_dim: int, dtype=jnp.float32) -> Params:
    """Random init of stacked encoder params (leading axis = layer)."""
    keys = jax.random.split(key, n_layers)

    def one(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": ln_init(dim, dtype),
            "attn": {
                "q": linear_init(ks[0], dim, dim, dtype),
                "k": linear_init(ks[1], dim, dim, dtype),
                "v": linear_init(ks[2], dim, dim, dtype),
                "o": linear_init(ks[3], dim, dim, dtype),
            },
            "ln2": ln_init(dim, dtype),
            "mlp": {
                "fc1": linear_init(ks[4], dim, mlp_dim, dtype),
                "fc2": linear_init(ks[5], mlp_dim, dim, dtype),
            },
        }

    layers = [one(k) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """L2 normalize in float32 (matches torch `x / x.norm(dim=-1, keepdim=True)`,
    reference main.py:414)."""
    xf = x.astype(jnp.float32)
    n = jnp.linalg.norm(xf, axis=axis, keepdims=True)
    return (xf / (n + eps)).astype(x.dtype)
