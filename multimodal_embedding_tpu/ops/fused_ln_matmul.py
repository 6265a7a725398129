"""Fused residual-add + normalization + matmul prologue kernel.

Motivation (measured, PERF.md round 2): with the attention kernel landed,
LayerNorm/elementwise fusions are ~25% of the ViT-L forward (~2.0 ms of a
~7.2 ms layer) and XLA runs them ~2x off the HBM roofline. A *standalone*
Pallas LayerNorm measured slower end-to-end (298 vs 328 img/s) because XLA
fuses each LN into its neighboring elementwise ops and a custom call breaks
those fusions — the conclusion was that the LN must be folded into a
neighboring *matmul*, which is exactly what every transformer sublayer does
with its normalized activations (reference towers: pre-LN -> q/k/v
projections, pre-LN -> MLP up-projection; reference main.py:386-438 runs
these as separate torch ops under bf16 autocast).

This kernel computes, in one pass over the activations:

    x_new = x + delta              (residual add; delta optional)
    h     = norm(x_new)            (LayerNorm f32 stats, or Gemma RMSNorm)
    y     = act(h @ W + b)         (bf16 MXU matmul, f32 accumulation)

returning both ``x_new`` (the residual stream the next sublayer needs) and
``y`` (the projection output: the packed QKV block, or the MLP hidden). The
normalized intermediate ``h`` never touches HBM: each grid cell recomputes
it on the VPU from the resident sequence-row block (constant index across
weight-column blocks — no extra DMA) and feeds the MXU directly. Versus the
XLA schedule this removes the LN write + per-matmul reads of ``h`` and the
separate residual-add round trip — pure HBM traffic at these shapes.

Numerics match the XLA path exactly: the add and normalization statistics
run in float32, ``h`` is cast back to the params dtype before the MXU matmul
with float32 accumulation, and the optional activation runs in float32
(layers.linear / layers.layer_norm / layers.mlp_block semantics).

Differentiable via custom_vjp: the backward pass recomputes through an
XLA twin (rematerialization — nothing extra saved), mirroring
ops/attention_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VPU-activation table (f32 in, f32 out). Matches layers.ACTIVATIONS.
_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def _norm_f32(xf, gamma_f, beta_f, *, norm: str, eps: float):
    """Row normalization in f32. xf [BM, D]; gamma/beta [1, D]."""
    if norm == "ln":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return y * gamma_f + beta_f
    # Gemma RMSNorm: no mean subtraction, (1 + weight) gain, no bias
    assert norm == "rms_gemma", norm
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return y * (1.0 + gamma_f)


def _kernel(*refs, norm: str, eps: float, act: str | None,
            has_delta: bool, has_beta: bool, has_bias: bool, out_dtype):
    """Grid (B, nt, nn), nn fastest, all dims freely pipelinable.

    Each cell recomputes the normalized row-block from the resident x/delta
    blocks (their index maps are constant across nn, so there is no extra
    DMA — the recompute is a few microseconds of VPU work versus the MXU
    matmul) and multiplies it against this weight column-block. No scratch
    and no cross-cell dependency: an earlier scratch-at-nn==0 design
    serialized the Mosaic pipeline and ran 3.5x off the matmul roofline.
    x_new is rewritten (identically) by every nn cell into its resident
    output block; the copy-out happens once per row-block.
    """
    i = 0
    x_ref = refs[i]; i += 1
    delta_ref = refs[i] if has_delta else None
    i += has_delta
    gamma_ref = refs[i]; i += 1
    beta_ref = refs[i] if has_beta else None
    i += has_beta
    w_ref = refs[i]; i += 1
    b_ref = refs[i] if has_bias else None
    i += has_bias
    xnew_ref, y_ref = refs[i], refs[i + 1]

    xf = x_ref[0].astype(jnp.float32)  # [bt, d] view of the (1, bt, d) block
    if has_delta:
        xf = xf + delta_ref[0].astype(jnp.float32)
    # round the residual sum through the storage dtype BEFORE the norm:
    # the XLA layer adds in bf16 and norms the stored value — bit parity
    xn = xf.astype(xnew_ref.dtype)
    xnew_ref[0] = xn
    xf = xn.astype(jnp.float32)
    beta_f = beta_ref[...].astype(jnp.float32) if has_beta else 0.0
    h = _norm_f32(xf, gamma_ref[...].astype(jnp.float32), beta_f, norm=norm, eps=eps)

    y = jax.lax.dot_general(
        h.astype(out_dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        y = y + b_ref[...].astype(jnp.float32)
    if act is not None:
        # round-trip through the storage dtype first: layers.mlp_block casts
        # the linear output to the params dtype before the f32 activation,
        # and bit-parity with the XLA path matters more than one VPU cast
        y = _ACTS[act](y.astype(out_dtype).astype(jnp.float32))
    y_ref[0] = y.astype(out_dtype)


def _reference(x, delta, gamma, beta, w, b, *, norm, eps, act):
    """XLA twin with identical numerics (backs the custom_vjp backward and
    the CPU tests)."""
    xf = x.astype(jnp.float32)
    if delta is not None:
        xf = xf + delta.astype(jnp.float32)
    x_new = xf.astype(x.dtype)
    xf = x_new.astype(jnp.float32)  # norm the stored (rounded) value
    beta_f = beta.astype(jnp.float32) if beta is not None else 0.0
    h = _norm_f32(xf, gamma.astype(jnp.float32), beta_f, norm=norm, eps=eps)
    h = h.astype(x.dtype)
    y = jnp.dot(h, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if act is not None:
        y = _ACTS[act](y.astype(x.dtype).astype(jnp.float32))
    return x_new, y.astype(x.dtype)


def _pick_blocks(
    t: int, d: int, n: int, has_delta: bool, itemsize: int
) -> tuple[int, int]:
    """(bt, bn): sequence-rows and weight-columns per grid cell.

    Prefers the largest bt (fewest weight re-streams: W traffic is
    B * ceil(T/bt) * N * D bytes) with the largest bn that keeps the
    double-buffered working set under a ~12 MB VMEM budget (16 MB/core less
    headroom — larger configs fail the Mosaic compile)."""
    budget = 12 * 2**20
    for nb_t in range(1, 64):
        bt = min(_ceil_to(-(-t // nb_t), 8), _ceil_to(t, 8))
        for bn in (1024, 768, 512, 384, 256, 128):
            bn_e = min(bn, n)
            need = 2 * itemsize * ((3 + has_delta) * bt * d + d * bn_e + bt * bn_e)
            if need <= budget:
                return bt, bn_e
    return 8, min(128, n)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("norm", "eps", "act", "block_m", "block_n", "interpret"),
)
def fused_res_norm_matmul(
    x: jax.Array,
    delta: jax.Array | None,
    gamma: jax.Array,
    beta: jax.Array | None,
    w: jax.Array,
    b: jax.Array | None,
    *,
    norm: str = "ln",
    eps: float = 1e-5,
    act: str | None = None,
    block_m: int | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(x_new, act(norm(x + delta) @ w + b)).

    x, delta: [B, T, D] or [T, D]; gamma/beta: [D]; w: [D, N]; b: [N].
    norm: "ln" (LayerNorm) or "rms_gemma" (RMSNorm with (1+w) gain, no
    beta/bias). Returns (x_new [..., D], y [..., N]) in x's dtype.

    The kernel blocks the SEQUENCE dim natively ([1, bt, D] cells over a
    (B, ceil(T/bt), ceil(N/bn)) grid) instead of flattening to [B*T, D]:
    on TPU the flatten is a physical relayout (each [T, D] slice pads T to
    a sublane multiple), and the reshape copies around the kernel measured
    ~1.2 ms/layer on the ViT-L forward — more than the kernel itself.
    """
    orig_shape = x.shape
    d = orig_shape[-1]
    n = w.shape[-1]
    assert w.shape[0] == d, (w.shape, d)
    if not interpret and d % 128 != 0:
        # The kernel reduces over the full lane (feature) dim; a non-128-
        # multiple D would fold VMEM tile padding into the LN statistics on
        # hardware. Production hidden dims (768..2048) are all lane-clean —
        # anything else takes the numerics-identical XLA path.
        return _reference(x, delta, gamma, beta, w, b, norm=norm, eps=eps, act=act)

    squeeze = x.ndim == 2
    x3 = x[None] if squeeze else x.reshape(-1, *orig_shape[-2:])
    bsz, t, _ = x3.shape
    delta3 = None
    if delta is not None:
        delta3 = delta[None] if squeeze else delta.reshape(x3.shape)

    has_delta = delta is not None
    has_beta = beta is not None
    has_bias = b is not None

    auto_bt, auto_bn = _pick_blocks(t, d, n, has_delta, x.dtype.itemsize)
    bt = block_m or auto_bt
    bn = block_n or auto_bn
    grid = (bsz, pl.cdiv(t, bt), pl.cdiv(n, bn))

    row_spec = pl.BlockSpec((1, bt, d), lambda bi, ti, ni: (bi, ti, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda bi, ti, ni: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec]
    if has_delta:
        in_specs.append(row_spec)
    in_specs.append(vec_spec)
    if has_beta:
        in_specs.append(vec_spec)
    in_specs.append(
        pl.BlockSpec((d, bn), lambda bi, ti, ni: (0, ni), memory_space=pltpu.VMEM)
    )
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, bn), lambda bi, ti, ni: (0, ni), memory_space=pltpu.VMEM)
        )

    out_shape = (
        jax.ShapeDtypeStruct((bsz, t, d), x.dtype),
        jax.ShapeDtypeStruct((bsz, t, n), x.dtype),
    )
    out_specs = (
        row_spec,
        pl.BlockSpec((1, bt, bn), lambda bi, ti, ni: (bi, ti, ni), memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _kernel,
        norm=norm, eps=float(eps), act=act,
        has_delta=has_delta, has_beta=has_beta, has_bias=has_bias,
        out_dtype=x.dtype,
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t * d * n,
            bytes_accessed=x.dtype.itemsize
            * (bsz * t * d * (3 + has_delta) + bsz * t * n + grid[0] * grid[1] * d * n),
            transcendentals=bsz * t * n if act is not None else 0,
        ),
        interpret=interpret,
    )

    ref = functools.partial(_reference, norm=norm, eps=float(eps), act=act)

    # custom_vjp over the array operands actually present; backward
    # rematerializes through the XLA twin.
    if has_delta and has_beta and has_bias:
        @jax.custom_vjp
        def op(x_, delta_, gamma_, beta_, w_, b_):
            xn, y = call(x_, delta_, gamma_.reshape(1, d), beta_.reshape(1, d), w_, b_.reshape(1, n))
            return xn, y

        def fwd(x_, delta_, gamma_, beta_, w_, b_):
            return op(x_, delta_, gamma_, beta_, w_, b_), (x_, delta_, gamma_, beta_, w_, b_)

        def bwd(res, g):
            _, vjp = jax.vjp(ref, *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        xn, y = op(x3, delta3, gamma, beta, w, b)
    elif has_beta and has_bias:  # no delta (first sublayer variants)
        @jax.custom_vjp
        def op(x_, gamma_, beta_, w_, b_):
            return call(x_, gamma_.reshape(1, d), beta_.reshape(1, d), w_, b_.reshape(1, n))

        def fwd(x_, gamma_, beta_, w_, b_):
            return op(x_, gamma_, beta_, w_, b_), (x_, gamma_, beta_, w_, b_)

        def bwd(res, g):
            x_, gamma_, beta_, w_, b_ = res
            _, vjp = jax.vjp(lambda a, c, d_, e, f: ref(a, None, c, d_, e, f), *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        xn, y = op(x3, gamma, beta, w, b)
    elif has_delta:  # rms_gemma with residual: no beta, no bias
        @jax.custom_vjp
        def op(x_, delta_, gamma_, w_):
            return call(x_, delta_, gamma_.reshape(1, d), w_)

        def fwd(x_, delta_, gamma_, w_):
            return op(x_, delta_, gamma_, w_), (x_, delta_, gamma_, w_)

        def bwd(res, g):
            _, vjp = jax.vjp(lambda a, b_, c, e: ref(a, b_, c, None, e, None), *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        xn, y = op(x3, delta3, gamma, w)
    else:  # rms_gemma, no residual
        @jax.custom_vjp
        def op(x_, gamma_, w_):
            return call(x_, gamma_.reshape(1, d), w_)

        def fwd(x_, gamma_, w_):
            return op(x_, gamma_, w_), (x_, gamma_, w_)

        def bwd(res, g):
            _, vjp = jax.vjp(lambda a, c, e: ref(a, None, c, None, e, None), *res)
            return vjp(g)

        op.defvjp(fwd, bwd)
        xn, y = op(x3, gamma, w)

    return xn.reshape(orig_shape), y.reshape(*orig_shape[:-1], n)
