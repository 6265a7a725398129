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
normalized intermediate ``h`` never touches HBM: it is computed into a VMEM
scratch once per row-block (at the first N-block) and re-used by every
N-block of the weight. Versus the XLA schedule this removes the LN
write + per-matmul reads of ``h`` and the separate residual-add round trip —
pure HBM traffic at these shapes.

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
    """Grid (nm, nn), nn fastest. Per cell: at nn==0 compute the normalized
    row-block into scratch (and write x_new); every nn does one MXU matmul
    of the resident scratch against this weight column-block."""
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
    h_scratch = refs[i + 2]

    @pl.when(pl.program_id(1) == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        if has_delta:
            xf = xf + delta_ref[...].astype(jnp.float32)
        # round the residual sum through the storage dtype BEFORE the norm:
        # the XLA layer adds in bf16 and norms the stored value — bit parity
        xn = xf.astype(xnew_ref.dtype)
        xnew_ref[...] = xn
        xf = xn.astype(jnp.float32)
        beta_f = beta_ref[...].astype(jnp.float32) if has_beta else 0.0
        h = _norm_f32(xf, gamma_ref[...].astype(jnp.float32), beta_f, norm=norm, eps=eps)
        h_scratch[...] = h.astype(h_scratch.dtype)

    y = jax.lax.dot_general(
        h_scratch[...], w_ref[...],
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
    y_ref[...] = y.astype(out_dtype)


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


# Default row-block: 512 rows x D=1024 keeps x/delta/scratch/w blocks +
# double buffering comfortably under the 16 MB VMEM (v5e).
_DEFAULT_BLOCK_M = 512
_DEFAULT_BLOCK_N = 1024


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

    x, delta: [..., D] (leading dims flattened internally); gamma/beta: [D];
    w: [D, N]; b: [N]. norm: "ln" (LayerNorm) or "rms_gemma" (RMSNorm with
    (1+w) gain, no beta/bias). Returns (x_new [..., D], y [..., N]) in x's
    dtype.
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

    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    delta2 = delta.reshape(-1, d) if delta is not None else None

    bm = block_m or min(_DEFAULT_BLOCK_M, pl.cdiv(m, 8) * 8)
    bn = block_n or min(_DEFAULT_BLOCK_N, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))

    has_delta = delta is not None
    has_beta = beta is not None
    has_bias = b is not None

    in_specs = [pl.BlockSpec((bm, d), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM)]
    if has_delta:
        in_specs.append(pl.BlockSpec((bm, d), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((1, d), lambda mi, ni: (0, 0), memory_space=pltpu.VMEM))
    if has_beta:
        in_specs.append(pl.BlockSpec((1, d), lambda mi, ni: (0, 0), memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((d, bn), lambda mi, ni: (0, ni), memory_space=pltpu.VMEM))
    if has_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda mi, ni: (0, ni), memory_space=pltpu.VMEM))

    out_shape = (
        jax.ShapeDtypeStruct((m, d), x.dtype),
        jax.ShapeDtypeStruct((m, n), x.dtype),
    )
    out_specs = (
        pl.BlockSpec((bm, d), lambda mi, ni: (mi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni), memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((bm, d), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            # nn must run sequentially after nn==0 fills the scratch; nm
            # re-initializes the scratch at its own nn==0, so each row-block
            # is self-contained.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * n,
            bytes_accessed=x.dtype.itemsize
            * (m * d * (3 + has_delta) + m * n + grid[0] * d * n),
            transcendentals=m * n if act is not None else 0,
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
        xn, y = op(x2, delta2, gamma, beta, w, b)
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
        xn, y = op(x2, gamma, beta, w, b)
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
        xn, y = op(x2, delta2, gamma, w)
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
        xn, y = op(x2, gamma, w)

    return xn.reshape(orig_shape), y.reshape(*orig_shape[:-1], n)
