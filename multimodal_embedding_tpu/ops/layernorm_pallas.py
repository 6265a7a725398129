"""Row-blocked Pallas LayerNorm for the encoder towers.

Status: MEASURED NEGATIVE, not routed. With attention and the matmuls
optimized, LN/elementwise fusions are ~25% of the ViT-L forward, but
swapping this standalone kernel in measured 298 vs 328 img/s end-to-end —
XLA fuses the LN into neighboring elementwise ops (bias adds, residuals),
and an opaque custom call breaks those fusions, costing more than the LN
itself. Kept (tested, differentiable) as the starting point for a future
fused residual+LN(+projection-prologue) kernel, which is where the real
headroom is.

Numerics match ``layers.layer_norm`` exactly: f32 statistics and apply,
output cast back to the input dtype. Differentiable via custom_vjp (the
backward rematerializes through the XLA twin, like the attention kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [rows, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last dim of ``x`` ([..., D]; D lane-aligned)."""
    d = x.shape[-1]
    xr = x.reshape(-1, d)
    n = xr.shape[0]
    rows = min(1024, -(-n // 8) * 8)

    def ref_ln(x_, g_, b_):
        xf = x_.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (y * g_.astype(jnp.float32) + b_.astype(jnp.float32)).astype(x_.dtype)

    call = pl.pallas_call(
        functools.partial(_ln_kernel, eps=float(eps)),
        grid=(-(-n // rows),),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d, bytes_accessed=4 * n * d, transcendentals=n
        ),
        interpret=interpret,
    )

    @jax.custom_vjp
    def ln_op(x_, g_, b_):
        return call(x_, g_[None, :], b_[None, :])

    def ln_fwd(x_, g_, b_):
        return ln_op(x_, g_, b_), (x_, g_, b_)

    def ln_bwd(res, g_out):
        x_, g_, b_ = res
        _, vjp = jax.vjp(ref_ln, x_, g_, b_)
        return vjp(g_out)

    ln_op.defvjp(ln_fwd, ln_bwd)
    return ln_op(xr, scale, bias).reshape(x.shape)
