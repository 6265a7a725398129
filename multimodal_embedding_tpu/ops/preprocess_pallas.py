"""Fused Pallas image-preprocessing kernel.

One kernel instance per image: uint8 [3, H, W] -> normalized f32 [3, C, C],
fusing in VMEM what the XLA path (ops/preprocess.py) expresses as separate
ops: u8->f32 cast, horizontal resize matmul (MXU), PIL uint8 quantization,
vertical resize matmul (MXU), quantization, and the rescale/normalize
scale-shift epilogue. Semantics identical to ``make_preprocess_fn`` (PIL
pass order, crop folded into the weight matrices).

The whole working set for a 640x480 COCO native at 384^2 output is ~7 MB —
inside one core's VMEM — so the kernel runs without HBM round-trips between
stages; the grid pipelines the per-image HBM loads against compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import PreprocessConfig, _cropped_weights


def _kernel(img_ref, wh_ref, wv3_ref, scale_ref, shift_ref, out_ref, *, pil_rounding: bool):
    # Mosaic-friendly: only 2D matmuls and leading-dim reshapes.
    # img_ref: [1, 3, H, W] u8; wh_ref: [W, C]; wv3_ref: [3C, 3H]
    # (block-diagonal vertical weights: one Wv copy per channel);
    # out_ref: [1, 3, C, C] f32
    one, c3, h, w = (1, *img_ref.shape[1:])
    # no direct u8->f32 cast in Mosaic; hop through int32 — and cast BEFORE
    # the reshape (uint8 vector reshapes are unsupported; f32 leading-dim
    # collapses are fine)
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32).reshape(3 * h, w)  # [3H, W]

    # horizontal pass: [3H, W] @ [W, C] -> [3H, C]
    y = jnp.dot(x, wh_ref[:], preferred_element_type=jnp.float32)
    if pil_rounding:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    # vertical pass over all channels at once via the block-diagonal weights:
    # [3C, 3H] @ [3H, C] -> [3C, C]
    z = jnp.dot(wv3_ref[:], y, preferred_element_type=jnp.float32)
    if pil_rounding:
        z = jnp.clip(jnp.round(z), 0.0, 255.0)
    # scale/shift come pre-expanded to [3C, 1] rows (tiny [3] vectors can't
    # be reshaped by Mosaic); broadcast over lanes
    z = z * scale_ref[:] + shift_ref[:]
    out_ref[0] = z.reshape(3, z.shape[0] // 3, z.shape[1])  # leading split


@functools.partial(
    jax.jit, static_argnames=("cfg", "h", "w", "pil_rounding", "interpret")
)
def preprocess_pallas(
    images_u8: jax.Array,  # [B, 3, H, W] uint8 (NCHW wire layout)
    cfg: PreprocessConfig,
    h: int,
    w: int,
    pil_rounding: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Returns normalized [B, C, C, 3] float32 (NHWC for the towers)."""
    wv_np, wh_np = _cropped_weights(cfg, h, w)
    c = cfg.image_size
    # block-diagonal vertical weights: z[3C, C] = Wv3 @ y[3H, C] handles all
    # three channels in one 2D matmul (no batched dims inside the kernel)
    wv3_np = np.zeros((3 * c, 3 * h), np.float32)
    for ch in range(3):
        wv3_np[ch * c : (ch + 1) * c, ch * h : (ch + 1) * h] = wv_np
    scale3 = (cfg.rescale / np.asarray(cfg.std, np.float32)).astype(np.float32)
    shift3 = (-np.asarray(cfg.mean, np.float32) / np.asarray(cfg.std, np.float32)).astype(
        np.float32
    )
    scale = np.repeat(scale3, c).reshape(3 * c, 1)
    shift = np.repeat(shift3, c).reshape(3 * c, 1)
    b = images_u8.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, pil_rounding=pil_rounding),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 3 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, c, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, c, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,  # default scoped limit is 16MB;
            # the per-image working set (weights + intermediates) is ~20MB
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 3 * (h * w * c + h * c * c),
            bytes_accessed=b * 3 * (h * w + c * c * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(images_u8, jnp.asarray(wh_np.T), jnp.asarray(wv3_np), jnp.asarray(scale), jnp.asarray(shift))
    return jnp.transpose(out, (0, 2, 3, 1))
