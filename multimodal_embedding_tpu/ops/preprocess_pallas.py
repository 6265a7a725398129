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


def _kernel(img_ref, wh_ref, wv_ref, scale_ref, shift_ref, out_ref, *, pil_rounding: bool):
    # img_ref: [1, 3, H, W] u8; wh_ref: [W, C]; wv_ref: [C, H]
    # out_ref: [1, 3, C, C] f32
    x = img_ref[0].astype(jnp.float32)  # [3, H, W]
    wh = wh_ref[:]
    wv = wv_ref[:]

    # horizontal pass: contract W -> [3, H, C]
    y = jax.lax.dot_general(
        x, wh, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if pil_rounding:
        y = jnp.clip(jnp.round(y), 0.0, 255.0)
    # vertical pass: contract H -> [3, C(out rows), C]
    z = jax.lax.dot_general(
        wv, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, 3, C]
    z = jnp.transpose(z, (1, 0, 2))  # [3, C, C]
    if pil_rounding:
        z = jnp.clip(jnp.round(z), 0.0, 255.0)
    z = z * scale_ref[:].reshape(3, 1, 1) + shift_ref[:].reshape(3, 1, 1)
    out_ref[0] = z


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
    scale = (cfg.rescale / np.asarray(cfg.std, np.float32)).astype(np.float32)
    shift = (-np.asarray(cfg.mean, np.float32) / np.asarray(cfg.std, np.float32)).astype(
        np.float32
    )
    b = images_u8.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, pil_rounding=pil_rounding),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, c, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, c, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 3 * (h * w * c + h * c * c),
            bytes_accessed=b * 3 * (h * w + c * c * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(images_u8, jnp.asarray(wh_np.T), jnp.asarray(wv_np), jnp.asarray(scale), jnp.asarray(shift))
    return jnp.transpose(out, (0, 2, 3, 1))
