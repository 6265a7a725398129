"""TPU-native image preprocessing: PIL-exact separable resize as MXU matmuls.

The reference delegates preprocessing to per-model HF processors, which route
through PIL's convolution resampler (decode → resize → center-crop → rescale →
normalize); resize-filter mismatches shift R@1 by whole points (SURVEY.md
§7.3.3). PIL's resampler is a *separable* filter: a horizontal pass and a
vertical pass, each a fixed linear map per (in_size, out_size) pair. We
exploit that: precompute the exact PIL interpolation weight matrices on the
host once per geometry, then the whole image path on device becomes

    out = normalize(crop(Wv @ img_f32 @ Wh^T))

i.e. two batched matmuls on the MXU plus fused elementwise — instead of a
scalar host loop. The center crop is folded into the weight matrices (we only
emit the cropped output rows/cols), so the device op is a single fused
[B,Hc,Win] x [Win,Wc] pipeline with static shapes.

Weight construction mirrors PIL ``ImagingResampleHorizontal``
(Pillow Resample.c): for output pixel ``xx``, ``center=(xx+0.5)*scale``,
support scaled by ``max(scale,1)`` (inherent antialiasing on downscale),
weights normalized to sum 1. We use float32 weights; PIL's uint8 path uses
8-bit fixed point, so per-pixel differences vs PIL are ≤1-2 uint8 levels
(validated in tests/test_preprocess.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

# --- Filters (PIL definitions) ---


def _bicubic(x: np.ndarray) -> np.ndarray:
    # PIL's cubic filter, a = -0.5 (Pillow Resample.c bicubic_filter)
    a = -0.5
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax < 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _bilinear(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(ax < 1.0, 1.0 - ax, 0.0)


_FILTERS = {
    "bicubic": (_bicubic, 2.0),
    "bilinear": (_bilinear, 1.0),
}


@functools.lru_cache(maxsize=4096)
def _resize_matrix_cached(in_size: int, out_size: int, interpolation: str) -> np.ndarray:
    filt, support_base = _FILTERS[interpolation]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support_base * filterscale
    ss = 1.0 / filterscale

    xx = np.arange(out_size, dtype=np.float64)
    center = (xx + 0.5) * scale
    xmin = np.maximum(0, np.floor(center - support).astype(np.int64))
    xmax = np.minimum(in_size, np.ceil(center + support).astype(np.int64))

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    src = np.arange(in_size, dtype=np.float64)
    for i in range(out_size):
        lo, hi = xmin[i], xmax[i]
        w = filt((src[lo:hi] - center[i] + 0.5) * ss)
        s = w.sum()
        if s != 0:
            w = w / s
        mat[i, lo:hi] = w
    return mat.astype(np.float32)


def pil_resize_matrix(in_size: int, out_size: int, interpolation: str = "bicubic") -> np.ndarray:
    """[out_size, in_size] float32 matrix reproducing PIL 1-D resampling."""
    return _resize_matrix_cached(in_size, out_size, interpolation)


# --- Geometry (HF image-processor semantics) ---


def shortest_edge_size(h: int, w: int, size: int) -> tuple[int, int]:
    """HF ``get_resize_output_image_size(default_to_square=False)``."""
    short, long = (h, w) if h <= w else (w, h)
    new_short = size
    new_long = int(size * long / short)
    return (new_short, new_long) if h <= w else (new_long, new_short)


@dataclass(frozen=True)
class PreprocessConfig:
    """Per-model preprocessing recipe (mirrors the model's HF processor)."""

    image_size: int  # final square side fed to the ViT
    resize_mode: Literal["shortest_edge", "exact"] = "shortest_edge"
    interpolation: str = "bicubic"
    mean: tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)  # OPENAI_CLIP
    std: tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)
    rescale: float = 1.0 / 255.0

    def resize_target(self, h: int, w: int) -> tuple[int, int]:
        if self.resize_mode == "exact":
            return (self.image_size, self.image_size)
        return shortest_edge_size(h, w, self.image_size)


# normalize constants shared by model configs
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def _cropped_weights(cfg: PreprocessConfig, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Vertical/horizontal resize matrices with the center crop folded in.

    Returns (Wv [C, h], Wh [C, w]) such that out = Wv @ img @ Wh^T is the
    resized-then-center-cropped image (HF center_crop: top-left offset
    ``(size - crop) // 2``).
    """
    rh, rw = cfg.resize_target(h, w)
    c = cfg.image_size
    if rh < c or rw < c:
        raise ValueError(f"resize target {(rh, rw)} smaller than crop {c}")
    wv = pil_resize_matrix(h, rh, cfg.interpolation)
    wh = pil_resize_matrix(w, rw, cfg.interpolation)
    top = (rh - c) // 2
    left = (rw - c) // 2
    return wv[top : top + c], wh[left : left + c]


def make_preprocess_fn(
    cfg: PreprocessConfig, h: int, w: int, *, pil_rounding: bool = True,
    input_format: str = "nhwc",
):
    """Build a jittable fn: uint8 [B,h,w,3] (or [B,3,h,w] with
    input_format='nchw') -> float32 [B,C,C,3] normalized.

    NCHW is the on-device/wire layout of choice: TPU tiling pads the trailing
    dimension to 128 lanes, so a trailing C=3 axis inflates HBM footprint and
    bandwidth ~42x. All internal compute is channels-first.

    The two resize contractions run in float32 on the MXU; rescale and
    mean/std normalization are folded into a single scale/shift that XLA
    fuses into the matmul epilogue. With ``pil_rounding`` (default), we
    reproduce PIL's pass structure bit-for-bit at the uint8 level modulo its
    8-bit fixed-point weights: horizontal pass first, then vertical, with
    round-and-clamp to uint8 between and after the passes (Pillow
    Resample.c ImagingResampleHorizontal_8bpc). Remaining differences vs PIL
    are at most one uint8 level.
    """
    wv_np, wh_np = _cropped_weights(cfg, h, w)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    # x/255 then (x-mean)/std  ==  x * scale + shift
    scale = (cfg.rescale / std).astype(np.float32)
    shift = (-mean / std).astype(np.float32)

    def _quant(x: jax.Array) -> jax.Array:
        return jnp.clip(jnp.round(x), 0.0, 255.0)

    def fn(images_u8: jax.Array) -> jax.Array:
        # channels-first internally so both resize contractions keep a large
        # spatial axis in the 128-lane dimension
        if input_format == "nchw":
            x = images_u8.astype(jnp.float32)  # [B,3,h,w]
        else:
            x = jnp.transpose(images_u8, (0, 3, 1, 2)).astype(jnp.float32)
        wv = jnp.asarray(wv_np)
        wh = jnp.asarray(wh_np)
        # horizontal pass (contract w), then vertical (contract h) — PIL order
        x = jnp.einsum("bchw,wp->bchp", x, wh.T, preferred_element_type=jnp.float32)
        if pil_rounding:
            x = _quant(x)
        x = jnp.einsum("bchp,ho->bcop", x, wv.T, preferred_element_type=jnp.float32)
        if pil_rounding:
            x = _quant(x)
        x = x * scale[None, :, None, None] + shift[None, :, None, None]
        return jnp.transpose(x, (0, 2, 3, 1))  # [B,C,C,3] NHWC

    return fn


_PIL_RESAMPLE = {"bicubic": 3, "bilinear": 2}  # PIL.Image.BICUBIC / BILINEAR


def host_resize_crop(cfg: PreprocessConfig, img: "np.ndarray") -> "np.ndarray":
    """PIL resize + center crop on the host -> uint8 [C, C, 3].

    Bit-identical to the HF processor's geometry stage. Used by the
    ``host`` transport mode of the encoding engine when host->device
    bandwidth is the bottleneck (shipping crop-sized uint8 instead of the
    native image is ~3x fewer bytes); normalization still happens on device.
    """
    from PIL import Image

    h, w = img.shape[:2]
    rh, rw = cfg.resize_target(h, w)
    pil = Image.fromarray(img)
    if (rh, rw) != (h, w):
        pil = pil.resize((rw, rh), resample=_PIL_RESAMPLE[cfg.interpolation])
    c = cfg.image_size
    top = (rh - c) // 2
    left = (rw - c) // 2
    return np.asarray(pil)[top : top + c, left : left + c]


def make_normalize_fn(cfg: PreprocessConfig, input_format: str = "nchw"):
    """Device normalize-only fn for host-resized uint8.

    Input [B, 3, C, C] NCHW by default (the layout shipped over the wire —
    see make_preprocess_fn on TPU lane padding); output [B, C, C, 3] NHWC.
    """
    scale = (cfg.rescale / np.asarray(cfg.std, np.float32)).astype(np.float32)
    shift = (-np.asarray(cfg.mean, np.float32) / np.asarray(cfg.std, np.float32)).astype(np.float32)

    def fn(images_u8: jax.Array) -> jax.Array:
        if input_format == "nchw":
            x = images_u8.astype(jnp.float32) * scale[None, :, None, None] + shift[None, :, None, None]
            return jnp.transpose(x, (0, 2, 3, 1))
        return images_u8.astype(jnp.float32) * scale + shift

    return fn


def preprocess_batch(
    cfg: PreprocessConfig,
    images: "list[np.ndarray]",
    *,
    jit: bool = True,
) -> np.ndarray:
    """Preprocess a list of HWC uint8 images of arbitrary sizes.

    Images are grouped by native geometry so each unique (h, w) compiles
    once; outputs are reassembled in input order. Returns [N, C, C, 3] f32.
    """
    c = cfg.image_size
    out = np.empty((len(images), c, c, 3), dtype=np.float32)
    groups: dict[tuple[int, int], list[int]] = {}
    for i, im in enumerate(images):
        groups.setdefault(im.shape[:2], []).append(i)
    for (h, w), idxs in groups.items():
        fn = make_preprocess_fn(cfg, h, w)
        if jit:
            fn = jax.jit(fn)
        batch = np.stack([images[i] for i in idxs])
        res = np.asarray(fn(batch))
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return out
