"""Encoding engine: batched, sharded image/text embedding on device.

TPU redesign of the reference's ``encode_data`` (reference main.py:386-438).
Differences that matter:

- Preprocessing runs on device as MXU matmuls (ops/preprocess.py), jitted per
  native image geometry (small graphs, cheap compiles); the tower forward is
  ONE compiled function reused across geometries — data flows preprocess-jit →
  encode-jit entirely on device, no per-batch host offload (the reference
  round-trips every batch through CPU RAM, main.py:415).
- Batches are sharded along the ``data`` mesh axis; params are replicated.
  On a v5e-8 each chip encodes batch/8 images and XLA all-gathers the
  embedding shards.
- L2 normalization in float32 on device (reference main.py:414).

Multi-vector (ColPali) models return per-token embeddings [N, T, D] plus a
token mask instead of pooled vectors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.preprocess import make_preprocess_fn
from ..parallel.mesh import data_sharding, replicated_sharding
from .layers import l2_normalize
from .zoo import LoadedModel


@dataclass
class EncodeResult:
    embeddings: jax.Array  # [N, E] or [N, T, D]
    mask: jax.Array | None  # [N, T] for multi-vector text
    seconds: float


class EncodingEngine:
    def __init__(self, model: LoadedModel, mesh: Mesh, batch_size: int = 32):
        self.model = model
        self.mesh = mesh
        n_data = mesh.shape["data"]
        self.batch_size = max(batch_size, n_data) // n_data * n_data
        self.params = jax.device_put(model.params, replicated_sharding(mesh))

        self._img_fn = jax.jit(lambda params, px: l2_normalize(model_image_fwd(model, params, px)))
        self._txt_fn = jax.jit(
            lambda params, ids, mask: l2_normalize(model_text_fwd(model, params, ids, mask))
        )
        self._pre_fns: dict[tuple[int, int], any] = {}

    # --- internals ---

    def _preprocess_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._pre_fns:
            self._pre_fns[key] = jax.jit(make_preprocess_fn(self.model.preprocess, h, w))
        return self._pre_fns[key]

    def _geometry_batches(self, images: list[np.ndarray]):
        groups: dict[tuple[int, int], list[int]] = {}
        for i, im in enumerate(images):
            groups.setdefault(im.shape[:2], []).append(i)
        for geom, idxs in groups.items():
            for s in range(0, len(idxs), self.batch_size):
                yield geom, idxs[s : s + self.batch_size]

    # --- public API ---

    def encode_images(self, images: list[np.ndarray]) -> EncodeResult:
        """images: list of HWC uint8 arrays (native geometry)."""
        if not images:
            return EncodeResult(jnp.zeros((0,)), None, 0.0)
        t0 = time.perf_counter()
        n = len(images)
        shard_in = data_sharding(self.mesh, ndim=4, axis=0)
        out_chunks: list[tuple[list[int], jax.Array]] = []
        for (h, w), idxs in self._geometry_batches(images):
            batch = np.stack([images[i] for i in idxs])
            pad = self.batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
            dev = jax.device_put(batch, shard_in)
            px = self._preprocess_fn(h, w)(dev)
            emb = self._img_fn(self.params, px)
            if pad:
                emb = emb[: len(idxs)]
            out_chunks.append((idxs, emb))
        dim_rest = out_chunks[0][1].shape[1:]
        out = jnp.zeros((n, *dim_rest), out_chunks[0][1].dtype)
        for idxs, emb in out_chunks:
            out = out.at[jnp.asarray(idxs)].set(emb)
        out = jax.block_until_ready(out)
        return EncodeResult(out, None, time.perf_counter() - t0)

    def encode_texts(self, texts: list[str]) -> EncodeResult:
        if not texts:
            return EncodeResult(jnp.zeros((0,)), None, 0.0)
        t0 = time.perf_counter()
        ids, mask = self.model.tokenize(texts)
        n = ids.shape[0]
        bs = self.batch_size
        shard_in = data_sharding(self.mesh, ndim=2, axis=0)
        chunks = []
        mask_chunks = []
        for s in range(0, n, bs):
            bid = ids[s : s + bs]
            bmask = None if mask is None else mask[s : s + bs]
            pad = bs - bid.shape[0]
            if pad:
                bid = np.concatenate([bid, np.repeat(bid[-1:], pad, axis=0)])
                if bmask is not None:
                    bmask = np.concatenate([bmask, np.repeat(bmask[-1:], pad, axis=0)])
            bid_d = jax.device_put(bid, shard_in)
            bmask_d = None if bmask is None else jax.device_put(bmask, shard_in)
            emb = self._txt_fn(self.params, bid_d, bmask_d)
            if pad:
                emb = emb[: ids[s : s + bs].shape[0]]
                if bmask_d is not None:
                    bmask_d = bmask_d[: ids[s : s + bs].shape[0]]
            chunks.append(emb)
            if self.model.multi_vector and bmask_d is not None:
                mask_chunks.append(bmask_d)
        out = jnp.concatenate(chunks, axis=0)
        out_mask = jnp.concatenate(mask_chunks, axis=0) if mask_chunks else None
        out = jax.block_until_ready(out)
        return EncodeResult(out, out_mask, time.perf_counter() - t0)

    def warmup(self, image_geom: tuple[int, int] = (256, 256)) -> None:
        """Compile preprocess/encode graphs before timing (reference
        main.py:536-547's GPU warmup)."""
        h, w = image_geom
        dummy_imgs = [np.zeros((h, w, 3), np.uint8)] * 2
        dummy_txts = ["a warmup caption"] * 2
        self.encode_images(dummy_imgs)
        self.encode_texts(dummy_txts)


def model_image_fwd(model: LoadedModel, params, pixels: jax.Array) -> jax.Array:
    """Dispatch to the family-specific forward. Split out so jit closes over
    static config only."""
    if model.multi_vector:
        from .colpali import colpali_image_fwd

        return colpali_image_fwd(params, model.cfg, pixels)
    from .towers import encode_image

    return encode_image(params, model.cfg, pixels)


def model_text_fwd(model: LoadedModel, params, ids: jax.Array, mask) -> jax.Array:
    if model.multi_vector:
        from .colpali import colpali_text_fwd

        return colpali_text_fwd(params, model.cfg, ids, mask)
    from .towers import encode_text

    return encode_text(params, model.cfg, ids, mask)
