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
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.preprocess import host_resize_crop, make_normalize_fn, make_preprocess_fn
from ..parallel.mesh import data_sharding, replicated_sharding
from ..utils.timing import hard_sync
from .layers import l2_normalize
from .zoo import LoadedModel

_put_bandwidth_cache: list[float] = []


def measure_put_bandwidth_mbps(nbytes: int = 8 << 20) -> float:
    """Rough host->device transfer bandwidth (cached per process). Used to
    pick the image transport: remote/tunneled devices can be <100 MB/s, a
    co-located PCIe host is GB/s."""
    if not _put_bandwidth_cache:
        buf = np.zeros(nbytes, np.uint8)
        jax.block_until_ready(jax.device_put(buf))  # warm allocator
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        dt = time.perf_counter() - t0
        _put_bandwidth_cache.append(nbytes / dt / 1e6)
    return _put_bandwidth_cache[0]


@dataclass
class EncodeResult:
    embeddings: jax.Array  # [N, E] or [N, T, D]
    mask: jax.Array | None  # [N, T] for multi-vector text
    seconds: float


@dataclass
class DeviceImageCache:
    """Raw uint8 images staged in device HBM, grouped by native geometry and
    pre-batched: each group is a [n_batches, B, H, W, 3] batch-sharded array.

    The reference caches downloaded images on local disk so the 7-model loop
    re-reads them per model (reference main.py:176-182); here the equivalent
    staging ships them over the host link ONCE, and every model's
    preprocess+encode runs from HBM with zero per-model host traffic. 5k COCO
    natives are ~4.6 GB — comfortably inside a v5e chip's HBM.
    """

    groups: list[tuple[tuple[int, int], list[int], jax.Array, int]]
    # (geometry, original indices, [nb, B, H, W, 3] device array, valid count)
    batch_size: int
    n_images: int
    stage_seconds: float


def _group_layout(images: list[np.ndarray], mesh: Mesh, batch_size: int):
    """(rounded batch size, {geometry: indices}, slice plan). The slice plan
    lists every <=128MB transfer up front: (geometry, batch offset, n batches)
    — multi-GB single puts can stall slow or tunneled host links."""
    n_data = mesh.shape["data"]
    batch_size = max(batch_size, n_data) // n_data * n_data
    groups_idx: dict[tuple[int, int], list[int]] = {}
    for i, im in enumerate(images):
        groups_idx.setdefault(im.shape[:2], []).append(i)
    plan = []
    for (h, w), idxs in groups_idx.items():
        nb = -(-len(idxs) // batch_size)
        step = max(1, (128 << 20) // (batch_size * 3 * h * w))
        for s in range(0, nb, step):
            plan.append(((h, w), s, min(step, nb - s)))
    return batch_size, groups_idx, plan


def _group_buffer(images, idxs, h, w, batch_size) -> np.ndarray:
    """Native images -> one padded [nb, B, 3, H, W] uint8 host buffer.

    NCHW on the wire and in HBM: TPU tiling pads the trailing dim to 128
    lanes, so [..., 3] would inflate HBM footprint ~42x. The layout
    conversion uses the threaded native kernel when cores allow."""
    from ..utils.native import hwc_to_chw_batch

    count = len(idxs)
    nb = -(-count // batch_size)
    buf = np.empty((nb * batch_size, 3, h, w), np.uint8)
    hwc_to_chw_batch([images[i] for i in idxs], out=buf[:count])
    if nb * batch_size > count:  # pad with repeats of the last image
        buf[count:] = buf[count - 1]
    return buf.reshape(nb, batch_size, 3, h, w)


def stage_images(
    images: list[np.ndarray], mesh: Mesh, batch_size: int
) -> DeviceImageCache:
    """One-time host->device staging of native uint8 images."""
    t0 = time.perf_counter()
    batch_size, groups_idx, _ = _group_layout(images, mesh, batch_size)
    sharding = data_sharding(mesh, ndim=5, axis=1)
    groups = []
    for (h, w), idxs in groups_idx.items():
        buf = _group_buffer(images, idxs, h, w, batch_size)
        nb = buf.shape[0]
        step = max(1, (128 << 20) // (batch_size * 3 * h * w))
        parts = [
            jax.device_put(buf[s : s + step], sharding) for s in range(0, nb, step)
        ]
        dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        groups.append(((h, w), idxs, dev, len(idxs)))
    from ..utils.timing import hard_sync as _hs
    _hs([g[2] for g in groups])
    return DeviceImageCache(
        groups=groups,
        batch_size=batch_size,
        n_images=len(images),
        stage_seconds=time.perf_counter() - t0,
    )


class AsyncImageStager:
    """Staging overlapped with encode (SURVEY §7.3.6: host/device overlap is
    where the wall-clock is won). A host thread converts + uploads <=128MB
    slices while the FIRST model encodes already-staged slices
    (``EncodingEngine.encode_images_streaming``); later models take the
    assembled ``DeviceImageCache`` from :meth:`wait`. The r3 full7 evidence
    spent 416-701 s in staging strictly BEFORE any encode — this hides it
    behind model 1's encode phase. Only the ≤128MB slices live on device
    while model 1 runs; the monolithic per-geometry cache arrays are
    assembled at the model-2 handoff in :meth:`wait` (see there for the
    HBM math)."""

    def __init__(self, images: list[np.ndarray], mesh: Mesh, batch_size: int):
        import threading

        self._images = images
        self._sharding = data_sharding(mesh, ndim=5, axis=1)
        self.batch_size, self._groups_idx, self.slice_plan = _group_layout(
            images, mesh, batch_size
        )
        self.n_images = len(images)
        self._chunks: list[tuple[tuple[int, int], list[int], jax.Array, int]] = []
        self._done = False
        self._err: BaseException | None = None
        self._cache: DeviceImageCache | None = None
        self._cond = threading.Condition()
        self._t0 = time.perf_counter()
        self.stage_seconds: float | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def slice_shapes(self) -> list[tuple[int, int, int]]:
        """Distinct (h, w, n_batches) of the planned slices — known before any
        data moves, so the consumer can compile its per-slice encode fns
        during warmup instead of inside the timed phase."""
        return sorted({(h, w, nbs) for (h, w), _, nbs in self.slice_plan})

    def _run(self):
        try:
            for (h, w), idxs in self._groups_idx.items():
                buf = _group_buffer(self._images, idxs, h, w, self.batch_size)
                nb = buf.shape[0]
                step = max(1, (128 << 20) // (self.batch_size * 3 * h * w))
                for s in range(0, nb, step):
                    dev = jax.device_put(buf[s : s + step], self._sharding)
                    valid = min(len(idxs) - s * self.batch_size,
                                dev.shape[0] * self.batch_size)
                    chunk_idxs = idxs[s * self.batch_size : s * self.batch_size + valid]
                    with self._cond:
                        self._chunks.append(((h, w), chunk_idxs, dev, valid))
                        self._cond.notify_all()
            hard_sync([c[2] for c in self._chunks])
            self.stage_seconds = time.perf_counter() - self._t0
        except BaseException as e:  # surfaced to the consumer thread
            self._err = e
        finally:
            with self._cond:
                self._done = True
                self._cond.notify_all()

    def chunks(self):
        """Yield staged slices in upload order, blocking until each lands."""
        i = 0
        while True:
            with self._cond:
                while i >= len(self._chunks) and not self._done:
                    self._cond.wait()
                if i < len(self._chunks):
                    chunk = self._chunks[i]
                else:
                    if self._err is not None:
                        raise self._err
                    return
            yield chunk
            i += 1

    def wait(self) -> DeviceImageCache:
        """Block until staging completes; returns the shared device cache.

        The per-geometry monolithic cache arrays are assembled HERE, not in
        the staging thread: concatenating while the streaming consumer still
        holds every slice kept TWO copies of the images in HBM for the whole
        of model 1's encode (+4.25 GB at 5k measured, the difference between
        the 12.62 GB overlap-on and 8.37 GB overlap-off peaks — enough to OOM
        ColPali-first runs on a 16 GB v5e). Deferring to wait() means model 1
        coexists with ONE copy; the concat happens at the model-2 handoff,
        geometry by geometry, releasing each geometry's slices before the
        next concatenation so the transient overhead is one geometry, not the
        cache. Must not be called concurrently with an in-flight
        :meth:`chunks` iteration (the CLI consumes chunks for model 1 and
        only calls wait() afterwards)."""
        self._thread.join()
        if self._err is not None:
            raise self._err
        if self._cache is None:
            by_geom: dict[tuple[int, int], list[int]] = {}
            for i, ((h, w), _ci, _dev, _v) in enumerate(self._chunks):
                by_geom.setdefault((h, w), []).append(i)
            groups = []
            for (h, w), idxs in self._groups_idx.items():
                pos = by_geom[(h, w)]
                parts = [self._chunks[i][2] for i in pos]
                dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
                del parts
                for i in pos:  # drop slice refs before the next geometry concat
                    self._chunks[i] = None
                groups.append(((h, w), idxs, dev, len(idxs)))
            hard_sync([g[2] for g in groups])
            self._chunks = []
            self._cache = DeviceImageCache(
                groups=groups, batch_size=self.batch_size,
                n_images=self.n_images, stage_seconds=self.stage_seconds,
            )
        return self._cache


class EncodingEngine:
    """transport: 'device' resizes on-device from native-geometry uint8 (the
    fast path on co-located hosts); 'host' does PIL resize+crop on host
    threads and ships crop-sized uint8 (wins when host->device bandwidth is
    scarce — both paths are PIL-parity); 'auto' picks by measured bandwidth.
    """

    def __init__(
        self,
        model: LoadedModel,
        mesh: Mesh,
        batch_size: int = 32,
        transport: str = "auto",
        host_workers: int = 16,
        preprocess_impl: str = "xla",  # 'xla' | 'pallas' (fused kernel;
        # bit-identical, measured speed parity on v5e)
        text_dispatch: str = "scan",  # 'scan' (one whole-sweep dispatch) |
        # 'chunked' (the r2-era per-batch dispatch loop — kept for A/B
        # diagnostics of the r2->r3 mid-size QPS question)
    ):
        self.model = model
        self.mesh = mesh
        self.text_dispatch = text_dispatch
        n_data = mesh.shape["data"]
        self.batch_size = max(batch_size, n_data) // n_data * n_data
        if int(mesh.shape.get("model", 1)) > 1:
            # tensor parallelism: Megatron column/row param splits on the
            # model axis; GSPMD inserts the collectives (parallel/tp.py)
            from ..parallel.tp import shard_params_tp

            self.params = shard_params_tp(model.params, mesh)
        else:
            self.params = jax.device_put(model.params, replicated_sharding(mesh))
        if transport == "auto":
            transport = "host" if measure_put_bandwidth_mbps() < 1000.0 else "device"
        self.transport = transport
        self.host_workers = host_workers
        self.preprocess_impl = preprocess_impl

        # multi-vector embeddings stay bf16 (colpali_engine runs the model in
        # bf16 — parity AND 2x less HBM: 5k x 1030 x 128 f32 would be 2.6 GB)
        out_dtype = jnp.bfloat16 if model.multi_vector else jnp.float32

        self._img_fn = jax.jit(
            lambda params, px: l2_normalize(model_image_fwd(model, params, px)).astype(out_dtype)
        )
        self._txt_fn = jax.jit(
            lambda params, ids, mask: l2_normalize(
                model_text_fwd(model, params, ids, mask)
            ).astype(out_dtype)
        )
        self._pre_fns: dict[tuple[int, int], any] = {}
        self._norm_fn = jax.jit(make_normalize_fn(model.preprocess))

    # --- internals ---

    def _make_pre(self, h: int, w: int):
        if self.preprocess_impl == "pallas":
            from ..ops.preprocess_pallas import preprocess_pallas

            cfg = self.model.preprocess
            return lambda x: preprocess_pallas(x, cfg, h, w)
        return make_preprocess_fn(self.model.preprocess, h, w, input_format="nchw")

    def _preprocess_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._pre_fns:
            self._pre_fns[key] = jax.jit(self._make_pre(h, w))
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

        if self.transport == "host":
            order = list(range(n))
            batches = [order[s : s + self.batch_size] for s in range(0, n, self.batch_size)]

            # per-image futures: the first batch is ready after batch_size
            # single-image resizes across all workers (not one worker running
            # a whole batch), so transfers start early and PIL work, link
            # transfers, and TPU compute overlap
            with ThreadPoolExecutor(max_workers=self.host_workers) as ex:
                futs = [
                    ex.submit(host_resize_crop, self.model.preprocess, images[i]) for i in order
                ]
                for idxs in batches:
                    batch = np.stack([futs[i].result() for i in idxs]).transpose(0, 3, 1, 2)
                    pad = self.batch_size - batch.shape[0]
                    if pad:
                        batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
                    dev = jax.device_put(batch, shard_in)
                    emb = self._img_fn(self.params, self._norm_fn(dev))
                    if pad:
                        emb = emb[: len(idxs)]
                    out_chunks.append((idxs, emb))
        else:
            for (h, w), idxs in self._geometry_batches(images):
                batch = np.stack([images[i] for i in idxs]).transpose(0, 3, 1, 2)
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
        out = hard_sync(out)
        return EncodeResult(out, None, time.perf_counter() - t0)

    def _build_group_fn(self, h: int, w: int):
        """Jittable per-geometry-group forward: one ``lax.scan`` over cached
        [nb, b, C, H, W] uint8 batches doing preprocess + encode on device."""
        pre = self._make_pre(h, w)
        model = self.model
        b2 = self.batch_size  # rebatch to this model's batch

        def group_fn(params, batches):
            nb, b = batches.shape[:2]

            def fwd(batch_u8):
                px = pre(batch_u8)
                return l2_normalize(model_image_fwd(model, params, px)).astype(
                    jnp.bfloat16 if model.multi_vector else jnp.float32
                )

            if b != b2 and b % b2 == 0:
                # rebatch INSIDE the scan body: reshaping only the
                # current ~MB block, never the multi-GB cache array
                # (a whole-array reshape makes XLA materialize a
                # second copy of the cache)
                def body(_, batch_u8):
                    sub = batch_u8.reshape(b // b2, b2, *batch_u8.shape[1:])
                    _, e = jax.lax.scan(lambda __, x: (None, fwd(x)), None, sub)
                    return None, e.reshape(b, *e.shape[2:])
            else:
                def body(_, batch_u8):
                    return None, fwd(batch_u8)

            _, embs = jax.lax.scan(body, None, batches)
            return embs.reshape(-1, *embs.shape[2:])

        return group_fn

    def encode_images_cached(self, cache: DeviceImageCache) -> EncodeResult:
        """Encode from a device-resident image cache: per geometry group, one
        jitted ``lax.scan`` over batches doing preprocess + encode entirely on
        device — a single dispatch per group, no host traffic."""
        t0 = time.perf_counter()
        out_chunks: list[tuple[list[int], jax.Array]] = []
        for (h, w), idxs, dev, count in cache.groups:
            key = ("cached", h, w, dev.shape[0])
            if key not in self._pre_fns:
                self._pre_fns[key] = jax.jit(self._build_group_fn(h, w))
            emb = self._pre_fns[key](self.params, dev)[:count]
            out_chunks.append((idxs, emb))

        if len(out_chunks) == 1 and out_chunks[0][0] == list(range(cache.n_images)):
            out = out_chunks[0][1]  # single in-order group: no scatter copy
        else:
            dim_rest = out_chunks[0][1].shape[1:]
            out = jnp.zeros((cache.n_images, *dim_rest), out_chunks[0][1].dtype)
            for idxs, emb in out_chunks:
                out = out.at[jnp.asarray(idxs)].set(emb)
        out = hard_sync(out)
        return EncodeResult(out, None, time.perf_counter() - t0)

    def encode_images_streaming(self, stager: "AsyncImageStager") -> EncodeResult:
        """Encode from an in-flight :class:`AsyncImageStager`: each <=128MB
        slice is encoded as soon as its upload lands, so model 1's encode
        overlaps the staging the cached path must wait for. ``seconds``
        excludes time spent BLOCKED on uploads (stall) — keeping QPS the same
        images-per-encode-second semantics as the cached path (the reference
        excludes its disk/network staging from encode time too,
        main.py:549-561); the stall is reported in the log line.

        Each chunk's embedding is hard-synced BEFORE the stall clock restarts:
        JAX dispatch is async, so without the sync the chunk's device compute
        would overlap the next ``next(it)`` wait and be mis-counted as upload
        stall, shrinking the reported encode time to dispatch overhead (the
        round-4 advisor's finding). The background staging thread keeps
        uploading during the sync, so the overlap itself is preserved."""
        t0 = time.perf_counter()
        stall = 0.0
        out_chunks: list[tuple[list[int], jax.Array]] = []
        it = stager.chunks()
        while True:
            tw = time.perf_counter()
            chunk = next(it, None)
            stall += time.perf_counter() - tw
            if chunk is None:
                break
            (h, w), idxs, dev, valid = chunk
            key = ("cached", h, w, dev.shape[0])
            if key not in self._pre_fns:
                self._pre_fns[key] = jax.jit(self._build_group_fn(h, w))
            emb = hard_sync(self._pre_fns[key](self.params, dev)[:valid])
            out_chunks.append((idxs, emb))

        if not out_chunks:
            return EncodeResult(jnp.zeros((0,)), None, 0.0)
        dim_rest = out_chunks[0][1].shape[1:]
        out = jnp.zeros((stager.n_images, *dim_rest), out_chunks[0][1].dtype)
        for idxs, emb in out_chunks:
            out = out.at[jnp.asarray(idxs)].set(emb)
        out = hard_sync(out)
        wall = time.perf_counter() - t0
        logger = __import__("logging").getLogger("mme_tpu")
        logger.info(
            f"streaming image encode: wall {wall:.1f}s, upload stall "
            f"{stall:.1f}s, compute {wall - stall:.1f}s"
        )
        return EncodeResult(out, None, max(wall - stall, 1e-9))

    def warmup_streaming(self, stager: "AsyncImageStager") -> None:
        """Compile + upload the per-slice encode executables at the stager's
        planned slice shapes (zeros fixtures) so the streaming encode is
        compile-free inside the timed phase (COMPAT.md #2)."""
        shard = data_sharding(self.mesh, ndim=5, axis=1)
        for h, w, nbs in stager.slice_shapes():
            key = ("cached", h, w, nbs)
            if key not in self._pre_fns:
                self._pre_fns[key] = jax.jit(self._build_group_fn(h, w))
            dummy = jax.device_put(
                np.zeros((nbs, stager.batch_size, 3, h, w), np.uint8), shard
            )
            hard_sync(self._pre_fns[key](self.params, dummy))

    def encode_texts(self, texts: list[str]) -> EncodeResult:
        """One host->device put + ONE jitted ``lax.scan`` over text batches:
        a per-batch dispatch loop costs a tunnel round-trip per chunk (the
        25k-caption sweep is ~200 chunks — seconds of pure latency on a
        tunneled runtime); token ids for 25k captions are only ~6 MB, so the
        whole sweep ships and runs as a single call."""
        if not texts:
            return EncodeResult(jnp.zeros((0,)), None, 0.0)
        t0 = time.perf_counter()
        ids, mask = self.model.tokenize(texts)
        n, tlen = ids.shape
        # text sequences are tiny; the image batch size (4 for ColPali,
        # reference main.py:130) would mean thousands of scan steps for the
        # 25k caption sweep — use a wide batch for the text tower
        bs = max(self.batch_size, 128)
        nb = -(-n // bs)
        pad = nb * bs - n
        if pad:
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
            if mask is not None:
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
        ids3 = ids.reshape(nb, bs, tlen)
        mask3 = None if mask is None else mask.reshape(nb, bs, tlen)

        if self.text_dispatch == "chunked":
            # per-batch dispatch loop: one tunnel round-trip per chunk
            chunk_shard = data_sharding(self.mesh, ndim=2, axis=0)
            outs = []
            for s in range(nb):
                cid = jax.device_put(ids3[s], chunk_shard)
                cmask = None if mask3 is None else jax.device_put(mask3[s], chunk_shard)
                outs.append(self._txt_fn(self.params, cid, cmask))
            out = jnp.concatenate(outs, axis=0)[:n]
            mask_d = None if mask3 is None else jnp.asarray(mask3)
        else:
            shard_in = data_sharding(self.mesh, ndim=3, axis=1)  # [nb, bs, T]
            ids_d = jax.device_put(ids3, shard_in)
            mask_d = None if mask3 is None else jax.device_put(mask3, shard_in)
            key = ("texts", nb, bs, tlen, mask is None)
            if key not in self._pre_fns:
                self._pre_fns[key] = jax.jit(self._build_text_sweep())
            out = self._pre_fns[key](self.params, ids_d, mask_d)[:n]
        out_mask = None
        if self.model.multi_vector and mask_d is not None:
            out_mask = mask_d.reshape(-1, tlen)[:n]
        out = hard_sync(out)
        return EncodeResult(out, out_mask, time.perf_counter() - t0)

    def _build_text_sweep(self):
        """The jittable whole-sweep text forward: one ``lax.scan`` over
        [nb, bs, T] batches (see encode_texts). Split out so warmup can
        AOT-compile it at the real sweep shape before timing starts."""
        model = self.model
        out_dtype = jnp.bfloat16 if model.multi_vector else jnp.float32

        def sweep(params, ids_b, mask_b):
            def body(_, chunk):
                cid, cmask = chunk
                emb = l2_normalize(model_text_fwd(model, params, cid, cmask))
                return None, emb.astype(out_dtype)

            if mask_b is None:
                _, embs = jax.lax.scan(
                    lambda _, cid: (None, l2_normalize(
                        model_text_fwd(model, params, cid, None)).astype(out_dtype)),
                    None, ids_b,
                )
            else:
                _, embs = jax.lax.scan(body, None, (ids_b, mask_b))
            return embs.reshape(-1, *embs.shape[2:])

        return sweep

    def warmup_texts(self, text_sets: list[list[str]]) -> None:
        """Warm the text-sweep jits by RUNNING each caption set once. The
        sweep's scan length ``nb`` AND padded token length ``tlen`` are baked
        into the compiled shape, so a generic tiny warmup does NOT warm the
        real sweep — without this, each model paid one full tower compile per
        distinct sweep shape *inside* the timed encode phase (measured
        +7..17 s/model, ~2x on the fastest encoders; COMPAT.md #2 requires
        compile-free timing). Running the real sets (not AOT ``.lower().
        compile()``, measured) matters twice over on a tunneled runtime:
        (a) dynamic-padding tokenizers (ColPali ``padding='longest'``, Jina
        ``padding=True``) make ``tlen`` a property of the whole set, so only
        tokenizing the real set yields the real shape; (b) an AOT-compiled
        executable is UPLOADED to the device on its first invocation — at
        tunnel bandwidth that upload is seconds-to-tens-of-seconds landing
        inside the timed region (measured 3.4s -> 15-25s on a 64-image run
        under congestion). Execution is the only warmup that front-loads
        compile + upload + first-touch."""
        for texts in text_sets:
            if texts:
                self.encode_texts(texts)

    def warmup(
        self,
        image_geom: tuple[int, int] = (256, 256),
        images: bool = True,
        texts: bool = True,
        text_sets: list[list[str]] | None = None,
    ) -> None:
        """Compile preprocess/encode graphs before timing (reference
        main.py:536-547's GPU warmup). Pass ``text_sets`` with the caption
        sets of the timed sweeps so their exact scan shapes compile here."""
        h, w = image_geom
        if images:
            self.encode_images([np.zeros((h, w, 3), np.uint8)] * 2)
        if texts:
            if text_sets:
                self.warmup_texts(text_sets)
            else:
                self.encode_texts(["a warmup caption"] * 2)


def model_image_fwd(model: LoadedModel, params, pixels: jax.Array) -> jax.Array:
    """Dispatch to the family-specific forward. Split out so jit closes over
    static config only."""
    from .colpali import ColPaliConfig, colpali_image_fwd
    from .jina import JinaClipConfig, jina_image_fwd
    from .towers import encode_image

    if isinstance(model.cfg, ColPaliConfig):
        return colpali_image_fwd(params, model.cfg, pixels)
    if isinstance(model.cfg, JinaClipConfig):
        return jina_image_fwd(params, model.cfg, pixels)
    return encode_image(params, model.cfg, pixels)


def model_text_fwd(model: LoadedModel, params, ids: jax.Array, mask) -> jax.Array:
    from .colpali import ColPaliConfig, colpali_text_fwd
    from .jina import JinaClipConfig, jina_text_fwd
    from .towers import encode_text

    if isinstance(model.cfg, ColPaliConfig):
        return colpali_text_fwd(params, model.cfg, ids, mask)
    if isinstance(model.cfg, JinaClipConfig):
        return jina_text_fwd(params, model.cfg, ids, mask)
    return encode_text(params, model.cfg, ids, mask)
