"""Score-matrix checkpoint/resume.

The reference's only resume mechanism is per-model CSV checkpointing and the
image disk cache (reference main.py:834-837, :176-182); embeddings are
recomputed on every run (SURVEY.md §5.4 calls out the missing embedding
persistence). Here the expensive encode+score stage persists its output: the
two full score matrices (plus the measured encoding time, so QPS semantics
survive a resume) keyed by model + dataset fingerprint. A rerun with the same
model/dataset skips encoding entirely and goes straight to the on-device
bootstrap — which also makes re-running the statistics with more iterations
or different seeds nearly free.
"""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("mme_tpu")


def dataset_fingerprint(records: list[dict]) -> str:
    h = hashlib.sha1()
    h.update(str(len(records)).encode())
    for r in records[:: max(1, len(records) // 128)]:  # sampled, order-sensitive
        h.update(str(r.get("imgid", "")).encode())
        h.update(r["captions"][0].encode())
    return h.hexdigest()[:16]


def numerics_fingerprint(preprocess_impl: str = "xla", maxsim_impl: str = "auto") -> str:
    """Numerics-affecting state folded into the cache key, so a rerun with a
    different ``--attention-impl`` / ``--preprocess-impl`` / ``--maxsim-impl``
    / layer fusion (or on a different backend, where 'auto' resolves
    differently) misses the cache instead of silently reusing score matrices
    computed under different numerics."""
    import jax

    from ..models.layers import get_attention_impl, get_layer_impl

    if maxsim_impl == "auto":  # resolve like ops/maxsim.py:maxsim_scores
        maxsim_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return (
        f"{jax.default_backend()}-{get_attention_impl()}"
        f"-{get_layer_impl()}-{preprocess_impl}-{maxsim_impl}"
    )


def cache_path(cache_dir: str, model_name: str, fingerprint: str, numerics: str) -> Path:
    return Path(cache_dir) / f"scores_{model_name}_{fingerprint}_{numerics}.npz"


def load_scores(
    cache_dir: str, model_name: str, records: list[dict],
    preprocess_impl: str = "xla", maxsim_impl: str = "auto",
):
    """Returns (s_t2i, s_i2t, encoding_time) or None."""
    numerics = numerics_fingerprint(preprocess_impl, maxsim_impl)
    p = cache_path(cache_dir, model_name, dataset_fingerprint(records), numerics)
    if not p.exists():
        return None
    try:
        data = np.load(p)
        logger.info(f"Resuming from score cache {p} (encode skipped)")
        return data["s_t2i"], data["s_i2t"], float(data["encoding_time"])
    except Exception as e:
        logger.warning(f"Score cache {p} unreadable ({e}); re-encoding")
        return None


def save_scores(
    cache_dir: str, model_name: str, records: list[dict], s_t2i, s_i2t, encoding_time: float,
    preprocess_impl: str = "xla", maxsim_impl: str = "auto",
) -> None:
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    numerics = numerics_fingerprint(preprocess_impl, maxsim_impl)
    p = cache_path(cache_dir, model_name, dataset_fingerprint(records), numerics)
    np.savez(
        p,
        s_t2i=np.asarray(s_t2i, np.float32),
        s_i2t=np.asarray(s_i2t, np.float32),
        encoding_time=np.float64(encoding_time),
    )
    logger.info(f"Score matrices checkpointed to {p}")
