"""Device memory telemetry.

Replaces the reference's ``torch.cuda.max_memory_allocated`` peak reporting
(main.py:163-167) with JAX device memory stats (HBM bytes in use / peak where
the backend exposes them).
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger("mme_tpu")


def device_memory_stats(device: "jax.Device | None" = None) -> dict:
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:  # backend without memory_stats (e.g. CPU)
        stats = {}
    out = {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
    if not out["bytes_in_use"]:
        # backends without memory_stats (remote/tunneled runtimes): sum the
        # client's live arrays as a lower bound on HBM in use
        try:
            out["bytes_in_use"] = sum(a.nbytes for a in jax.live_arrays())
            out["peak_bytes_in_use"] = max(out["peak_bytes_in_use"], out["bytes_in_use"])
        except Exception:
            pass
    return out


def report_memory(device: "jax.Device | None" = None) -> float:
    """Log peak (or live lower-bound) device memory in GB."""
    stats = device_memory_stats(device)
    peak_gb = stats["peak_bytes_in_use"] / 1e9
    logger.info(f"    Device Memory Peak: {peak_gb:.2f} GB")
    return peak_gb
