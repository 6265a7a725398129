"""ctypes bindings for the native staging kernel (native/staging.cpp).

The .so is built on first use with the checked-in Makefile (g++, no external
deps); every entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger("mme_tpu")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: "ctypes.CDLL | None | bool" = None  # None = untried, False = unavailable


def _load() -> "ctypes.CDLL | None":
    global _LIB
    if _LIB is None:
        so = _NATIVE_DIR / "libstaging.so"
        try:
            if not so.exists():
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
                )
            lib = ctypes.CDLL(str(so))
            lib.hwc_to_chw_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.hwc_to_chw_batch.restype = None
            _LIB = lib
        except Exception as e:  # no toolchain / load failure -> numpy fallback
            logger.info(f"native staging kernel unavailable ({e}); using numpy")
            _LIB = False
    return _LIB or None


def hwc_to_chw_batch(
    images: list[np.ndarray],
    out: np.ndarray | None = None,
    n_threads: int | None = None,
    impl: str = "auto",
) -> np.ndarray:
    """Pack HWC uint8 images of one geometry into a [N, 3, H, W] buffer.

    impl: 'auto' picks the native threaded kernel on >2-core hosts (a
    single-threaded numpy copy beats the scalar C loop; the kernel wins by
    threading), 'native' forces the C++ kernel (raises if unbuildable),
    'numpy' forces the fallback — the explicit modes exist so tests can
    assert on each path.
    """
    assert impl in ("auto", "native", "numpy")
    n = len(images)
    h, w, _ = images[0].shape
    if out is None:
        out = np.empty((n, 3, h, w), np.uint8)
    threads_avail = os.cpu_count() or 1
    if impl == "numpy":
        lib = None
    elif impl == "native":
        lib = _load()
        if lib is None:
            raise RuntimeError("native staging kernel requested but unavailable")
    else:
        lib = _load() if threads_avail > 2 else None
    if lib is None:
        for i, im in enumerate(images):
            out[i] = im.transpose(2, 0, 1)
        return out

    contig = [np.ascontiguousarray(im) for im in images]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p).value for im in contig])
    threads = n_threads or min(8, os.cpu_count() or 1)
    lib.hwc_to_chw_batch(
        ptrs, out.ctypes.data_as(ctypes.c_void_p), n, h, w, threads
    )
    return out
