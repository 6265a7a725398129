"""Profiler integration (SURVEY.md §5.1).

The reference has wall-clock timing only (no torch.profiler / nsys). TPU
equivalent: ``jax.profiler`` traces viewable in TensorBoard/Perfetto, plus
named trace annotations around the benchmark phases. Enabled by the CLI's
``--profile-dir``.
"""

from __future__ import annotations

import contextlib
import logging

import jax

logger = logging.getLogger("mme_tpu")


@contextlib.contextmanager
def maybe_trace(profile_dir: str | None):
    """Capture a jax.profiler trace for the enclosed region if a directory is
    given; no-op otherwise."""
    if not profile_dir:
        yield
        return
    logger.info(f"Capturing device trace to {profile_dir}")
    with jax.profiler.trace(profile_dir):
        yield
    logger.info(f"Trace written to {profile_dir} (view with TensorBoard/Perfetto)")


def annotate(name: str):
    """Named sub-region annotation inside a trace."""
    return jax.profiler.TraceAnnotation(name)
