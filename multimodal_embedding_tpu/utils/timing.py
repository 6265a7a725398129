"""Device-accurate timing helpers.

The reference times its encode phase with wall clocks around CUDA work plus
``torch.cuda.synchronize`` (main.py:534-546). The JAX equivalent is
``jax.block_until_ready`` on the outputs; these helpers encapsulate that so
QPS numbers measure device completion, not async dispatch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax


@dataclass
class Timer:
    """Accumulating named phase timer."""

    phases: dict[str, float] = field(default_factory=dict)
    _start: dict[str, float] = field(default_factory=dict)

    def start(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def stop(self, name: str, sync: Any = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._start.pop(name)
        self.phases[name] = self.phases.get(name, 0.0) + dt
        return dt

    def __getitem__(self, name: str) -> float:
        return self.phases[name]


def block_until_ready_timed(fn: Callable[..., Any], *args: Any, **kwargs: Any) -> tuple[Any, float]:
    """Run ``fn`` and block on its outputs; return (result, elapsed_seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def hard_sync(x: Any) -> Any:
    """Genuinely wait for device work feeding ``x`` to finish.

    ``jax.block_until_ready`` returns immediately on some remote/tunneled
    platforms (observed on 'axon'); reading one element back to the host is
    the only reliable barrier. Use around timed regions only — it costs one
    tiny device->host transfer.
    """
    x = jax.block_until_ready(x)
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "ravel") and l.size > 0]
    if leaves:
        import numpy as np

        np.asarray(jax.device_get(leaves[0].ravel()[0]))
    return x
