"""Sharded batched application of a jitted function over a large host array.

This is the TPU replacement for the reference's per-batch python encode loop
(reference main.py:399-436): the host array is cut into device-batch slices,
each slice is placed with a batch-sharded ``NamedSharding`` so the per-chip
work is ``batch/n_data``, and the jitted function runs under the mesh. Static
shapes are preserved by padding the tail batch (XLA requires one compilation
per shape; the pad rows are dropped on the host side).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .mesh import data_sharding


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)


def sharded_batch_apply(
    fn: Callable[..., Any],
    inputs: "np.ndarray | jax.Array | tuple",
    *,
    mesh: Mesh,
    batch_size: int,
    out_collect: Callable[[list], Any] | None = None,
    donate: bool = False,
) -> Any:
    """Apply ``fn`` over ``inputs`` in sharded device batches.

    ``inputs`` may be one array or a tuple of arrays sharing a leading axis.
    ``fn`` must map batch → batch (leading axis preserved). Returns the
    concatenated outputs with padding removed. Multiple outputs (tuple pytree)
    are concatenated leaf-wise.
    """
    tup = inputs if isinstance(inputs, tuple) else (inputs,)
    n = tup[0].shape[0]
    if n == 0:
        raise ValueError("empty input")

    n_data = mesh.shape["data"]
    # Batch must divide evenly over the data axis for an even layout.
    eff_bs = pad_to_multiple(batch_size, n_data)
    jfn = jax.jit(fn, donate_argnums=tuple(range(len(tup))) if donate else ())

    outs: list[Any] = []
    for start in range(0, n, eff_bs):
        stop = min(start + eff_bs, n)
        batch = tuple(x[start:stop] for x in tup)
        pad = eff_bs - (stop - start)
        if pad:
            batch = tuple(
                jnp.concatenate([jnp.asarray(x), jnp.repeat(jnp.asarray(x[-1:]), pad, axis=0)])
                if not isinstance(x, np.ndarray)
                else np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
                for x in batch
            )
        batch = tuple(
            jax.device_put(x, data_sharding(mesh, ndim=np.ndim(x), axis=0)) for x in batch
        )
        out = jfn(*batch)
        if pad:
            out = jax.tree.map(lambda o: o[: eff_bs - pad], out)
        outs.append(out)

    if out_collect is not None:
        return out_collect(outs)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
