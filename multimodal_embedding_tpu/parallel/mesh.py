"""Device mesh and sharding core.

The reference is single-GPU (SURVEY.md §2.4: no torch.distributed / NCCL
anywhere; DEVICE selection at reference main.py:92). On TPU the idiomatic
scale-out for this workload is pure data parallelism over the ICI mesh:
batches and retrieval-matrix rows are sharded along a ``data`` axis, model
parameters are replicated (largest tower ~1GB bf16, far under v5e HBM), and
XLA inserts the collectives.

A second ``model`` axis is carried in the mesh signature for future tensor
parallelism, sized 1 by default.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over available devices.

    ``n_data`` defaults to ``len(devices) // n_model``. Works identically for
    real TPU chips and ``xla_force_host_platform_device_count`` CPU devices.
    In a multi-host (DCN) setting, devices are ordered host-major by
    ``jax.devices()``, so the batch-sharded data axis keeps each host's shard
    on its local chips and the replicated-params all-gathers ride ICI within
    a host; use :func:`get_multihost_mesh` to make the DCN axis explicit.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_model > len(devices):
        raise ValueError(
            f"--tensor-parallel {n_model} needs {n_model} devices, have {len(devices)}"
        )
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if n_data < 1 or need > len(devices):
        raise ValueError(f"mesh ({n_data}x{n_model}) needs {need} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def get_multihost_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh for multi-host runs built with
    ``jax.experimental.mesh_utils`` so the data axis is contiguous over DCN
    (outer) x ICI (inner) — collectives along ``model`` stay on-host."""
    from jax.experimental import mesh_utils

    n_dev = len(jax.devices())
    dev_array = mesh_utils.create_device_mesh((n_dev // n_model, n_model))
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array along the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
