"""Multi-host mesh (DCN-outer x ICI-inner device ordering).

``get_multihost_mesh`` builds the (data, model) mesh with
``mesh_utils.create_device_mesh`` so that, on a real multi-host slice, the
data axis is contiguous over DCN and model-axis collectives stay on-host.
On the 8-virtual-CPU-device session this exercises the exact code path with
the same mesh shapes a 2-host x 4-chip slice would produce, and asserts the
sharded statistics pipeline is bit-identical to the flat single-host mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_embedding_tpu.parallel.mesh import get_mesh, get_multihost_mesh
from multimodal_embedding_tpu.retrieval.scoring import dense_scores
from multimodal_embedding_tpu.stats.bootstrap import bootstrap_benchmark


def test_multihost_mesh_shape_and_axes():
    mesh = get_multihost_mesh(n_model=1)
    assert mesh.axis_names == ("data", "model")
    assert dict(mesh.shape) == {"data": len(jax.devices()), "model": 1}

    mesh2 = get_multihost_mesh(n_model=2)
    assert dict(mesh2.shape) == {"data": len(jax.devices()) // 2, "model": 2}


def test_multihost_scoring_and_bootstrap_bit_identical_to_flat_mesh(rng):
    n, d, caps = 64, 16, 5
    txt = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    img = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    txt_all = jnp.asarray(rng.normal(size=(n * caps, d)), jnp.float32)

    flat = get_mesh()  # devices in jax.devices() order
    multi = get_multihost_mesh()  # devices in create_device_mesh order

    results = {}
    for name, mesh in (("flat", flat), ("multi", multi)):
        s_t2i = dense_scores(txt, img, mesh=mesh)
        s_i2t = dense_scores(img, txt_all, mesh=mesh)
        out = bootstrap_benchmark(s_t2i, s_i2t, 10, seed=42, caps_per_image=caps, mesh=mesh)
        results[name] = (np.asarray(s_t2i), np.asarray(s_i2t), out.metrics)

    np.testing.assert_array_equal(results["flat"][0], results["multi"][0])
    np.testing.assert_array_equal(results["flat"][1], results["multi"][1])
    for key in results["flat"][2]:
        np.testing.assert_array_equal(results["flat"][2][key], results["multi"][2][key])
