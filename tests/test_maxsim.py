"""MaxSim kernel: Pallas (interpret mode on CPU) vs XLA reference vs numpy."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_embedding_tpu.ops.maxsim import _maxsim_pallas, maxsim_scores_ref


def _numpy_maxsim(q, d, qm, dm):
    nq, tq, _ = q.shape
    nd, td, _ = d.shape
    out = np.zeros((nq, nd), np.float32)
    for i in range(nq):
        for j in range(nd):
            sim = q[i] @ d[j].T  # [tq, td]
            sim = np.where(dm[j][None, :], sim, -1e30)
            out[i, j] = float(np.sum(np.max(sim, axis=1) * qm[i]))
    return out


@pytest.fixture
def small_problem(rng):
    nq, tq, nd, td, dim = 5, 7, 9, 33, 16
    q = rng.standard_normal((nq, tq, dim)).astype(np.float32)
    d = rng.standard_normal((nd, td, dim)).astype(np.float32)
    qm = (rng.random((nq, tq)) > 0.2).astype(np.float32)
    dm = rng.random((nd, td)) > 0.1
    return q, d, qm, dm


def test_xla_ref_matches_numpy(small_problem):
    q, d, qm, dm = small_problem
    ref = _numpy_maxsim(q, d, qm, dm)
    ours = np.asarray(maxsim_scores_ref(jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), jnp.asarray(dm), doc_chunk=4))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_pallas_matches_numpy(small_problem):
    q, d, qm, dm = small_problem
    ref = _numpy_maxsim(q, d, qm, dm)
    ours = np.asarray(
        _maxsim_pallas(
            jnp.asarray(q),
            jnp.asarray(qm),
            jnp.asarray(d),
            jnp.asarray(dm),
            block_q=4,
            block_d=4,
            token_tile=16,
            interpret=True,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_pallas_padding_edges(rng):
    # shapes deliberately not multiples of the block sizes
    nq, tq, nd, td, dim = 3, 5, 6, 19, 8
    q = rng.standard_normal((nq, tq, dim)).astype(np.float32)
    d = rng.standard_normal((nd, td, dim)).astype(np.float32)
    qm = np.ones((nq, tq), np.float32)
    dm = np.ones((nd, td), bool)
    ref = _numpy_maxsim(q, d, qm, dm)
    ours = np.asarray(
        _maxsim_pallas(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(d), jnp.asarray(dm),
            block_q=4, block_d=4, token_tile=8, interpret=True,
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_query_token_chunking(rng):
    """Long queries split into token chunks; partial sums must equal the
    unchunked result (maxsim is additive over query tokens)."""
    from multimodal_embedding_tpu.ops.maxsim import maxsim_scores

    nq, tq, nd, td, dim = 3, 150, 5, 40, 16  # tq > 64 -> chunked path
    q = rng.standard_normal((nq, tq, dim)).astype(np.float32)
    d = rng.standard_normal((nd, td, dim)).astype(np.float32)
    qm = (rng.random((nq, tq)) > 0.2).astype(np.float32)
    dm = rng.random((nd, td)) > 0.1
    ref = _numpy_maxsim(q, d, qm, dm)
    # interpret-mode pallas via the public wrapper's chunking
    import multimodal_embedding_tpu.ops.maxsim as mx

    orig = mx._maxsim_pallas
    def patched(q, qm, d, dm, **kw):
        kw.update(block_q=4, block_d=4, token_tile=8, interpret=True)
        return orig(q, qm, d, dm, **kw)
    mx._maxsim_pallas = patched
    try:
        got = np.asarray(maxsim_scores(jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), jnp.asarray(dm), impl="pallas"))
    finally:
        mx._maxsim_pallas = orig
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_maxsim_mesh_sharded_matches_single(rng):
    """Query-sharded MaxSim over the 8-device mesh == single-device result
    (non-divisible NQ exercises the pad/trim path)."""
    from multimodal_embedding_tpu.ops.maxsim import maxsim_scores
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    nq, tq, nd, td, dim = 11, 6, 7, 20, 16
    q = rng.standard_normal((nq, tq, dim)).astype(np.float32)
    d = rng.standard_normal((nd, td, dim)).astype(np.float32)
    qm = (rng.random((nq, tq)) > 0.2).astype(np.float32)
    single = np.asarray(maxsim_scores(jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), impl="xla"))
    sharded = np.asarray(
        maxsim_scores(jnp.asarray(q), jnp.asarray(d), jnp.asarray(qm), impl="xla", mesh=get_mesh())
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)
