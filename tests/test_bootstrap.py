"""On-device bootstrap vs a faithful numpy reimplementation of the reference
resampling protocol (main.py:586-634): for each device-produced sample, rebuild
the gathered score matrices and recompute metrics with topk tie semantics.
"""

import numpy as np
import jax.numpy as jnp

from multimodal_embedding_tpu.stats.bootstrap import bootstrap_benchmark
from multimodal_embedding_tpu.stats.ci import bootstrap_confidence_interval, permutation_test


def _topk_correct(row: np.ndarray, targets: list[int], k: int) -> bool:
    order = np.lexsort((np.arange(len(row)), -row))
    topk = set(order[:k].tolist())
    return any(t in topk for t in targets)


def _reference_metrics(s_t2i, s_i2t, idx, ks=(1, 5, 10)):
    """The reference's per-iteration computation (main.py:588-633), numpy."""
    n = len(idx)
    g_t = s_t2i[np.ix_(idx, idx)]  # [caps, imgs]
    cap_idx = (np.asarray(idx)[:, None] * 5 + np.arange(5)[None, :]).ravel()
    g_i = s_i2t[idx][:, cap_idx]  # [imgs, 5N caps]
    g_sym = g_t.T

    out = {}
    for k in ks:
        out[f"T2I_R@{k}"] = 100 * np.mean([_topk_correct(g_t[r], [r], min(k, n)) for r in range(n)])
        out[f"I2T_R@{k}"] = 100 * np.mean(
            [_topk_correct(g_i[r], list(range(5 * r, 5 * r + 5)), min(k, 5 * n)) for r in range(n)]
        )
        out[f"I2T_Sym_R@{k}"] = 100 * np.mean(
            [_topk_correct(g_sym[r], [r], min(k, n)) for r in range(n)]
        )
    return out


def test_bootstrap_matches_reference_protocol(rng):
    n, iters = 24, 5
    s_t2i = rng.standard_normal((n, n)).astype(np.float32)
    s_i2t = rng.standard_normal((n, 5 * n)).astype(np.float32)

    out = bootstrap_benchmark(jnp.asarray(s_t2i), jnp.asarray(s_i2t), iters, seed=7)

    assert out.sample_idx.shape == (iters, n)
    assert out.correct_r1.shape == (iters, n)
    # samples must differ across iterations and cover with replacement
    assert len(np.unique(out.sample_idx[0])) < n or iters == 1

    for it in range(iters):
        ref = _reference_metrics(s_t2i, s_i2t, out.sample_idx[it])
        for name, val in ref.items():
            got = out.metrics[name][it]
            assert abs(got - val) < 1e-3, (it, name, got, val)

    # correct_r1 consistency with the T2I R@1 metric
    np.testing.assert_allclose(
        out.correct_r1.mean(axis=1) * 100, out.metrics["T2I_R@1"], atol=1e-3
    )


def test_bootstrap_duplicate_tie_handling():
    """With a constant sample (all same image), the target ties with every
    duplicate; only the first occurrence can be R@1-correct."""
    n = 8
    s_t2i = np.eye(n, dtype=np.float32)  # diag is always the max
    s_i2t = np.zeros((n, 5 * n), np.float32)
    for i in range(n):
        s_i2t[i, 5 * i : 5 * i + 5] = 1.0
    out = bootstrap_benchmark(jnp.asarray(s_t2i), jnp.asarray(s_i2t), 3, seed=1)
    for it in range(3):
        ref = _reference_metrics(s_t2i, s_i2t, out.sample_idx[it])
        for name, val in ref.items():
            assert abs(out.metrics[name][it] - val) < 1e-3, (it, name)


def test_confidence_interval():
    data = np.random.default_rng(0).normal(50.0, 2.0, size=1000)
    mean, lo, hi = bootstrap_confidence_interval(data)
    assert abs(mean - 50.0) < 0.5
    assert lo < mean < hi
    assert (hi - lo) < 1.0  # ~2 * 1.96 * 2/sqrt(1000) ≈ 0.25


def test_permutation_test():
    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 1.0, 200)
    b = rng.normal(0.0, 1.0, 200)
    c = rng.normal(1.0, 1.0, 200)
    assert permutation_test(a, b) > 0.05
    assert permutation_test(a, c) < 0.01


def test_bootstrap_single_caption_protocol(rng):
    """caps_per_image=1 (DocVQA-style): I2T multi == I2T sym semantics."""
    n, iters = 16, 4
    s_t2i = rng.standard_normal((n, n)).astype(np.float32)
    s_i2t = rng.standard_normal((n, n)).astype(np.float32)
    out = bootstrap_benchmark(
        jnp.asarray(s_t2i), jnp.asarray(s_i2t), iters, seed=3, caps_per_image=1
    )
    for it in range(iters):
        idx = out.sample_idx[it]
        g_i = s_i2t[idx][:, idx]
        for k in (1, 5, 10):
            ref = 100 * np.mean(
                [_topk_correct(g_i[r], [r], min(k, n)) for r in range(n)]
            )
            assert abs(out.metrics[f"I2T_R@{k}"][it] - ref) < 1e-3


def test_bootstrap_mesh_sharding_identical(rng):
    """Iteration-sharded bootstrap over the 8-device mesh must be
    BIT-IDENTICAL to the single-device run (placement-independent per-
    iteration keys), including a non-divisible iteration count."""
    from multimodal_embedding_tpu.parallel.mesh import get_mesh

    n, iters = 20, 11  # 11 % 8 != 0 -> padding/trim path
    s_t2i = rng.standard_normal((n, n)).astype(np.float32)
    s_i2t = rng.standard_normal((n, 5 * n)).astype(np.float32)
    single = bootstrap_benchmark(jnp.asarray(s_t2i), jnp.asarray(s_i2t), iters, seed=9)
    sharded = bootstrap_benchmark(
        jnp.asarray(s_t2i), jnp.asarray(s_i2t), iters, seed=9, mesh=get_mesh()
    )
    for k in single.metrics:
        np.testing.assert_array_equal(single.metrics[k], sharded.metrics[k])
    np.testing.assert_array_equal(single.sample_idx, sharded.sample_idx)
    np.testing.assert_array_equal(single.correct_r1, sharded.correct_r1)


def test_bootstrap_partial_own_caption_ties(rng):
    """Two of each image's five captions share an exact score (the q_ties /
    e_lt bookkeeping path) — device results must still match the reference
    topk emulation per sample."""
    n, iters = 12, 6
    s_t2i = rng.standard_normal((n, n)).astype(np.float32)
    s_i2t = rng.standard_normal((n, 5 * n)).astype(np.float32)
    for i in range(n):
        # caption 1 ties caption 3 of the same image; caption 0 ties caption 4
        s_i2t[i, 5 * i + 3] = s_i2t[i, 5 * i + 1]
        s_i2t[i, 5 * i + 4] = s_i2t[i, 5 * i + 0]
    out = bootstrap_benchmark(jnp.asarray(s_t2i), jnp.asarray(s_i2t), iters, seed=13)
    for it in range(iters):
        ref = _reference_metrics(s_t2i, s_i2t, out.sample_idx[it])
        for name, val in ref.items():
            assert abs(out.metrics[name][it] - val) < 1e-3, (it, name)
