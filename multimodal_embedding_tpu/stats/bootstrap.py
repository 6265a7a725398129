"""On-device vmapped bootstrap resampling — the core statistical engine.

The reference's bootstrap (main.py:586-634) re-gathers embeddings, re-runs
similarity matmuls, and loops ``torch.topk`` in python for every one of the
1000 iterations — hours per model on an A40. The TPU redesign reduces each
iteration to O(N^2) *matvecs* against precomputed comparison matrices:

For bootstrap sample ``idx`` (size N, with replacement), T2I query r targets
image idx[r], and its target score is the DIAGONAL S[idx[r], idx[r]] — fixed
across iterations. So precompute once:

    C_t2i[a, b] = S_t2i[a, b] > S_t2i[a, a]      (image b outranks a's target)
    C_sym[a, b] = S_t2i[b, a] > S_t2i[a, a]      (caption b outranks, I2T-sym)
    T[a, t]     = S_i2t[a, 5a + t]               (I2T multi thresholds)

and each iteration's ranks become

    rank_t2i[r] = (C_t2i @ m)[idx[r]] + dup_before[r]
    rank_sym[r] = (C_sym @ m)[idx[r]] + dup_before[r]
    rank_i2t[r] = min_t ((S_i2t > T[:, t]) @ m_cap)[idx[r]] + dup_before[r]

where ``m`` is the sample multiplicity vector (bincount of idx) and
``dup_before[r]`` counts earlier occurrences of idx[r] in the sample — this
reproduces torch.topk's index-ordered tie-breaking among exact duplicate
gallery entries (duplicates tie with the target at identical float scores).
Everything runs inside one ``lax.scan`` over iterations; per-iteration cost is
a few [N, N] matvecs plus one fused pass over the [N, 5N] I2T matrix.

Recall@K per iteration, per-query T2I R@1 correctness (for failure
analysis, main.py:341-356) and the sample indices come back in a single
device->host transfer at the end.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_KS = (1, 5, 10)


@dataclass
class BootstrapOutput:
    metrics: dict[str, np.ndarray]  # metric name -> [iterations] values (%)
    correct_r1: np.ndarray  # [iterations, N] bool — per-query T2I R@1
    sample_idx: np.ndarray  # [iterations, N] int32


def _dup_before(idx: jax.Array) -> jax.Array:
    """dup_before[r] = #{j < r : idx[j] == idx[r]} via one stable argsort."""
    n = idx.shape[0]
    order = jnp.argsort(idx, stable=True)
    sorted_idx = idx[order]
    pos = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sorted_idx[1:] != sorted_idx[:-1]])
    group_start = jax.lax.associative_scan(jnp.maximum, jnp.where(is_start, pos, 0))
    within = pos - group_start
    return jnp.zeros((n,), jnp.int32).at[order].set(within.astype(jnp.int32))


def bootstrap_benchmark(
    scores_t2i: jax.Array,
    scores_i2t: jax.Array,
    n_iterations: int,
    seed: int = 42,
    ks: tuple[int, ...] = DEFAULT_KS,
    caps_per_image: int = 5,
    mesh=None,
) -> BootstrapOutput:
    """scores_t2i [N, N] (rows = first-caption queries, cols = images, target
    on the diagonal); scores_i2t [N, K*N] (rows = images, caption block
    K*i..K*i+K-1 belongs to image i; K = caps_per_image, 5 for the COCO
    protocol). Returns per-iteration Recall@K for the three protocols
    (reference main.py:331-378).

    With a multi-device ``mesh``, iterations shard across the ``data`` axis
    (embarrassingly parallel; scores replicate). Iteration i's sample comes
    from ``fold_in(seed, i)`` regardless of placement, so sharded and
    single-device runs produce BIT-IDENTICAL outputs
    (tests/test_bootstrap.py::test_bootstrap_mesh_sharding_identical)."""
    n = scores_t2i.shape[0]
    kc = caps_per_image
    s_t = jnp.asarray(scores_t2i, jnp.float32)
    s_i = jnp.asarray(scores_i2t, jnp.float32)

    diag = jnp.diagonal(s_t)  # [N] target scores
    c_t2i = (s_t > diag[:, None]).astype(jnp.bfloat16)  # [N, N]
    c_sym = (s_t.T > diag[:, None]).astype(jnp.bfloat16)  # row a: caption b vs a's diag
    own = jnp.take_along_axis(
        s_i, (jnp.arange(n)[:, None] * kc + jnp.arange(kc)[None, :]), axis=1
    )  # [N, K] scores of image a's own captions
    thr = own
    # Tie bookkeeping among exact duplicates (the only exact-score ties the
    # bootstrap introduces): q[a, t] = #own caps tying with threshold t (each
    # earlier duplicate block contributes q tied entries before the target);
    # e_lt[a, t] = #own caps at an earlier in-block position tying with t.
    eq_own = own[:, :, None] == own[:, None, :]  # [N, 5(t), 5(s)]
    q_ties = jnp.sum(eq_own, axis=2).astype(jnp.float32)  # [N, 5]
    s_before_t = jnp.arange(kc)[None, :] < jnp.arange(kc)[:, None]  # [K(t), K(s)]
    e_lt = jnp.sum(eq_own & s_before_t[None], axis=2).astype(jnp.float32)  # [N, 5]

    root = jax.random.key(seed)

    def step(carry, it):
        key = jax.random.fold_in(root, it)
        idx = jax.random.randint(key, (n,), 0, n)
        m = jnp.zeros((n,), jnp.float32).at[idx].add(1.0)
        m_cap = jnp.repeat(m, kc)  # caption multiplicities, block layout

        v_t2i = jnp.dot(c_t2i, m.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        v_sym = jnp.dot(c_sym, m.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        # I2T multi: one fused pass over [N, 5N] with 5 threshold accumulators
        u = jnp.einsum(
            "c,nct->nt",
            m_cap,
            (s_i[:, :, None] > thr[:, None, :]).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # [N, 5]

        dup = _dup_before(idx).astype(jnp.float32)
        rank_t2i = v_t2i[idx] + dup
        rank_sym = v_sym[idx] + dup
        # per-threshold rank: strict-greater count + duplicate-block ties
        # before the target + earlier in-block ties; best caption wins
        rank_i2t = jnp.min(
            u[idx] + dup[:, None] * q_ties[idx] + e_lt[idx], axis=1
        )

        mets = []
        for k in ks:
            mets.append(100.0 * jnp.mean(rank_t2i < min(k, n)))
        for k in ks:
            mets.append(100.0 * jnp.mean(rank_i2t < min(k, kc * n)))
        for k in ks:
            mets.append(100.0 * jnp.mean(rank_sym < min(k, n)))
        correct_r1 = rank_t2i < 1

        return carry, (jnp.stack(mets), correct_r1, idx.astype(jnp.int32))

    n_data = int(mesh.shape["data"]) if mesh is not None else 1
    if n_data > 1:
        # pad the iteration count to the mesh, scan per shard, trim after
        pad_iters = -(-n_iterations // n_data) * n_data
        iters = jnp.arange(pad_iters).reshape(n_data, pad_iters // n_data)
        from jax.sharding import NamedSharding, PartitionSpec as P

        iters = jax.device_put(iters, NamedSharding(mesh, P("data", None)))

        def shard_scan(iter_chunk):
            _, ys = jax.lax.scan(step, None, iter_chunk)
            return ys

        met_arr, correct, idxs = jax.jit(jax.vmap(shard_scan))(iters)
        met_arr = np.asarray(jax.block_until_ready(met_arr)).reshape(pad_iters, -1)[
            :n_iterations
        ]
        correct = np.asarray(correct).reshape(pad_iters, -1)[:n_iterations]
        idxs = np.asarray(idxs).reshape(pad_iters, -1)[:n_iterations]
    else:
        _, (met_arr, correct, idxs) = jax.lax.scan(step, None, jnp.arange(n_iterations))
        met_arr = np.asarray(jax.block_until_ready(met_arr))
    # f32 accumulation can land epsilon outside [0, 100]
    met_arr = np.clip(met_arr, 0.0, 100.0)

    names = (
        [f"T2I_R@{k}" for k in ks] + [f"I2T_R@{k}" for k in ks] + [f"I2T_Sym_R@{k}" for k in ks]
    )
    metrics = {name: met_arr[:, i] for i, name in enumerate(names)}
    return BootstrapOutput(
        metrics=metrics,
        correct_r1=np.asarray(correct),
        sample_idx=np.asarray(idxs),
    )
