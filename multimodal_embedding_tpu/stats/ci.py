"""Bootstrap confidence intervals and permutation tests, on device.

Same statistical definitions as the reference (main.py:259-302): percentile
bootstrap CI with 10,000 inner resamples of the per-iteration metric values,
and a two-sided permutation test on |mean difference| with 10,000 shuffles —
but vmapped on device instead of a python loop, so running the *real*
permutation test between every model pair is cheap (the reference's offline
analyzer falls back to a CI-overlap approximation it itself documents as a
limitation, analyze_statistical_results.py:52-54).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def bootstrap_confidence_interval(
    data: np.ndarray,
    confidence: float = 0.95,
    n_bootstrap: int = 10_000,
    seed: int = 0,
) -> tuple[float, float, float]:
    """Returns (mean, lower, upper) — percentile method (main.py:259-278)."""
    x = jnp.asarray(data, jnp.float32)
    n = x.shape[0]
    key = jax.random.key(seed)
    idx = jax.random.randint(key, (n_bootstrap, n), 0, n)
    means = jnp.mean(x[idx], axis=1)
    alpha = (1.0 - confidence) / 2.0
    lower = jnp.percentile(means, alpha * 100.0)
    upper = jnp.percentile(means, (1.0 - alpha) * 100.0)
    return float(jnp.mean(x)), float(lower), float(upper)


def permutation_test(
    data1: np.ndarray,
    data2: np.ndarray,
    n_permutations: int = 10_000,
    seed: int = 0,
) -> float:
    """Two-sided p-value for H0: same distribution (main.py:281-302)."""
    x1 = jnp.asarray(data1, jnp.float32)
    x2 = jnp.asarray(data2, jnp.float32)
    observed = jnp.abs(jnp.mean(x1) - jnp.mean(x2))
    combined = jnp.concatenate([x1, x2])
    n1, n = x1.shape[0], combined.shape[0]

    def one(key):
        perm = jax.random.permutation(key, combined)
        return jnp.abs(jnp.mean(perm[:n1]) - jnp.mean(perm[n1:]))

    keys = jax.random.split(jax.random.key(seed), n_permutations)
    diffs = jax.lax.map(one, keys, batch_size=256)
    return float(jnp.mean((diffs >= observed).astype(jnp.float32)))
