"""Deterministic PRNG threading.

Replaces the reference's global seeding of random/numpy/torch
(main.py:152-157, SEED=42 at main.py:99) with explicit, splittable JAX keys:
one root key per run, split per consumer, so results are reproducible
regardless of execution order or device count.
"""

from __future__ import annotations

import jax

DEFAULT_SEED = 42


class KeySeq:
    """A stateful-but-explicit stream of PRNG keys.

    Each call to :meth:`next` deterministically derives a fresh key by
    fold_in of an incrementing counter — identical sequences for identical
    seeds, no hidden global state.
    """

    def __init__(self, seed: int = DEFAULT_SEED):
        self._root = jax.random.key(seed)
        self._count = 0

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._root, self._count)
        self._count += 1
        return key

    def fork(self, tag: int) -> "KeySeq":
        child = KeySeq.__new__(KeySeq)
        child._root = jax.random.fold_in(self._root, (tag << 20) + 0xC0FFEE)
        child._count = 0
        return child
