"""Seeded PRNG utilities.

The reference seeds ``random``/``np``/``torch`` globally with seed 7
(reference: Training/compare_dacvsproposal_3.py:79-80) and uses deterministic
per-file mask seeds in the PLC evals (reference: PLC/PLC1_eval.py:588-590).
JAX is functional: we thread explicit keys, folding in well-known integers so every
consumer is reproducible without global state.
"""

from __future__ import annotations

import jax

DEFAULT_SEED = 7  # reference: Training/compare_dacvsproposal_3.py:50


def root_key(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.key(seed)


def fold(key: jax.Array, *tags: int) -> jax.Array:
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def split_tree(key: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}
