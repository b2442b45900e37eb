"""Deterministic 90/5/5 split.

The reference uses two *unseeded* ``sklearn.train_test_split`` calls
(reference: recordutil.py:191-192), so its splits are irreproducible.  We
keep the same split-size arithmetic (floor(0.9·n) train, then an even
valid/test split of the remainder, matching sklearn's train_size semantics)
but drive it from a seeded permutation so every experiment is reproducible
from ``params.seed``.

Escape hatch: ``"seed": null`` in params.json reproduces the reference's
actual unseeded behavior (fresh OS entropy per run) for A/B artifact
comparison against a live reference run.
"""

from __future__ import annotations

import numpy as np


def split_indices(
    n: int, seed: int | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (train_idx, valid_idx, test_idx) index arrays.  ``seed=None``
    draws OS entropy, like the reference's unseeded sklearn split."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_train = int(np.floor(0.9 * n))
    rest = perm[n_train:]
    n_valid = int(np.floor(0.5 * len(rest)))
    return perm[:n_train], rest[:n_valid], rest[n_valid:]


def split_segments(segments: list, seed: int):
    tr, va, te = split_indices(len(segments), seed)
    pick = lambda idx: [segments[i] for i in idx]
    return pick(tr), pick(va), pick(te)
