"""Count-Min sketch (Cormode & Muthukrishnan 2005 — public algorithm):
fixed-size integer frequency summary with one-sided error
(``estimate ≥ true count``, overestimate ≤ e·N/width with prob.
1−e^−depth).

Counters are int64 and every update is an integer add, so the sketch is
a pure function of the (multi)set of inserts — merge-order and
partition invariant, exactly like the HLL sketch in ``state/hll.py``.
Row hashes derive from the engine's one true hash (``hash64`` → md5)
via splitmix64 rounds (``mix64``), so an independent oracle can
reproduce identical cells (tools/make_goldens.py does).

Distributed shape: each ``map_batches`` block builds a local sketch and
emits only its NONZERO cells as (cell, count) rows; a ``groupby(cell)``
sum materializes the merged sketch (≤ depth·width rows total move, no
matter how many input blocks). ``pipelines/analytics.top_tokens_cms``
wires this up.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import mix64

DEPTH = 4
WIDTH = 2048


def cell_indices(hashes: np.ndarray, depth: int = DEPTH,
                 width: int = WIDTH) -> np.ndarray:
    """(depth, n) array of cell columns for each key hash: row r uses
    the r-th splitmix64 round of the key's hash64."""
    out = np.empty((depth, len(hashes)), dtype=np.int64)
    h = hashes.astype(np.uint64, copy=True)
    for r in range(depth):
        h = mix64(h)
        out[r] = (h % np.uint64(width)).astype(np.int64)
    return out


def sketch_counts(hashes: np.ndarray, counts: np.ndarray,
                  depth: int = DEPTH, width: int = WIDTH) -> np.ndarray:
    """Build a (depth, width) int64 sketch from (key-hash, count) pairs."""
    sk = np.zeros((depth, width), dtype=np.int64)
    idx = cell_indices(hashes, depth, width)
    for r in range(depth):
        np.add.at(sk[r], idx[r], counts)
    return sk


def estimate(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Min-over-rows point estimates for each key hash."""
    idx = cell_indices(hashes, sk.shape[0], sk.shape[1])
    ests = np.stack([sk[r][idx[r]] for r in range(sk.shape[0])])
    return ests.min(axis=0)
