"""Mergeable sketches for approximate aggregates at 100 TB scale.

HyperLogLog with ``p``-bit register indexing (default p=12 → 4096
one-byte registers per group). The register update is fully vectorized
(one ``np.maximum.at`` per batch) and the sketch MERGES by elementwise
max — the property that lets Ray's aggregate protocol combine per-block
partials without moving raw values. The hash is the engine-wide
``mix64`` (splitmix64 finalizer), so the sketch is a pure function of
the value multiset: the independent golden implementation reproduces it
register-for-register and the comparison is value-exact despite the
estimate being approximate.

Estimator: the classic HLL-with-linear-counting form (Flajolet et al.;
small-range correction when E ≤ 2.5m and empty registers exist). No
64-bit large-range correction — inputs here are ≪ 2^32.
"""

from __future__ import annotations

import numpy as np

from .hashing import mix64

P = 12
M = 1 << P                      # registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_empty() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def hll_add(reg: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Fold a uint64 value array into the register set (in place)."""
    h = mix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)
    # rank = leading zeros of the remaining 64-P bits, +1 (capped there
    # by the OR-ed low-bit guard above)
    nlz = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    live = np.ones(len(h), dtype=bool)
    for _ in range(64 - P + 1):
        hit = live & ((cur & mask) == 0)
        nlz[hit] += 1
        live &= hit
        if not live.any():
            break
        cur = cur << np.uint64(1)
    np.maximum.at(reg, idx, nlz + 1)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> int:
    e = _ALPHA * M * M / float(np.power(2.0, -reg.astype(np.float64)).sum())
    zeros = int((reg == 0).sum())
    if e <= 2.5 * M and zeros:
        e = M * np.log(M / zeros)    # linear counting
    return int(np.floor(e))
