"""Deterministic 64-bit hashing shared by the engine, the spec oracle and
the synthetic world generator.

The reference uses Swift's ``hash_path`` (MD5 of the ring-salted
``/account/container`` path) for placement [recon:
``container_crawler/__init__.py:≈170–190``]. We keep MD5 as the one true
hash so every component (numpy-vectorized engine stages, the pure-Python
oracle, and — where needed — DuckDB's ``md5()``) can reproduce identical
64-bit values with no library-version drift.
"""

from __future__ import annotations

import hashlib

import numpy as np

MASK64 = (1 << 64) - 1


def hash64(s: str | bytes) -> int:
    """First 8 big-endian bytes of md5(s) as an unsigned 64-bit int."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def hash64_many(strings) -> np.ndarray:
    """Vectorized-ish hash64 over an iterable of str → uint64 ndarray.

    MD5 of short strings is ~1 µs/row; at crawl scale this stage is run
    inside ``map_batches`` so the cost is spread across the pool. (A
    numpy-only rolling hash would be faster but MD5 buys us oracle and
    SQL parity.)
    """
    md5 = hashlib.md5
    fb = int.from_bytes
    return np.fromiter(
        (fb(md5(s.encode("utf-8")).digest()[:8], "big") for s in strings),
        dtype=np.uint64,
        count=len(strings) if hasattr(strings, "__len__") else -1,
    )


def int_keys_md5_u64(a: np.ndarray) -> np.ndarray:
    """md5-hash64 of each integer key's decimal ASCII form — the shared
    kernel for every md5-twin site that hashes integer keys (DuckDB
    parity: ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 16)) AS
    UBIGINT)``). One hash per key, and the int→ascii encoding is a
    single numpy C-loop astype (no per-row ``str(int(x))``), so the
    only remaining per-row Python is the unavoidable hashlib call."""
    bs = np.ascontiguousarray(np.asarray(a, dtype=np.int64)).astype("S21")
    md5 = hashlib.md5
    fb = int.from_bytes
    return np.fromiter(
        (fb(md5(b).digest()[:8], "big") for b in bs.tolist()),
        dtype=np.uint64, count=len(bs))


def int_keys_md5_2x64(a: np.ndarray) -> np.ndarray:
    """Both 64-bit big-endian halves of md5 of each integer key's
    decimal ASCII form, as an (n, 2) uint64 array (DuckDB parity:
    ``substr(md5(...), 1, 16)`` / ``substr(md5(...), 17, 16)``).
    Same vectorized encoding as :func:`int_keys_md5_u64`."""
    arr = np.ascontiguousarray(np.asarray(a, dtype=np.int64))
    bs = arr.astype("S21")
    md5 = hashlib.md5
    dig = b"".join(md5(b).digest() for b in bs.tolist())
    if not len(arr):
        return np.zeros((0, 2), dtype=np.uint64)
    return (np.frombuffer(dig, dtype=np.dtype(">u8"))
            .astype(np.uint64).reshape(-1, 2))


def mix64(x: np.ndarray | int):
    """A cheap 64-bit finalizer (splitmix64-style) for deriving secondary
    hashes (cuckoo alt-index, bloom probe seeds) from a primary hash64."""
    if isinstance(x, np.ndarray):
        x = x.astype(np.uint64, copy=True)
        with np.errstate(over="ignore"):
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
        return x
    x &= MASK64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & MASK64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & MASK64
    x ^= x >> 31
    return x
