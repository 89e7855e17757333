"""Arrow ↔ numpy vector-column kernels shared by the ANN / embedding-dedup
operators. The embedding column is ``list<float>`` with a constant
dimension; converting it via ``to_pylist()`` is a Python-object round trip,
while flattening the Arrow child buffer is (near) zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_col_to_matrix(col: pa.ChunkedArray | pa.Array,
                       dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a fixed-dimension list<float> column.

    Zero-copy from the Arrow child buffer up to the dtype cast; raises if
    rows have unequal lengths (embeddings are fixed-dim by contract).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    return np.ascontiguousarray(flat.reshape(n, flat.size // n), dtype=dtype)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    """L2-normalize rows (zero rows pass through unscaled)."""
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]
