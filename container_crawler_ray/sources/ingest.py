"""Format-agnostic table ingestion: the boundary where external data
(parquet, CSV, JSON-lines — the three wire formats a crawl/curation
deployment actually receives) enters the engine as a ``ray.data.Dataset``
with a NORMALIZED schema, so every downstream operator sees identical
Arrow types regardless of the source format.

Scale notes: all three readers are Ray Data's native streaming readers
(block-parallel, no driver materialization); schema normalization is one
zero-copy-where-possible ``map_batches`` cast. CSV/JSONL carry weaker
type systems than parquet (timestamps arrive as ISO strings), which is
exactly why the cast stage exists — the engine's contract is the Arrow
schema, not the wire format. Parquet passes ``columns`` down to the
scan (prune at the read); CSV/JSONL have no wire-level projection, so
pruning happens via ``select_columns`` after the scan — the documented
cost of the weaker formats.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

_EXT_TO_FMT = {".parquet": "parquet", ".csv": "csv",
               ".jsonl": "jsonl", ".json": "jsonl"}


def detect_format(path: str) -> str:
    """Wire format from the file extension (explicit beats sniffing —
    deterministic across workers and restarts)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_TO_FMT:
        raise ValueError(f"unsupported source format: {path!r}")
    return _EXT_TO_FMT[ext]


def read_any(path: str, schema: pa.Schema | None = None,
             columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read parquet / CSV / JSONL into a Dataset; optionally project to
    ``columns`` and cast to a target Arrow ``schema``."""
    fmt = detect_format(path)
    if fmt == "parquet":
        ds = ray.data.read_parquet(path, columns=columns)
    else:
        ds = ray.data.read_csv(path) if fmt == "csv" \
            else ray.data.read_json(path)
        if columns is not None:
            ds = ds.select_columns(columns)

    if schema is not None:
        def normalize(t: pa.Table) -> pa.Table:
            cols = []
            for f in schema:
                col = t.column(f.name)
                if col.type != f.type:
                    # Arrow casts ISO-8601 strings (incl. fractional
                    # seconds) to timestamp directly.
                    col = col.cast(f.type)
                cols.append(col)
            return pa.table(dict(zip(schema.names, cols)))

        ds = ds.map_batches(normalize, batch_format="pyarrow")
    return ds
