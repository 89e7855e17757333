"""Seed-list loading for ``init_run`` — the user-facing way to feed a
crawl from a URL list file instead of an in-memory Python list.

Formats (by extension): ``.txt`` (one URL per line, ``#`` comments and
blank lines skipped), ``.csv`` (a ``url`` column), ``.parquet`` (a
``url`` column). Order is preserved — seed rowids are assigned in file
order, so two runs from the same file scan identically (the resume
contract). Reading is driver-side on purpose: a seed list is dimension
-sized input (the 10^10-URL frontier lives in the frontier TABLE, not
in seed files); for a parquet seed list too large for the driver, pass
the frontier table directly instead.
"""

from __future__ import annotations

import os


def load_seed_urls(path: str) -> list[str]:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".txt", ""):
        with open(path, encoding="utf-8") as f:
            return [ln.strip() for ln in f
                    if ln.strip() and not ln.lstrip().startswith("#")]
    if ext == ".csv":
        import csv

        with open(path, newline="", encoding="utf-8") as f:
            rdr = csv.DictReader(f)
            if rdr.fieldnames is None or "url" not in rdr.fieldnames:
                raise ValueError(f"{path}: CSV needs a 'url' column")
            return [row["url"] for row in rdr if row.get("url")]
    if ext == ".parquet":
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["url"])
        return t.column("url").to_pylist()
    raise ValueError(f"unsupported seed-list extension: {path}")
