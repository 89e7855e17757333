"""Pluggable table storage (SURVEY.md §1.2): parquet backend with a
Lance-compatible one-directory-per-table layout and atomic replace.

The reference's durable state was one JSON watermark file per container,
written in place [recon: ``container_crawler/base_sync.py:≈40–95``]. Here
every table is a directory of fragment files plus a small JSON manifest;
"atomic replace" tables (checkpoints, retry, seen_shards, buckets) are
committed by write-tmp + ``os.replace`` so a kill at any point leaves either
the old or the new version — never a torn one. Append tables (frontier,
documents, metrics, lineage) gain one fragment per pass, named by pass id so
a re-run of an uncommitted pass overwrites its own fragments idempotently
(this is what makes kill/resume exact).

``north_rule`` asks for Lance; the ``lance`` package is not installed in
this sandbox (no network), so the backend is parquet with the same layout.
Swap-in point: the three functions ``_write_file/_read_file/_file_ext``.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq


def _write_file(table: pa.Table, path: str) -> None:
    # modest row groups so read_parquet can split one fragment into many
    # parallel read tasks (a single-row-group file reads serially)
    pq.write_table(table, path, row_group_size=32 * 1024)


def _read_file(path: str) -> pa.Table:
    return pq.read_table(path)


_FILE_EXT = "parquet"


class TableStore:
    """Directory-of-tables store rooted at *root* (e.g. a crawl run dir)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)

    # ------------------------------------------------------------------ paths
    def table_dir(self, name: str) -> str:
        d = os.path.join(self.root, "tables", name)
        os.makedirs(d, exist_ok=True)
        return d

    # ------------------------------------------------------ atomic singletons
    def write_current(self, name: str, table: pa.Table) -> None:
        """Atomically replace the single-fragment table *name*."""
        d = self.table_dir(name)
        tmp = os.path.join(d, f".current.{_FILE_EXT}.tmp")
        _write_file(table, tmp)
        os.replace(tmp, os.path.join(d, f"current.{_FILE_EXT}"))

    def read_current(self, name: str) -> pa.Table | None:
        p = os.path.join(self.table_dir(name), f"current.{_FILE_EXT}")
        return _read_file(p) if os.path.exists(p) else None

    # --------------------------------------------------------------- appends
    def append_fragment(self, name: str, table: pa.Table, pass_id: int,
                        tag: str = "append", meta: dict | None = None) -> str:
        """Write one fragment for *pass_id*. Overwrites (idempotent) if the
        pass is re-run after a mid-pass kill. Optional *meta* (e.g. rowid
        ranges for scan pruning) lands in the per-fragment sidecar manifest.
        """
        d = self.table_dir(name)
        frag = os.path.join(d, f"{tag}_{pass_id:06d}.{_FILE_EXT}")
        tmp = frag + ".tmp"
        _write_file(table, tmp)
        os.replace(tmp, frag)
        if meta is not None:
            mtmp = frag + ".json.tmp"
            with open(mtmp, "w") as f:
                json.dump(meta, f)
            os.replace(mtmp, frag + ".json")
        return frag

    def fragments(self, name: str, committed_passes: int | None = None) -> list[str]:
        """All fragment files of *name* (flat files and per-pass dirs),
        sorted. If *committed_passes* is given, fragments from later
        (uncommitted, possibly torn) passes are excluded — the resume path
        uses this to ignore orphans."""
        d = self.table_dir(name)
        files = sorted(
            glob.glob(os.path.join(d, f"*.{_FILE_EXT}"))
            + glob.glob(os.path.join(d, "*", f"*.{_FILE_EXT}"))
        )
        if committed_passes is None:
            return files
        out = []
        pat = re.compile(r"_(\d{6})([./])")
        for f in files:
            m = pat.search(os.path.relpath(f, d))
            if m and int(m.group(1)) > committed_passes:
                continue
            out.append(f)
        return out

    def pass_dir(self, name: str, pass_id: int, tag: str = "pass") -> str:
        """Directory for a streaming per-pass write (``ds.write_parquet``).
        Cleared first so a re-run of an uncommitted pass is idempotent."""
        import shutil

        d = os.path.join(self.table_dir(name), f"{tag}_{pass_id:06d}")
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
        return d

    def read_fragment(self, name: str, tag: str, pass_id: int) -> pa.Table | None:
        p = os.path.join(self.table_dir(name), f"{tag}_{pass_id:06d}.{_FILE_EXT}")
        return _read_file(p) if os.path.exists(p) else None

    def gc_state_fragments(self, name: str, tag: str, keep_from_pass: int) -> None:
        d = self.table_dir(name)
        pat = re.compile(re.escape(tag) + r"_(\d{6})\." + _FILE_EXT + "$")
        for f in glob.glob(os.path.join(d, f"{tag}_*.{_FILE_EXT}")):
            m = pat.search(f)
            if m and int(m.group(1)) < keep_from_pass:
                os.remove(f)

    def fragment_meta(self, frag_path: str) -> dict | None:
        p = frag_path + ".json"
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def read_all(self, name: str, committed_passes: int | None = None) -> pa.Table | None:
        files = self.fragments(name, committed_passes)
        if not files:
            return None
        tables = [_read_file(f) for f in files]
        return pa.concat_tables(tables, promote_options="default")

    # ----------------------------------------------------------------- meta
    def write_meta(self, meta: dict, name: str = "meta.json") -> None:
        """The commit record for a pass: written LAST. ``os.replace`` makes
        it the atomic commit point for the whole pass. Multi-engine runs
        use one meta file per engine (``meta-e<k>.json``)."""
        tmp = os.path.join(self.root, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, os.path.join(self.root, name))

    def read_meta(self, name: str = "meta.json") -> dict | None:
        p = os.path.join(self.root, name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
