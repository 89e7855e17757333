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

``north_rule`` asks for Lance. The backend is a pluggable seam: pick with
``TableStore(root, backend=...)`` or the ``GRAFT_STORAGE_BACKEND`` env
var (default ``parquet``). The ``lance`` backend is registered and
becomes live the moment the ``lance`` package is installable (it is not
in this sandbox — no network), at which point the swap is a config
change, not a code change. Custom backends register via
``register_backend``.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq


_PASS_PAT = re.compile(r"_(?:\d{6}x)?(\d{6})([./x])")


def fragment_pass_id(relpath: str) -> int | None:
    """The pass id that governs a fragment file's commit visibility.
    Plain fragments: their own pass. ``LOxHI`` compaction segments: HI
    (a segment only ever covers committed passes, so the upper bound is
    the correct orphan-filter comparison). EVERY reader that parses a
    pass id out of a fragment name must use this — a local ``_(\\d{6})\\.``
    regex silently drops compaction segments (found the hard way in the
    multi-engine committed-frontier filter)."""
    m = _PASS_PAT.search(relpath)
    return int(m.group(1)) if m else None


class ParquetBackend:
    """Default file backend: one parquet file per fragment."""

    ext = "parquet"

    def write(self, table: pa.Table, path: str) -> None:
        # modest row groups so read_parquet can split one fragment into
        # many parallel read tasks (a single-row-group file reads serially)
        pq.write_table(table, path, row_group_size=32 * 1024)

    def read(self, path: str) -> pa.Table:
        return pq.read_table(path)

    def ray_read(self, files: list[str], filter=None):
        """Distributed scan over fragment files with predicate pushdown
        (row groups that cannot match are skipped at the read)."""
        import ray.data
        return ray.data.read_parquet(files, filter=filter)


class LanceBackend:
    """Lance file backend (north_rule target). Requires the ``lance``
    package; raises with a clear message where it is not installed so the
    parquet default keeps working everywhere else."""

    ext = "lance"

    def __init__(self):
        try:
            import lance  # noqa: F401
            self._lance = lance
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "GRAFT_STORAGE_BACKEND=lance but the 'lance' package is "
                "not installed; install pylance or use the parquet "
                "backend") from e

    def write(self, table: pa.Table, path: str) -> None:  # pragma: no cover
        self._lance.write_dataset(table, path, mode="overwrite")

    def read(self, path: str) -> pa.Table:  # pragma: no cover
        return self._lance.dataset(path).to_table()

    def ray_read(self, files: list[str], filter=None):  # pragma: no cover
        import ray.data
        parts = [ray.data.read_lance(f) for f in files]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        if filter is not None:
            ds = ds.filter(expr=str(filter))
        return ds


_BACKENDS: dict[str, type] = {
    "parquet": ParquetBackend,
    "lance": LanceBackend,
}


def register_backend(name: str, cls: type) -> None:
    """Register a custom storage backend class (must provide ``ext``,
    ``write(table, path)`` and ``read(path) -> Table``)."""
    _BACKENDS[name] = cls


def resolve_backend(name: str | None = None):
    name = name or os.environ.get("GRAFT_STORAGE_BACKEND", "parquet")
    try:
        return _BACKENDS[name]()
    except KeyError:
        raise ValueError(
            f"unknown storage backend {name!r}; "
            f"registered: {sorted(_BACKENDS)}") from None


class TableStore:
    """Directory-of-tables store rooted at *root* (e.g. a crawl run dir)."""

    def __init__(self, root: str, backend=None):
        self.root = root
        self._backend = backend if backend is not None else resolve_backend()
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)

    def _write_file(self, table: pa.Table, path: str) -> None:
        self._backend.write(table, path)

    def _read_file(self, path: str) -> pa.Table:
        return self._backend.read(path)

    @property
    def _ext(self) -> str:
        return self._backend.ext

    def ray_read(self, files: list[str], filter=None):
        """Backend-dispatched ``ray.data`` scan over fragment files."""
        return self._backend.ray_read(files, filter=filter)

    # ------------------------------------------------------------------ paths
    def table_dir(self, name: str) -> str:
        d = os.path.join(self.root, "tables", name)
        os.makedirs(d, exist_ok=True)
        return d

    # ------------------------------------------------------ atomic singletons
    def write_current(self, name: str, table: pa.Table) -> None:
        """Atomically replace the single-fragment table *name*."""
        d = self.table_dir(name)
        tmp = os.path.join(d, f".current.{self._ext}.tmp")
        self._write_file(table, tmp)
        os.replace(tmp, os.path.join(d, f"current.{self._ext}"))

    def read_current(self, name: str) -> pa.Table | None:
        p = os.path.join(self.table_dir(name), f"current.{self._ext}")
        return self._read_file(p) if os.path.exists(p) else None

    # --------------------------------------------------------------- appends
    def append_fragment(self, name: str, table: pa.Table, pass_id: int,
                        tag: str = "append", meta: dict | None = None) -> str:
        """Write one fragment for *pass_id*. Overwrites (idempotent) if the
        pass is re-run after a mid-pass kill. Optional *meta* (e.g. rowid
        ranges for scan pruning) lands in the per-fragment sidecar manifest.
        """
        d = self.table_dir(name)
        frag = os.path.join(d, f"{tag}_{pass_id:06d}.{self._ext}")
        tmp = frag + ".tmp"
        self._write_file(table, tmp)
        os.replace(tmp, frag)
        if meta is not None:
            mtmp = frag + ".json.tmp"
            with open(mtmp, "w") as f:
                json.dump(meta, f)
            os.replace(mtmp, frag + ".json")
        return frag

    def remove_fragment(self, name: str, tag: str, pass_id: int) -> None:
        """Delete a fragment (and its sidecar) if present. Used by the
        torn-pass purge: a crashed attempt at pass N may leave fragments
        that the re-run won't overwrite (conditional appends are only
        written when non-empty), and once pass N commits those orphans
        would be read back as committed data."""
        d = self.table_dir(name)
        frag = os.path.join(d, f"{tag}_{pass_id:06d}.{self._ext}")
        for p in (frag, frag + ".json"):
            if os.path.exists(p):
                os.remove(p)

    def remove_pass_dir(self, name: str, pass_id: int,
                        tag: str = "pass") -> None:
        """Delete a per-pass streaming-write directory if present (torn-pass
        purge twin of remove_fragment for ``pass_dir`` sinks)."""
        import shutil

        d = os.path.join(self.table_dir(name), f"{tag}_{pass_id:06d}")
        if os.path.exists(d):
            shutil.rmtree(d)

    def fragments(self, name: str, committed_passes: int | None = None) -> list[str]:
        """All fragment files of *name* (flat files and per-pass dirs),
        sorted. If *committed_passes* is given, fragments from later
        (uncommitted, possibly torn) passes are excluded — the resume path
        uses this to ignore orphans.

        Compaction awareness: originals listed as covered in
        ``compaction.json`` are skipped even if still on disk (the window
        between manifest commit and original deletion), and ``LOxHI``
        segment files are admitted only when the manifest lists them (a
        segment without a manifest entry is a torn compaction — ignored
        and overwritten by the retry)."""
        d = self.table_dir(name)
        files = sorted(
            glob.glob(os.path.join(d, f"*.{self._ext}"))
            + glob.glob(os.path.join(d, "*", f"*.{self._ext}"))
        )
        man = self._compaction_manifest(name)
        covered: set[str] = set()
        segments: set[str] = set()
        for ent in man.get("covered", []):
            segments.add(ent["segment"])
            covered.update(ent["originals"])
        seg_pat = re.compile(r"_\d{6}x\d{6}\." + re.escape(self._ext) + "$")
        kept = []
        for f in files:
            base = os.path.basename(f)
            if base in covered:
                continue
            if seg_pat.search(base) and base not in segments:
                continue
            kept.append(f)
        files = kept
        if committed_passes is None:
            return files
        out = []
        for f in files:
            p = fragment_pass_id(os.path.relpath(f, d))
            if p is not None and p > committed_passes:
                continue
            out.append(f)
        return out

    # ------------------------------------------------------------ compaction
    def _compaction_manifest(self, name: str) -> dict:
        p = os.path.join(self.table_dir(name), "compaction.json")
        if not os.path.exists(p):
            return {"covered": []}
        with open(p) as f:
            return json.load(f)

    def compact(self, name: str, tag: str = "append",
                upto_pass: int | None = None) -> str | None:
        """Merge the flat ``<tag>_NNNNNN`` fragments (all of them, or
        those with pass ≤ *upto_pass*) into one ``<tag>_LOxHI`` segment —
        the small-file compaction every long-running append store needs
        (at one fragment per pass, a month of 5-minute passes is ~9k
        files; scan planning and sidecar pruning pay per file).

        Crash-safe by manifest ordering: (1) segment written tmp+replace,
        (2) ``compaction.json`` atomically updated to map the segment to
        its covered originals, (3) originals deleted. A crash after (1)
        leaves an unlisted segment that ``fragments()`` ignores; after
        (2), ``fragments()`` serves the segment and skips the originals
        whether or not deletion finished — no state double-reads rows.
        Sidecar manifests (rowid scan pruning) are merged, so the S1
        delta-scan pruning keeps working on the segment. Call only for
        passes already committed (``meta.json``); re-running an
        UNcommitted pass may legitimately rewrite its fragment, which a
        segment must never absorb."""
        d = self.table_dir(name)
        man = self._compaction_manifest(name)
        covered = {o for e in man["covered"] for o in e["originals"]}
        pat = re.compile("^" + re.escape(tag) + r"_(\d{6})\."
                         + re.escape(self._ext) + "$")
        picks: list[tuple[int, str]] = []
        for f in sorted(glob.glob(os.path.join(d, f"{tag}_*.{self._ext}"))):
            base = os.path.basename(f)
            m = pat.match(base)
            if not m or base in covered:
                continue
            p = int(m.group(1))
            if upto_pass is not None and p > upto_pass:
                continue
            picks.append((p, f))
        if len(picks) < 2:
            return None
        lo, hi = picks[0][0], picks[-1][0]
        merged = pa.concat_tables([self._read_file(f) for _, f in picks],
                                  promote_options="default")
        metas = [self.fragment_meta(f) for _, f in picks]
        side = None
        if all(m is not None for m in metas):
            per: dict[str, int] = {}
            for m in metas:
                for pid, mx in (m.get("per_partition_max") or {}).items():
                    per[pid] = max(per.get(pid, -1), int(mx))
            side = {"max_rowid": max(m.get("max_rowid", -1) for m in metas),
                    "per_partition_max": per}
        seg_base = f"{tag}_{lo:06d}x{hi:06d}.{self._ext}"
        seg = os.path.join(d, seg_base)
        tmp = seg + ".tmp"
        self._write_file(merged, tmp)
        os.replace(tmp, seg)
        if side is not None:
            mtmp = seg + ".json.tmp"
            with open(mtmp, "w") as f:
                json.dump(side, f)
            os.replace(mtmp, seg + ".json")
        man["covered"].append({
            "segment": seg_base,
            "originals": [os.path.basename(f) for _, f in picks]})
        mpath = os.path.join(d, "compaction.json")
        mtmp = mpath + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(mtmp, mpath)
        for _, f in picks:
            for p_ in (f, f + ".json"):
                if os.path.exists(p_):
                    os.remove(p_)
        return seg

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
        p = os.path.join(self.table_dir(name), f"{tag}_{pass_id:06d}.{self._ext}")
        return self._read_file(p) if os.path.exists(p) else None

    def list_fragment_passes(self, name: str, tag: str) -> list[int]:
        """Pass ids of every retained single-pass fragment for ``tag``,
        ascending. Used by the torn-pass rollback guard to scan ALL of a
        foreign engine's retained mark-WALs (retention is pinned by the
        slowest engine's commit frontier, so a fragment can be older than
        that engine's own ``pass_id - _MARK_WAL_KEEP``)."""
        d = self.table_dir(name)
        pat = re.compile(re.escape(tag) + r"_(\d{6})\." + self._ext + "$")
        out = []
        for f in glob.glob(os.path.join(d, f"{tag}_*.{self._ext}")):
            m = pat.search(f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def gc_state_fragments(self, name: str, tag: str, keep_from_pass: int) -> None:
        d = self.table_dir(name)
        pat = re.compile(re.escape(tag) + r"_(\d{6})\." + self._ext + "$")
        for f in glob.glob(os.path.join(d, f"{tag}_*.{self._ext}")):
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
        tables = [self._read_file(f) for f in files]
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
