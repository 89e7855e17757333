"""Link expansion + frontier append assembly (graft M-additions, §2.2).

Link extraction is flat_map-shaped: one fetched doc → K candidate URLs.
Implemented as vectorized ``map_batches`` over the fetch output using
``pyarrow.compute.list_flatten`` / ``list_parent_indices`` (zero Python in
the explode), then a canonicalize+hash stage, a seen-set probe (drop known
URLs before they ever hit the frontier), an exact per-pass dedup
(``groupby(canonical_url)`` min-depth), and deterministic per-partition
rowid assignment (the frontier is a set of independent rowid sequences —
one per partition, exactly like the reference's per-container SQLite DBs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.canonicalize import host_of
from ..functions.hashing import hash64_many


def explode_links(t: pa.Table) -> pa.Table:
    """Fetch output → one row per (parent, link) edge."""
    links = t.column("links")
    flat = pc.list_flatten(links)
    parent_idx = pc.list_parent_indices(links)
    return pa.table(
        {
            "url": flat,
            "parent_url": pc.take(t.column("canonical_url"), parent_idx),
            "parent_doc_id": pc.take(t.column("doc_id"), parent_idx),
            "depth": pc.add(pc.take(t.column("depth"), parent_idx), 1),
        }
    )


def make_link_enrich(num_partitions: int, salted_hosts: tuple[str, ...],
                     keep_parents: bool = False):
    """Canonicalize (links may come from the wild), hash, route to
    partitions. Hot-host salting (SURVEY.md §4.1): rows of a salted host
    are spread by url_hash instead of host_hash so one hot host doesn't
    pin a whole partition; politeness stays global per host because the
    scheduler groups by host, not partition."""
    from ..functions.canonicalize import canonicalize_many

    salted = set(salted_hosts)

    def enrich(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        canon = canonicalize_many(urls)
        hosts = [host_of(c) for c in canon]
        uh = hash64_many(canon)
        hh = hash64_many(hosts)
        P = np.uint64(num_partitions)
        pid = (hh % P).astype(np.int32)
        if salted:
            salt_mask = np.array([h in salted for h in hosts])
            if salt_mask.any():
                pid[salt_mask] = (uh[salt_mask] % P).astype(np.int32)
        prio = ((uh % np.uint64(1000)).astype(np.float32) / 1000.0)
        cols = {
            "url": pa.array(urls, type=pa.string()),
            "canonical_url": pa.array(canon, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
            "url_hash": pa.array(uh, type=pa.uint64()),
            "host_hash": pa.array(hh, type=pa.uint64()),
            "partition_id": pa.array(pid, type=pa.int32()),
            "priority": pa.array(prio, type=pa.float32()),
            "depth": t.column("depth").cast(pa.int32()),
        }
        if keep_parents:        # lineage sink reads parent cols downstream
            cols["parent_url"] = t.column("parent_url")
            cols["parent_doc_id"] = t.column("parent_doc_id")
        return pa.table(cols)

    return enrich


def make_rowid_assigner(base_rowids: dict[int, int], pass_id: int):
    """Per-partition group fn: exact link dedup (min depth per canonical
    URL — copies always co-locate because partition routing is a pure
    function of the URL/host hash, so no extra shuffle is needed), then
    deterministic append order (deferred rows by old rowid first, then new
    links by canonical_url), rowids from the partition's checkpointed
    counter."""

    def assign(t: pa.Table) -> pa.Table:
        pid = int(t.column("partition_id")[0].as_py())
        base = base_rowids.get(pid, 0)
        kind = t.column("order_kind").to_numpy()
        if (kind == 1).any():
            # exact link dedup without a pandas round-trip: stable
            # lexsort by (canonical_url, depth) picks the same
            # min-depth / earliest-row winner the old
            # sort_values(mergesort)+drop_duplicates pair did, as a
            # pure index selection on the Arrow block
            links_i = np.flatnonzero(kind == 1)
            cu = np.asarray(t.column("canonical_url").to_numpy(
                zero_copy_only=False))[links_i]
            dp = t.column("depth").to_numpy()[links_i]
            o = np.lexsort((dp, cu))
            cs = cu[o]
            first = np.ones(len(cs), dtype=bool)
            first[1:] = cs[1:] != cs[:-1]
            keep = np.sort(np.concatenate(
                [np.flatnonzero(kind == 0), links_i[o[first]]]))
            t = t.take(pa.array(keep))
        order = pc.sort_indices(
            t,
            sort_keys=[("order_kind", "ascending"), ("order_a", "ascending"),
                       ("canonical_url", "ascending")],
        )
        t = t.take(order)
        n = len(t)
        rowid = pa.array(np.arange(base, base + n, dtype=np.int64))
        t = t.drop_columns(["order_kind", "order_a"])
        t = t.append_column("rowid", rowid)
        t = t.append_column("pass_added",
                            pa.array(np.full(n, pass_id, dtype=np.int64)))
        return t

    return assign
