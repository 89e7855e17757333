"""Sharded URL-seen set as named Ray actors (SURVEY.md §4.3, T5/J1).

Ray Data actor pools do not route batches by key, so the seen-set shards are
standalone named actors (``seen-<run>-<i>`` in the ``ccrawl`` namespace),
probed from inside ``map_batches`` UDFs with one batched RPC per shard per
batch (keys grouped by ``url_hash % S`` first — never one RPC per row).

At cluster scale each shard actor lands on some node and every fetch task
talks to all S shards with vectorized hash arrays; S scales the aggregate
probe throughput and the checkpoint fan-out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..schemas import SEEN_SHARDS
from .cuckoo import BloomFilter, CuckooFilter, SpillFilter

NAMESPACE = "ccrawl"


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set: a cuckoo filter with bloom spill."""

    def __init__(self, shard_id: int, cuckoo_capacity: int, bloom_bits: int):
        self.shard_id = shard_id
        self.filter = SpillFilter(cuckoo_capacity, bloom_bits)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(hashes)

    def contains_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_add_many(hashes)

    def add(self, hashes: np.ndarray) -> int:
        novel = ~self.filter.contains_many(hashes)
        self.filter.add_novel(np.unique(hashes[novel]))
        return int(novel.sum())

    def num_items(self) -> int:
        return self.filter.num_items

    def remove(self, hashes: np.ndarray) -> list[int]:
        """Torn-pass mark rollback; [removed, bloom-residual] counts
        (a list so the scatter-gather path can carry it as a result)."""
        removed, residual = self.filter.remove_many(hashes)
        return [removed, residual]

    def snapshot(self) -> dict:
        st = self.filter.to_state()
        return {
            "shard_id": self.shard_id,
            "cuckoo_bits": st["cuckoo"]["bits"],
            "cuckoo_count": st["cuckoo"]["count"],
            "cuckoo_nbuckets": st["cuckoo"]["nbuckets"],
            "stash": st["cuckoo"]["stash"],
            "bloom_bits": st["bloom"]["bits"],
            "bloom_nbits": st["bloom"]["nbits"],
            "bloom_count": st["bloom"]["count"],
            "spilled": st["spilled"],
        }

    def restore(self, snap: dict) -> None:
        self.filter = SpillFilter.from_state(
            {
                "cuckoo": {
                    "kind": "cuckoo",
                    "nbuckets": snap["cuckoo_nbuckets"],
                    "bits": snap["cuckoo_bits"],
                    "count": snap["cuckoo_count"],
                    "stash": snap["stash"],
                },
                "bloom": {
                    "kind": "bloom",
                    "nbits": snap["bloom_nbits"],
                    "bits": snap["bloom_bits"],
                    "count": snap["bloom_count"],
                },
                "spilled": snap["spilled"],
            }
        )


class SeenSet:
    """Client handle over the S shard actors; usable from the driver and
    (re-resolved by name) from inside map_batches workers."""

    def __init__(self, run_id: str, num_shards: int,
                 cuckoo_capacity: int = 1 << 17, bloom_bits: int = 1 << 22):
        self.run_id = run_id
        self.num_shards = num_shards
        self.cuckoo_capacity = cuckoo_capacity
        self.bloom_bits = bloom_bits
        self._actors: list | None = None

    def _name(self, i: int) -> str:
        return f"seen-{self.run_id}-{i}"

    @property
    def actors(self) -> list:
        if self._actors is None:
            # detached: a non-detached actor is OWNED by the worker that
            # created it, so the whole shared seen set would die with the
            # one engine that happened to create it (multi-engine crash =
            # global state loss). Detached shards outlive any engine and
            # are reclaimed only by the explicit teardown() kill.
            self._actors = [
                SeenShard.options(
                    name=self._name(i), namespace=NAMESPACE,
                    get_if_exists=True, lifetime="detached",
                ).remote(i, self.cuckoo_capacity, self.bloom_bits)
                for i in range(self.num_shards)
            ]
        return self._actors

    def _scatter_gather(self, hashes: np.ndarray, method: str) -> np.ndarray:
        """Group keys by shard, one RPC per shard, reassemble in order.
        Retries transient actor unavailability — every shard op here is
        safe to re-send (contains is read-only; adds are set-idempotent and
        their return mask is not consumed by the engine)."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        out = np.zeros(len(hashes), dtype=bool)
        if len(hashes) == 0:
            return out
        shard = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        last_err = None
        for attempt in range(4):
            try:
                refs, masks = [], []
                for i in range(self.num_shards):
                    m = shard == i
                    if m.any():
                        refs.append(
                            getattr(self.actors[i], method).remote(hashes[m]))
                        masks.append(m)
                for m, res in zip(masks, ray.get(refs)):
                    out[m] = res
                return out
            except ray.exceptions.ActorUnavailableError as e:
                last_err = e
                import time as _time
                _time.sleep(0.5 * (attempt + 1))
        raise last_err

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self._scatter_gather(hashes, "contains")

    def contains_add(self, hashes: np.ndarray) -> np.ndarray:
        """was_novel mask; novel keys become members atomically per shard."""
        return self._scatter_gather(hashes, "contains_add")

    def num_items(self) -> int:
        return sum(ray.get([a.num_items.remote() for a in self.actors]))

    def remove(self, hashes: np.ndarray,
               only_shards: set[int] | None = None) -> tuple[int, int]:
        """Delete keys from their shards (torn-pass mark rollback),
        optionally restricted to *only_shards*. The multi-engine resume
        path calls this with NO shard restriction: it deletes a crashed
        engine's WAL-logged uncommitted marks from ALL shards — live
        shards hold the torn marks directly, and freshly-restored
        foreign snapshots may also contain them (a foreign commit can
        postdate the torn marks). That is safe because the caller first
        subtracts hashes present in other engines' retained mark-WALs
        (the auto-salt dup-mark guard in ``crawl.resume_run``); snapshot
        restore only hydrates shards whose actors are empty/fresh.
        Returns total (removed, bloom_residual)."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if len(hashes) == 0:
            return 0, 0
        shard = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        refs = []
        for i in range(self.num_shards):
            if only_shards is not None and i not in only_shards:
                continue
            m = shard == i
            if m.any():
                refs.append(self.actors[i].remove.remote(hashes[m]))
        removed = residual = 0
        for r, b in ray.get(refs):
            removed += r
            residual += b
        return removed, residual

    # ---------------------------------------------------------- checkpoint
    def snapshot_table(self, shard_ids: list[int] | None = None) -> pa.Table:
        actors = (self.actors if shard_ids is None
                  else [self.actors[i] for i in shard_ids])
        snaps = ray.get([a.snapshot.remote() for a in actors])
        rows = {"shard_id": [], "kind": [], "bits": [], "num_items": []}
        for s in snaps:
            stash = np.array(
                [v for pair in s["stash"] for v in pair], dtype=np.uint64
            ).tobytes()
            hdr = np.array(
                [s["cuckoo_nbuckets"], s["cuckoo_count"],
                 s["bloom_nbits"], s["bloom_count"], s["spilled"]],
                dtype=np.int64,
            ).tobytes()
            for kind, bits, n in (
                ("header", hdr, 0),
                ("cuckoo", s["cuckoo_bits"], s["cuckoo_count"]),
                ("stash", stash, len(s["stash"])),
                ("bloom", s["bloom_bits"], s["bloom_count"]),
            ):
                rows["shard_id"].append(s["shard_id"])
                rows["kind"].append(kind)
                rows["bits"].append(bits)
                rows["num_items"].append(n)
        return pa.table(rows, schema=SEEN_SHARDS)

    def items_per_shard(self) -> list[int]:
        return ray.get([a.num_items.remote() for a in self.actors])

    def restore_from_table(self, table: pa.Table,
                           only_shards: set[int] | None = None) -> None:
        """Restore shard filters from a snapshot fragment. *only_shards*
        restricts which shard ids are touched — multi-engine resume uses
        it to avoid rolling back LIVE shards another engine is actively
        marking (restoring a live shard would erase its in-flight seen
        marks and permit duplicate fetches)."""
        by_shard: dict[int, dict[str, tuple[bytes, int]]] = {}
        for row in table.to_pylist():
            if only_shards is not None and row["shard_id"] not in only_shards:
                continue
            by_shard.setdefault(row["shard_id"], {})[row["kind"]] = (
                row["bits"], row["num_items"])
        refs = []
        for sid, parts in by_shard.items():
            hdr = np.frombuffer(parts["header"][0], dtype=np.int64)
            stash_flat = np.frombuffer(parts["stash"][0], dtype=np.uint64)
            snap = {
                "shard_id": sid,
                "cuckoo_nbuckets": int(hdr[0]),
                "cuckoo_count": int(hdr[1]),
                "bloom_nbits": int(hdr[2]),
                "bloom_count": int(hdr[3]),
                "spilled": int(hdr[4]),
                "cuckoo_bits": parts["cuckoo"][0],
                "bloom_bits": parts["bloom"][0],
                "stash": [(int(stash_flat[i]), int(stash_flat[i + 1]))
                          for i in range(0, len(stash_flat), 2)],
            }
            refs.append(self.actors[sid].restore.remote(snap))
        ray.get(refs)

    def teardown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self._actors = None
