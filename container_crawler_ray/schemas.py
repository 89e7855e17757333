"""Arrow schemas for every engine table (SURVEY.md §1.2).

Fixed and declared up front — the reference's schema was
fixed-by-convention (Swift container-DB rows [recon:
``container_crawler/__init__.py:≈200–260``]); ours is explicit.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# The authoritative interleaved text+media document shape (BASELINE.json
# input_hint): (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>).
DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("pass_id", pa.int64()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Frontier: the container-row-stream analog. `rowid` is per-partition
# append-ordered (each partition is an independent SQLite-DB analog with its
# own rowid sequence and watermark).
FRONTIER = pa.schema(
    [
        ("rowid", pa.int64()),
        ("partition_id", pa.int32()),
        ("url", pa.string()),
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint64()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
        ("pass_added", pa.int64()),
    ]
)

# Retry/verification queue: frontier shape + attempts/last_error.
RETRY = pa.schema(
    list(FRONTIER)
    + [("attempts", pa.int32()), ("last_error", pa.string())]
)

CHECKPOINTS = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("db_id", pa.string()),
        ("last_row", pa.int64()),
        ("next_rowid", pa.int64()),
        ("pass_id", pa.int64()),
    ]
)

SEEN_SHARDS = pa.schema(
    [
        ("shard_id", pa.int32()),
        ("kind", pa.string()),
        ("bits", pa.binary()),
        ("num_items", pa.int64()),
    ]
)

BUCKETS = pa.schema(
    [
        ("host", pa.string()),
        ("tokens", pa.float64()),
    ]
)

METRICS = pa.schema(
    [
        ("pass_id", pa.int64()),
        ("partition_id", pa.int32()),
        ("stage", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("errors", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)

LINEAGE = pa.schema(
    [
        ("doc_id", pa.string()),
        ("parent_url", pa.string()),
        ("url", pa.string()),
        ("pass_id", pa.int64()),
    ]
)

ROBOTS_RULE = pa.struct([("allow", pa.bool_()), ("path_prefix", pa.string())])
ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("crawl_delay_ms", pa.int32()),
        ("rules", pa.list_(ROBOTS_RULE)),
    ]
)
