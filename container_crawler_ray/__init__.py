"""container_crawler_ray — a Ray-Data-native crawl/frontier data engine.

A from-scratch re-expression of the semantics of
``thiagodasilva/container-crawler`` (an OpenStack Swift container-DB
change-scan daemon; see SURVEY.md — the local reference checkout is empty so
citations are spec-level, e.g. ``container_crawler/__init__.py:≈250–270``
[recon]) as an idiomatic Ray Data engine:

- incremental per-partition watermark scans (``last_row`` ROWID analog),
- deterministic partition-parallel ownership (``rowid % R == node_id``),
- bulk vs per-row handler modes,
- retry / error verification queue with watermark gating (all-or-nothing
  per chunk),
- a sharded cuckoo-filter URL-seen set with a bloom spill tier,
- per-host politeness (token bucket + robots rules) via groupby(host)
  shuffles,
- streaming ``map_batches`` fetch stages over zero-copy Arrow,
- checkpoint/resume from atomic parquet tables (Lance-compatible layout).

Nothing here calls ``ray.init()``; the caller owns the Ray session.
"""

__version__ = "0.1.0"
