"""Crawl-engine pipelines exposed as driver queries (rows-only checks —
stateful multi-pass semantics are not SQL-expressible; the real
conformance gate is tests/oracle.py).

The synthetic world is scaled off the sf documents row count so each
sf_dir gets a proportional crawl, with a tmp store per invocation.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..pipelines.crawl import run_crawl
from ..sources.synth import make_seed_urls


def _scale_from(sf_dir: str) -> int:
    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    return max(200, min(2000, meta.num_rows))


def crawl_pass_docs(sf_dir: str, passes: int = 2) -> pd.DataFrame:
    """Run a bounded crawl; return the fetched corpus flattened to
    (doc_id, url, host, pass_id, n_spans)."""
    n = _scale_from(sf_dir)
    cfg = CrawlConfig(num_partitions=8, items_chunk=400, workers=2,
                      seen_shards=4, n_hosts=50, n_paths=max(200, n // 2),
                      pass_time_ms=2000)
    root = os.path.join(tempfile.gettempdir(),
                        f"ccrawl-query-{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    run_crawl(root, cfg, seed_urls=make_seed_urls(n, n_hosts=cfg.n_hosts),
              max_passes=passes)
    import glob
    rows = []
    for f in sorted(glob.glob(f"{root}/tables/documents/*/*.parquet")):
        for r in pq.read_table(f).to_pylist():
            rows.append({"doc_id": r["doc_id"], "url": r["url"],
                         "host": r["host"], "pass_id": r["pass_id"],
                         "n_spans": len(r["spans"])})
    shutil.rmtree(root, ignore_errors=True)
    return pd.DataFrame(rows).sort_values(
        ["pass_id", "host", "url"]).reset_index(drop=True)


def frontier_host_stats(sf_dir: str) -> pd.DataFrame:
    """A1: per-host frontier stats (count, max priority, min depth) over
    the synthesized seed frontier — groupby(host) aggregate."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    from ..pipelines.crawl import build_frontier_rows

    n = _scale_from(sf_dir)
    cfg = CrawlConfig(n_hosts=50)
    rows = build_frontier_rows(make_seed_urls(n, n_hosts=50), cfg)
    ds = ray.data.from_arrow(rows)

    def derive(t):
        import numpy as np
        import pyarrow as pa
        pm = (t.column("priority").to_numpy() * 1000).astype(np.int64)
        return t.append_column("priority_milli", pa.array(pm))

    out = ds.map_batches(derive, batch_format="pyarrow").groupby(
        "host"
    ).aggregate(
        Count(alias_name="n_urls"),
        Max("priority_milli", alias_name="max_priority_milli"),
        Min("depth", alias_name="min_depth"),
    )
    return out.to_pandas()
