"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf_dir, run its oracle_sql() twin in DuckDB over the same
parquet views, and compare row count + (sorted-by-name) columns +
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
(with query names given, only those entries run)

``--json OUT.json`` (before the sf_dir) additionally writes the full
sweep as a JSON artifact: {query: {status, rows, secs}} plus a summary
header — the per-round auditable record of ALL oracled queries, not
just the driver's 50-query sample.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pdf(x) -> pd.DataFrame:
    if isinstance(x, pd.DataFrame):
        return x
    try:
        import pyarrow as pa
        if isinstance(x, pa.Table):
            return x.to_pandas()
    except ImportError:
        pass
    import ray.data
    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    raise TypeError(type(x))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("uint", "int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            bad = int(np.argmax(~(av == bv)) if av.dtype.kind != "f"
                      else np.argmax(av != bv))
            return f"VALUES col={c} row={bad}: {av[bad]!r} vs {bv[bad]!r}"
    return "OK"


def main(sf_dir: str, only: list[str] | None = None,
         json_out: str | None = None) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            res = to_pdf(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            results[name] = {"status": f"RAY-ERROR {type(e).__name__}",
                             "rows": None, "secs": None}
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:26s} rows-only  {len(res):7d} rows  {dt:6.1f}s")
            results[name] = {"status": "rows-only", "rows": len(res),
                             "secs": round(dt, 2)}
            continue
        sql = oracles[name]
        # golden-file twins are produced at sf0.01 (the driver's gate
        # scale). At another SF, use the per-SF golden directory when
        # tools/make_goldens.py has produced one; otherwise record an
        # explicit skip (NOT a failure) — the query still ran.
        if "tests/golden" in sql and "sf0.01" not in sf_dir:
            sfbase = sf_dir.rstrip("/").rsplit("/", 1)[-1]
            alt = f"/root/repo/tests/golden/{sfbase}/{name}.parquet"
            import os
            if os.path.exists(alt):
                sql = sql.replace(
                    f"/root/repo/tests/golden/{name}.parquet", alt)
            else:
                print(f"{name:26s} golden@sf0.01-only (ran, "
                      f"{len(res)} rows, {dt:.1f}s)")
                results[name] = {"status": "golden-skip",
                                 "rows": len(res), "secs": round(dt, 2)}
                continue
        try:
            sql_df = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} SQL-ERROR {type(e).__name__}: {e}")
            failures += 1
            results[name] = {"status": f"SQL-ERROR {type(e).__name__}",
                             "rows": len(res), "secs": round(dt, 2)}
            continue
        verdict = compare(name, res, sql_df)
        flag = "" if verdict == "OK" else "  <<< FAIL"
        if verdict != "OK":
            failures += 1
        print(f"{name:26s} {verdict:10s} {len(res):7d} rows  {dt:6.1f}s{flag}")
        results[name] = {"status": verdict, "rows": len(res),
                         "secs": round(dt, 2)}
    if json_out:
        import json
        n_sql = sum(1 for r in results.values() if r["status"] == "OK")
        n_rowsonly = sum(1 for r in results.values()
                         if r["status"] == "rows-only")
        n_gskip = sum(1 for r in results.values()
                      if r["status"] == "golden-skip")
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                       "n_sql_ok": n_sql, "n_rows_only": n_rowsonly,
                       "n_golden_sf001_only": n_gskip,
                       "n_failures": failures, "queries": results},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {len(results)} queries, "
              f"{n_sql} OK, {n_rowsonly} rows-only, "
              f"{n_gskip} golden-skip, {failures} failures")
    return failures


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    rc = main(sf, only=argv[1:] or None, json_out=json_out)
    sys.exit(1 if rc else 0)
