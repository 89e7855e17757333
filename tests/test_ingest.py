"""Round-trip tests for the format-agnostic ingestion seam
(sources/ingest.py): the SAME logical table enters as parquet, CSV and
JSONL and must come out as one identical Arrow-typed Dataset."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from container_crawler_ray.sources.ingest import detect_format, read_any

SCHEMA = pa.schema([
    ("event_id", pa.int64()),
    ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()),
    ("event_type", pa.string()),
    ("value", pa.float64()),
])


@pytest.fixture(scope="module")
def triple(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    rng = np.random.RandomState(3)
    n = 257
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            rng.randint(1_600_000_000_000_000, 1_700_000_000_000_000, n),
            unit="us"),
        "user_id": rng.randint(0, 9, n).astype(np.int64),
        "event_type": np.array(["a", "b", "c"])[rng.randint(0, 3, n)],
        "value": np.round(rng.uniform(0, 100, n), 4),
    })
    pq.write_table(pa.Table.from_pandas(df, schema=SCHEMA,
                                        preserve_index=False),
                   d / "t.parquet")
    csv = df.copy()
    csv["ts"] = csv["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    csv.to_csv(d / "t.csv", index=False)
    csv.to_json(d / "t.jsonl", orient="records", lines=True)
    return str(d), df


def _canon(ds):
    out = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    return out[["event_id", "ts", "user_id", "event_type", "value"]]


def test_detect_format():
    assert detect_format("/x/a.parquet") == "parquet"
    assert detect_format("/x/a.csv") == "csv"
    assert detect_format("/x/a.jsonl") == "jsonl"
    with pytest.raises(ValueError):
        detect_format("/x/a.xml")


def test_three_formats_identical(triple):
    d, df = triple
    ref = _canon(read_any(f"{d}/t.parquet", schema=SCHEMA))
    for ext in ("csv", "jsonl"):
        got = _canon(read_any(f"{d}/{ext and 't.'+ext}", schema=SCHEMA))
        pd.testing.assert_frame_equal(got, ref)
    exp = df.sort_values("event_id").reset_index(drop=True).copy()
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(ref, exp)


def test_column_projection(triple):
    d, _ = triple
    for f in ("t.parquet", "t.csv", "t.jsonl"):
        ds = read_any(f"{d}/{f}", columns=["event_id", "value"])
        assert sorted(ds.schema().names) == ["event_id", "value"]


def test_schema_types_normalized(triple):
    d, _ = triple
    for f in ("t.parquet", "t.csv", "t.jsonl"):
        s = read_any(f"{d}/{f}", schema=SCHEMA).schema()
        got = {n: str(t) for n, t in zip(s.names, s.types)}
        assert got["ts"] == "timestamp[us]"
        assert got["event_id"] == "int64"
        assert got["value"] == "double"
