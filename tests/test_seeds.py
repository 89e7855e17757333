"""Seed-list file loading (sources/seeds.py): format handling and the
order-preservation contract (rowids are assigned in file order)."""

import csv

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from container_crawler_ray.sources.seeds import load_seed_urls

URLS = [f"https://h{i:04d}.example/p{i}" for i in range(7)]


def test_txt(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("# comment\n" + "\n".join(URLS[:3]) + "\n\n"
                 + "\n".join(URLS[3:]) + "\n")
    assert load_seed_urls(str(p)) == URLS


def test_csv(tmp_path):
    p = tmp_path / "seeds.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["rank", "url"])
        w.writeheader()
        for i, u in enumerate(URLS):
            w.writerow({"rank": i, "url": u})
    assert load_seed_urls(str(p)) == URLS


def test_csv_missing_column(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="url"):
        load_seed_urls(str(p))


def test_parquet(tmp_path):
    p = tmp_path / "seeds.parquet"
    pq.write_table(pa.table({"url": URLS, "extra": list(range(7))}), p)
    assert load_seed_urls(str(p)) == URLS


def test_unknown_extension(tmp_path):
    p = tmp_path / "seeds.json"
    p.write_text("[]")
    with pytest.raises(ValueError, match="extension"):
        load_seed_urls(str(p))
