"""Span assembly over the testdata ``documents`` table — the flagship
``entry()`` pipeline (FIXTURES.md §6): deterministically span-ify each
document into the interleaved text+media shape mandated by BASELINE.json
``input_hint`` (doc_id:string, spans:list<struct<kind,text,media_ref,
offset>>).

Rule: split ``text`` on whitespace; token i becomes a media span when
``i % 4 == 3`` with ``media_ref = f"m://{doc_id}/{i}"``; ``offset`` is the
cumulative character length of prior span payloads. Both the nested and
the flattened (SQL-checkable) forms are produced by the same kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..schemas import SPAN_STRUCT


def assemble_spans_batch(t: pa.Table) -> pa.Table:
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_ids, out_spans = [], []
    for doc_id, text in zip(doc_ids, texts):
        sid = str(doc_id)
        toks = text.split()
        spans = []
        off = 0
        for i, tok in enumerate(toks):
            if i % 4 == 3:
                kind, txt, ref = "media", "", f"m://{sid}/{i}"
            else:
                kind, txt, ref = "text", tok, ""
            spans.append({"kind": kind, "text": txt, "media_ref": ref,
                          "offset": off})
            off += len(txt) + len(ref)
        out_ids.append(sid)
        out_spans.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.string()),
            "spans": pa.array(out_spans, type=pa.list_(SPAN_STRUCT)),
        }
    )


def flatten_spans_batch(t: pa.Table) -> pa.Table:
    """Nested spans → one row per span (the SQL-comparable projection)."""
    import pyarrow.compute as pc

    spans = t.column("spans")
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(t.column("doc_id"), parent)
    # span_idx: position within each list
    lengths = pc.list_value_length(spans).to_numpy()
    idx = np.concatenate([np.arange(n, dtype=np.int64) for n in lengths]) \
        if len(lengths) else np.array([], dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "span_idx": pa.array(idx),
            "kind": pc.struct_field(flat, "kind"),
            "text": pc.struct_field(flat, "text"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "offset": pc.struct_field(flat, "offset").cast(pa.int64()),
        }
    )


def spanify(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(assemble_spans_batch, batch_format="pyarrow")


def spans_flat(sf_dir: str):
    return spanify(sf_dir).map_batches(flatten_spans_batch,
                                       batch_format="pyarrow").to_pandas()
