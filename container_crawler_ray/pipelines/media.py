"""Multimodal column plumbing (SURVEY-mandated component).

Real image/audio codecs are not available in this container, so the
DECODE is a clearly-marked deterministic fake (metadata derived from an
md5 of the payload — even SQL-checkable), while everything Ray-side is
real and tested: opaque ``binary`` payload column, actor-pool decode
stage with per-actor setup, small batches for wide binary rows, typed
metadata output schema.

To use a real decoder, subclass ``MediaDecodeStage`` and override
``decode_one`` (e.g. PIL.Image.open) — the Ray plumbing is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_META = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("fmt", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
    ]
)

_FORMATS = ("png", "jpeg", "webp")


class MediaDecodeStage:
    """Actor-pool decode: expensive codec init belongs in __init__ (here a
    stand-in); __call__ handles one Arrow batch of binary payloads."""

    def __init__(self):
        self._codec_ready = True  # real impl: load libjpeg/ffmpeg handles

    def decode_one(self, payload: bytes) -> dict:
        """Deterministic fake decode. A real decoder would be:
        ``img = PIL.Image.open(io.BytesIO(payload))`` — unavailable here:
        raise NotImplementedError in strict mode."""
        h = int(hashlib.md5(payload).hexdigest()[:15], 16)
        return {
            "fmt": _FORMATS[h % 3],
            "width": 64 + (h // 3) % 960,
            "height": 64 + (h // 7) % 540,
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        metas = [self.decode_one(p) for p in payloads]
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_bytes": pa.array([len(p) for p in payloads],
                                    type=pa.int64()),
                "fmt": pa.array([m["fmt"] for m in metas], type=pa.string()),
                "width": pa.array([m["width"] for m in metas],
                                  type=pa.int64()),
                "height": pa.array([m["height"] for m in metas],
                                   type=pa.int64()),
            },
            schema=MEDIA_META,
        )


def _to_payload(t: pa.Table) -> pa.Table:
    """Treat document text as an opaque binary payload column (the
    testdata has no real media; the schema/flow is what's under test)."""
    payloads = [s.encode("utf-8") for s in t.column("text").to_pylist()]
    return pa.table({"doc_id": t.column("doc_id"),
                     "payload": pa.array(payloads, type=pa.binary())})


def media_metadata(sf_dir: str) -> pd.DataFrame:
    """documents → binary payloads → actor-pool decode → typed metadata.
    Small batch_size on purpose: binary payload batches must be sized to
    the worker heap (SURVEY.md 'Memory-aware')."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    # autoscaling (1, 8) actor pool: a FIXED pool of N would deadlock on
    # hosts with fewer than N CPUs, and the min=1 floor lets the stage
    # start as soon as one actor is placed
    out = ds.map_batches(_to_payload, batch_format="pyarrow").map_batches(
        MediaDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 8))
    return out.to_pandas()
