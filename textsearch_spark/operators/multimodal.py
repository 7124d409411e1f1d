"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
a metadata struct. Two tiers:

- **container-header metadata is REAL**: PNG/JPEG/GIF/BMP/PPM/WAV
  headers are parsed byte-level (functions/mediaheaders.py — no codec
  libraries needed), yielding true dimensions / frame counts / audio
  params; oracle-checked via the ``media_headers`` entry.
- **pixel/sample decode is STUBBED** — this container ships no
  image/audio codec libs — behind ``decode_stub``, which raises
  NotImplementedError unless ``deterministic_fake=True`` (fake dims
  derived from the payload sha256 so tests stay stable). Real
  deployments drop PIL/ffmpeg into the same mapInPandas batch loop.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.mediaheaders import sniff_media

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, content_sha string, media_type string, "
    "width int, height int, n_frames int"
)


def as_media_column(df: DataFrame, *, doc_col: str = "doc_id", text_col: str = "text",
                    media_type: str = "image/fake") -> DataFrame:
    """Wraps a source column as an opaque binary payload + type tag —
    the ingestion shape for media tables: (doc_id, payload, media_type)."""
    return df.select(
        F.col(doc_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def decode_stub(payload: bytes, *, deterministic_fake: bool = False):
    """STUB for the media decode step (no codec libs in this container).

    Real deployments replace this with PIL/ffmpeg decode inside the same
    mapInPandas batch loop. The fake derives dims from the payload hash
    so downstream plumbing is testable and deterministic.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this container"
        )
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 8,
    }


def extract_media_meta(media: DataFrame, *, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary
    payloads — the decode/resize/frame-sample slot in a real pipeline.

    A payload in a recognized container format gets its TRUE header
    metadata (sniff_media); anything else falls through to the decode
    stub (see module docstring)."""

    def one(p: bytes):
        m = sniff_media(p)
        if m is not None:
            return {"width": m["width"], "height": m["height"],
                    "n_frames": m["n_frames"]}
        return decode_stub(p, deterministic_fake=deterministic_fake)

    def extract(batches):
        for pdf in batches:
            # a NULL payload (failed upstream fetch) yields a null-
            # metadata row instead of bytes(None) aborting the task
            payloads = [None if p is None else bytes(p) for p in pdf["payload"]]
            metas = [None if p is None else one(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [None if p is None else len(p) for p in payloads],
                "content_sha": [None if p is None else hashlib.sha256(p).hexdigest()
                                for p in payloads],
                "media_type": pdf["media_type"],
                "width": [None if m is None else m["width"] for m in metas],
                "height": [None if m is None else m["height"] for m in metas],
                "n_frames": [None if m is None else m["n_frames"] for m in metas],
            })

    return media.mapInPandas(extract, MEDIA_META_SCHEMA)
