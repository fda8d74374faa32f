"""Multimodal (binary) column plumbing: typed metadata over opaque blobs.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata extracted by an Arrow-batched ``mapInPandas`` — the realistic
shape for decode/feature-extract at scale (whole batches cross the Python
boundary once, work is per-partition, schema is declared up front).

The actual media decode is STUBBED: the container has no image/audio
libraries, so :func:`decode_image` raises ``NotImplementedError`` for real
decoding and provides a deterministic fake ("dimensions" derived from the
byte payload) that keeps the Spark-side plumbing — schema, batching, UDF
signature — real and testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(payload: bytes, mode: str = "stub") -> dict[str, Any]:
    """Decode an image payload into {width, height, header}.

    ``mode="real"`` is the integration point for an actual codec (PIL /
    libvips) — not available in this environment.
    """
    if mode != "stub":
        raise NotImplementedError(
            "real image decoding requires an image codec library; "
            "only the deterministic stub is available in this environment"
        )
    n = len(payload)
    return {
        "width": n % 640,
        "height": (n * 7) % 480,
        "header": payload[:4].hex(),
    }


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text).

    Stand-in for reading real media blobs; everything downstream treats the
    column as opaque bytes.
    """
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def binary_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Extract typed metadata from a binary column via mapInPandas.

    Output schema: (id, n_bytes, header, fake_width, fake_height). Batches
    arrive as pandas DataFrames (Arrow transfer); per-element work is
    vectorized ``map`` over the bytes objects.
    """
    schema = (
        f"{id_col} long, n_bytes long, header string, fake_width long, fake_height long"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col]
            meta = blobs.map(lambda b: decode_image(bytes(b)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": blobs.map(len).astype("int64"),
                    "header": meta.map(lambda m: m["header"]),
                    "fake_width": meta.map(lambda m: m["width"]).astype("int64"),
                    "fake_height": meta.map(lambda m: m["height"]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def resize_image(payload: bytes, width: int, height: int, mode: str = "stub") -> bytes:
    """Resize an image payload to (width, height).

    ``mode="real"`` is the integration point for an actual codec; the
    deterministic stub emits a fake thumbnail — an 8-byte header
    (dimensions) + a byte-stride sample of the source payload — so size
    bounds, determinism, and the Spark plumbing are all testable.
    """
    if mode != "stub":
        raise NotImplementedError(
            "real image resizing requires an image codec library; "
            "only the deterministic stub is available in this environment"
        )
    header = width.to_bytes(4, "big") + height.to_bytes(4, "big")
    budget = max(1, width * height // 64)
    stride = max(1, len(payload) // budget)
    return header + payload[::stride][:budget]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched thumbnail pass: (id, thumb BINARY, thumb_bytes).

    Map-only — at 100 TB this is the canonical embarrassingly-parallel
    media transform: one Python crossing per Arrow batch, output size
    bounded by (width*height/64 + 8) per row regardless of input size.
    """
    schema = f"{id_col} long, thumb binary, thumb_bytes long"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf[payload_col].map(
                lambda b: resize_image(bytes(b), width, height)
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema)


def sample_frames(
    df: DataFrame,
    n_frames: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Uniform frame sampling from an opaque video payload: one output row
    per (id, frame_idx) with the frame's byte slice and offset.

    The stub treats the payload as ``n_frames`` equal-length segments
    (a real decoder would seek keyframes); the FAN-OUT plumbing is the
    real thing — mapInPandas emitting multiple rows per input row, the
    shape any frame-extraction pipeline needs (never collect, never
    per-row Python UDFs).
    """
    schema = f"{id_col} long, frame_idx int, frame_offset long, frame binary"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(blob)
                seg = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    off = i * seg
                    if off >= len(data):
                        break
                    ids.append(int(rid))
                    idxs.append(i)
                    offs.append(off)
                    frames.append(data[off : off + seg])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema)
