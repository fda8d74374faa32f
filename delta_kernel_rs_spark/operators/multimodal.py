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
