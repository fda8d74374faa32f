"""Sequence packing: fill fixed-capacity token bins with whole documents.

The training-prep step after tokenization: concatenate documents into
context-window-sized sequences so padding waste stays low. Packing is
inherently sequential (bin state), so the distributed shape is
shard-then-pack: a deterministic shard key fans the corpus out, and each
shard packs independently with the O(1)-state NEXT-FIT rule (close the
current bin as soon as the next document does not fit). Next-fit is the
single-pass streaming packer — no lookback, no global sort — which is why
it, and not best-fit, is the rule that survives a 1000-executor corpus.

Spark side: one `groupBy(shard).applyInPandas` — Arrow-batched, one
Python crossing per shard, state never leaves the executor. The DuckDB
oracle replays the identical fold as a recursive CTE, so the assignment
is bit-checkable: same bins, same offsets, at any scale factor.

A document longer than the capacity still gets its own (overfull) bin —
truncation is a separate policy decision (see text.chunk_documents for
the splitting alternative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    capacity: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Next-fit pack documents into token bins of ``capacity`` per shard.

    Returns (doc_id, shard, bin_id, bin_offset, n_tokens): the bin each
    document landed in (0-based per shard), its token offset inside the
    bin, and its token count. Documents pack in ``id_col`` order within
    ``id_col % n_shards`` shards — fully deterministic.
    """
    if capacity < 1 or n_shards < 1:
        raise ValueError("capacity and n_shards must be >= 1")

    sized = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )

    out_schema = (
        f"{id_col} long, shard int, bin_id int, bin_offset int, n_tokens int"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col)
        bin_id, fill = 0, 0
        bins, offsets = [], []
        first = True
        for n in pdf["n_tokens"]:
            n = int(n)
            if not first and fill + n > capacity:
                bin_id += 1
                fill = 0
            first = False
            bins.append(bin_id)
            offsets.append(fill)
            fill += n
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "shard": pdf["shard"].values,
                "bin_id": bins,
                "bin_offset": offsets,
                "n_tokens": pdf["n_tokens"].values,
            }
        )

    return sized.groupBy("shard").applyInPandas(pack, out_schema)


def dk_pack_oracle_sql(
    capacity: int = 256, n_shards: int = 8, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`pack_documents`: the same next-fit fold as a
    recursive CTE stepping one document per shard per iteration."""
    return f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, CAST(doc_id % {n_shards} AS INTEGER) shard,
             CAST(len(string_split(text, ' ')) AS INTEGER) n_tokens,
             row_number() OVER (PARTITION BY doc_id % {n_shards}
                                ORDER BY doc_id) rn
      FROM {table}),
    p AS (
      SELECT doc_id, shard, rn, n_tokens,
             0 AS bin_id, 0 AS bin_offset, n_tokens AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.doc_id, d.shard, d.rn, d.n_tokens,
             CASE WHEN p.fill + d.n_tokens > {capacity}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.fill + d.n_tokens > {capacity}
                  THEN 0 ELSE p.fill END,
             CASE WHEN p.fill + d.n_tokens > {capacity}
                  THEN d.n_tokens ELSE p.fill + d.n_tokens END
      FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
    SELECT doc_id, shard, CAST(bin_id AS INTEGER) AS bin_id,
           CAST(bin_offset AS INTEGER) AS bin_offset, n_tokens
    FROM p
    """
