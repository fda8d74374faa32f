"""Loaders for the driver's synthetic tables (see TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.session import apply_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; normalizes ``events.ts`` to TimestampType.

    The driver has generated ``events.ts`` as either parquet
    TIMESTAMP(NANOS) (read as long under
    ``spark.sql.legacy.parquet.nanosAsLong``, truncated to microseconds
    exactly like DuckDB — integer division, not rounding) or plain
    TIMESTAMP(MICROS) without UTC adjustment (read as timestamp_ntz).
    Both normalize to the same UTC-instant TimestampType because the
    session time zone is pinned to UTC (session.RUNTIME_CONFS).
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df
