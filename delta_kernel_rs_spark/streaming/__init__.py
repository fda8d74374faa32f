"""Structured Streaming integration.

The reference's streaming-shaped capability is the change feed
(kernel/src/table_changes/); here it becomes a real Spark streaming
source: ``spark.readStream.format("delta_cdf")`` over a table written by
this engine, built on the PySpark 4 Python Data Source API. See
:mod:`delta_kernel_rs_spark.streaming.cdf_source`.
"""

from delta_kernel_rs_spark.streaming.backfill import available_now_backfill
from delta_kernel_rs_spark.streaming.cdf_source import (
    DeltaCdfDataSource,
    register_cdf_source,
)

__all__ = [
    "DeltaCdfDataSource",
    "available_now_backfill",
    "register_cdf_source",
]
