"""Batch read facade: ``spark.read.format("delta_kernel")``.

The batch twin of the streaming CDF source (streaming/cdf_source.py),
built on the PySpark 4 Python Data Source API. Compared to
``DeltaTable.to_df()`` — whose ``Scan.files()`` collects one Python
``ScanFile`` per live file on the driver — this reader plans its input
partitions from the SparkSession-free Arrow replay (sources/pyreplay.py):

* planning keeps the live-file list columnar (checkpoint bulk never
  becomes Python objects) and bin-packs files into read tasks by
  cumulative size, exactly like Spark's own ``FilePartition`` planning;
* each task ships to executors as an Arrow IPC slice;
* ``read()`` runs on executors: pyarrow parquet read, DV decode + row
  filtering (executor-side, like the main scan), physical→logical
  rename under column mapping, partition-value injection, type casts.

Usage::

    register_batch_source(spark)
    df = (spark.read.format("delta_kernel")
          .option("path", table_path)
          .option("versionAsOf", 3)          # optional time travel
          .load())

Options: ``path`` (required), ``versionAsOf`` (int), ``targetBytes``
(bytes of data per read task, default 128 MiB).

Reference: the read path composes kernel/src/scan/mod.rs semantics
(file listing + DV + file constants) behind Spark's source API; file
skipping predicates are not pushed through this facade yet — use
``DeltaTable.scan(predicate=...)`` for skipping reads.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from delta_kernel_rs_spark.functions.schema_codec import parse_schema_string, physical_name
from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.pyreplay import (
    bin_pack_by_size,
    ipc_deserialize,
    ipc_serialize,
    live_files_arrow,
    pq_read,
    snapshot_metadata,
)
from delta_kernel_rs_spark.sources.storage import storage_for_uri

DEFAULT_TARGET_BYTES = 128 << 20


def register_batch_source(spark) -> None:
    spark.dataSource.register(DeltaKernelDataSource)


def _opts(options: dict) -> dict:
    # Spark lower-cases data source option keys.
    return {k.lower(): v for k, v in options.items()}


@dataclass
class _FileSliceTask(InputPartition):
    """One read task: an Arrow IPC buffer of its file-list slice."""

    ipc: bytes


class DeltaKernelDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_kernel"

    def _segment(self):
        opts = _opts(self.options)
        path = opts["path"].rstrip("/")
        version = opts.get("versionasof")
        storage = storage_for_uri(path)
        seg = build_log_segment(
            storage, path, None if version is None else int(version)
        )
        return storage, seg

    def schema(self) -> T.StructType:
        storage, seg = self._segment()
        meta, _ = snapshot_metadata(storage, seg)
        return parse_schema_string(meta["schemaString"])

    def reader(self, schema: T.StructType) -> "DeltaKernelBatchReader":
        return DeltaKernelBatchReader(schema, self.options)


class DeltaKernelBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        opts = _opts(options)
        self._path = opts["path"].rstrip("/")
        version = opts.get("versionasof")
        self._version = None if version is None else int(version)
        self._target_bytes = int(opts.get("targetbytes", DEFAULT_TARGET_BYTES))
        storage = storage_for_uri(self._path)
        self._seg = build_log_segment(storage, self._path, self._version)
        meta, _ = snapshot_metadata(storage, self._seg)
        self._table_schema = parse_schema_string(meta["schemaString"])
        self._pcols = list(meta.get("partitionColumns") or [])

    # -- planning (driver-side worker; no per-file Python objects) -------
    def partitions(self) -> Sequence[InputPartition]:
        storage = storage_for_uri(self._path)
        files = live_files_arrow(storage, self._seg)
        slices = bin_pack_by_size(files, self._target_bytes)
        if not slices:
            return [_FileSliceTask(ipc_serialize(files))]  # empty table
        return [_FileSliceTask(ipc_serialize(s)) for s in slices]

    # -- execution (workers) ---------------------------------------------
    def read(self, partition: _FileSliceTask) -> Iterator[Any]:
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark.sql.pandas.types import to_arrow_type

        from delta_kernel_rs_spark.functions.dv import read_dv_row_indexes
        from delta_kernel_rs_spark.streaming.cdf_source import _parse_pv_py

        files = ipc_deserialize(partition.ipc)
        if files.num_rows == 0:
            return
        storage = storage_for_uri(self._path)
        pset = set(self._pcols)
        phys_cols = [
            physical_name(f) for f in self._table_schema.fields if f.name not in pset
        ]
        for i in range(files.num_rows):
            import urllib.parse

            rel = urllib.parse.unquote(files.column("path")[i].as_py())
            abs_path = (
                rel if "://" in rel or rel.startswith("/") else f"{self._path}/{rel}"
            )
            avail = pq_read_schema_names(abs_path)
            cols = [c for c in phys_cols if c in avail]
            table = pq_read(abs_path, columns=cols or None)
            dv = files.column("dv")[i].as_py()
            if dv and dv.get("storageType"):
                rows = read_dv_row_indexes(storage, self._path, dv)
                mask_idx = pa.array(rows, type=pa.int64())
                indices = pa.array(range(table.num_rows), type=pa.int64())
                keep = pc.invert(pc.is_in(indices, value_set=mask_idx))
                table = table.filter(keep)
            pv_items = files.column("partition_values")[i].as_py() or []
            pv = dict(pv_items)
            n = table.num_rows
            arrays, names = [], []
            for f in self._table_schema.fields:
                at = to_arrow_type(f.dataType)
                if f.name in pset:
                    raw = pv.get(physical_name(f), pv.get(f.name))
                    val = _parse_pv_py(raw, f.dataType)
                    arrays.append(pa.array([val] * n, type=at))
                else:
                    pn = physical_name(f)
                    if pn in table.column_names:
                        arrays.append(table.column(pn).cast(at))
                    else:
                        arrays.append(pa.nulls(n, type=at))
                names.append(f.name)
            yield pa.RecordBatch.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
                names,
            )


def pq_read_schema_names(path: str) -> list[str]:
    import pyarrow.parquet as pq

    if "://" in path and not path.startswith("file://"):
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        return pq.read_schema(rel, filesystem=fs).names
    return pq.read_schema(path.removeprefix("file://")).names
