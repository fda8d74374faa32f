"""Streaming CDF source: ``spark.readStream.format("delta_cdf")``.

A Spark Structured Streaming source over this engine's change data feed
(reference kernel/src/table_changes/ — the batch twin is
sources/cdf.py), built on the PySpark 4 Python Data Source API:

* offsets are table versions — each micro-batch covers commit versions
  ``[start, end)``, so progress is exactly-once at commit granularity;
* ``partitions()`` classifies each commit's actions on the driver (commit
  JSONs are small) into per-file read tasks — inserts, removes,
  DV-swap row-level deltas, and cdc files, mirroring the batch arms;
* ``read()`` runs on executors: pyarrow parquet read, row-index
  selection for DV diffs, physical→logical rename, partition-value
  injection, and the ``_change_type`` / ``_commit_version`` /
  ``_commit_timestamp`` columns.

Usage::

    register_cdf_source(spark)
    df = (spark.readStream.format("delta_cdf")
          .option("path", table_path).option("startingVersion", 0).load())
"""

from __future__ import annotations

import datetime as _dt
import json
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from delta_kernel_rs_spark.functions.dv import read_dv_row_indexes
from delta_kernel_rs_spark.functions.schema_codec import parse_schema_string, physical_name
from delta_kernel_rs_spark.sources.storage import storage_for_uri

CDF_COLS = [
    T.StructField("_change_type", T.StringType(), True),
    T.StructField("_commit_version", T.LongType(), True),
    T.StructField("_commit_timestamp", T.TimestampType(), True),
]


def register_cdf_source(spark) -> None:
    spark.dataSource.register(DeltaCdfDataSource)


from delta_kernel_rs_spark.sources.batch_source import (  # noqa: E402
    _PYARROW_READER_FEATURES,
)


def _log_dir(path: str) -> str:
    return f"{path.rstrip('/')}/_delta_log"


def _latest_metadata(storage, path: str) -> dict:
    """Newest metaData action (checkpoint-aware), with the same reader
    protocol gate as Snapshot.create / the batch facade — a table whose
    protocol demands unsupported reader behavior must fail, not misread."""
    from delta_kernel_rs_spark.sources.log_segment import build_log_segment
    from delta_kernel_rs_spark.sources.pyreplay import protocol_of, snapshot_metadata

    seg = build_log_segment(storage, path)
    meta, proto = snapshot_metadata(storage, seg)
    protocol_of(proto).ensure_read_supported(supported=_PYARROW_READER_FEATURES)
    return meta


def _parse_pv_py(raw: str | None, dtype: T.DataType) -> Any:
    """Python twin of the partition-value parse (Delta string serialization)."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if isinstance(dtype, T.StringType):
        return raw
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(raw)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(raw)
    if isinstance(dtype, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dtype, T.DecimalType):
        return Decimal(raw)
    if isinstance(dtype, T.DateType):
        return _dt.date.fromisoformat(raw)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _dt.datetime.fromisoformat(raw)
    return raw


@dataclass
class _CdfTask(InputPartition):
    """One per-file read task of a micro-batch."""

    kind: str  # 'whole' | 'rows_at' | 'rows_excluding' | 'cdc'
    file_path: str
    change_type: str | None  # None for cdc (physical column carries it)
    partition_values: dict
    row_indexes: list[int] = field(default_factory=list)
    version: int = 0
    ts_ms: int = 0


class DeltaCdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        # Spark lower-cases data source option keys.
        opts = {k.lower(): v for k, v in options.items()}
        self._path = opts["path"].rstrip("/")
        self._start = int(opts.get("startingversion", 0))
        # Resolved from the table URI (pyarrow.fs for remote schemes) —
        # works on the driver and executors without a SparkSession.
        self._storage = storage_for_uri(self._path)
        meta = _latest_metadata(self._storage, self._path)
        conf = meta.get("configuration") or {}
        if conf.get("delta.enableChangeDataFeed", "false").lower() != "true":
            raise ValueError("change data feed is not enabled on this table")
        self._table_schema = parse_schema_string(meta["schemaString"])
        self._pcols = list(meta.get("partitionColumns") or [])
        self._out_schema = schema
        # admission control: at most N commits of changes per micro-batch
        # (CDF change sets are per-commit, so the commit is the natural
        # admission unit). Same cursor + Spark-authoritative floor pattern
        # as the append source's rate limits (sources/batch_source.py):
        # latestOffset may be called before initialOffset, and a restart
        # re-syncs the floor from partitions()/commit() with at most one
        # empty micro-batch, never re-emitting rows.
        mc = opts.get("maxcommitspertrigger")
        self._max_commits = int(mc) if mc is not None else None
        if self._max_commits is not None and self._max_commits < 1:
            raise ValueError("maxCommitsPerTrigger must be >= 1")
        self._cursor = self._start
        self._floor = self._start

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        entries = self._storage.list_dir(_log_dir(self._path))
        versions = [
            int(e.path[-25:-5])
            for e in entries
            if e.path.endswith(".json") and e.path[-25:-5].isdigit()
        ]
        tip = (max(versions) + 1) if versions else self._start
        base = max(self._cursor, self._floor)
        if self._max_commits is None:
            self._cursor = max(base, tip)
        else:
            self._cursor = max(base, min(base + self._max_commits, tip))
        return {"version": self._cursor}

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor, end["version"])

    # -- planning (driver) ----------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        sv = max(start["version"], self._floor)
        self._floor = sv
        self._cursor = max(self._cursor, end["version"])
        tasks: list[_CdfTask] = []
        for v in range(sv, end["version"]):
            commit_path = f"{_log_dir(self._path)}/{v:020d}.json"
            adds, removes, cdcs, ict = [], [], [], None
            for line in self._storage.read_text(commit_path).splitlines():
                line = line.strip()
                if not line:
                    continue
                try:
                    action = json.loads(line)
                except ValueError:
                    continue
                if "add" in action:
                    adds.append(action["add"])
                elif "remove" in action:
                    removes.append(action["remove"])
                elif "cdc" in action:
                    cdcs.append(action["cdc"])
                elif "commitInfo" in action:
                    ict = action["commitInfo"].get("inCommitTimestamp")
            ts = ict if ict is not None else self._storage.stat(commit_path).last_modified_ms

            def abs_path(rel: str) -> str:
                import urllib.parse

                rel = urllib.parse.unquote(rel)
                if "://" in rel or rel.startswith("/"):
                    return rel
                return f"{self._path}/{rel}"

            if cdcs:
                tasks.extend(
                    _CdfTask("cdc", abs_path(c["path"]), None,
                             c.get("partitionValues") or {}, [], v, ts)
                    for c in cdcs
                )
                continue
            adds_by = {a["path"]: a for a in adds if a.get("dataChange")}
            removes_by = {r["path"]: r for r in removes if r.get("dataChange")}
            for path, add in adds_by.items():
                remove = removes_by.pop(path, None)
                pv = add.get("partitionValues") or {}
                if remove is None:
                    if add.get("deletionVector"):
                        rows = read_dv_row_indexes(self._storage, self._path, add["deletionVector"])
                        tasks.append(_CdfTask("rows_excluding", abs_path(path), "insert", pv, rows, v, ts))
                    else:
                        tasks.append(_CdfTask("whole", abs_path(path), "insert", pv, [], v, ts))
                    continue
                old = set(
                    read_dv_row_indexes(self._storage, self._path, remove["deletionVector"])
                    if remove.get("deletionVector") else []
                )
                new = set(
                    read_dv_row_indexes(self._storage, self._path, add["deletionVector"])
                    if add.get("deletionVector") else []
                )
                if new - old:
                    tasks.append(_CdfTask("rows_at", abs_path(path), "delete", pv, sorted(new - old), v, ts))
                if old - new:
                    tasks.append(_CdfTask("rows_at", abs_path(path), "insert", pv, sorted(old - new), v, ts))
            for path, remove in removes_by.items():
                pv = remove.get("partitionValues") or {}
                if remove.get("deletionVector"):
                    rows = read_dv_row_indexes(self._storage, self._path, remove["deletionVector"])
                    tasks.append(_CdfTask("rows_excluding", abs_path(path), "delete", pv, rows, v, ts))
                else:
                    tasks.append(_CdfTask("whole", abs_path(path), "delete", pv, [], v, ts))
        return tasks

    # -- execution (workers) ---------------------------------------------
    def read(self, partition: _CdfTask) -> Iterator:  # yields arrow batches
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        task = partition
        table = pq.read_table(task.file_path)
        if task.kind in ("rows_at", "rows_excluding"):
            import pyarrow.compute as pc

            mask_idx = pa.array(task.row_indexes, type=pa.int64())
            indices = pa.array(range(table.num_rows), type=pa.int64())
            member = pc.is_in(indices, value_set=mask_idx)
            if task.kind == "rows_excluding":
                member = pc.invert(member)
            table = table.filter(member)

        pset = set(self._pcols)
        fields_by_name = {f.name: f for f in self._table_schema.fields}
        arrays, names = [], []
        n = table.num_rows
        for f in self._table_schema.fields:
            at = to_arrow_type(f.dataType)
            if f.name in pset:
                val = _parse_pv_py(
                    task.partition_values.get(physical_name(f))
                    if physical_name(f) in task.partition_values
                    else task.partition_values.get(f.name),
                    f.dataType,
                )
                arrays.append(pa.array([val] * n, type=at))
            else:
                col = table.column(physical_name(f)) if physical_name(f) in table.column_names else None
                if col is None:
                    arrays.append(pa.nulls(n, type=at))
                else:
                    arrays.append(col.cast(at))
            names.append(f.name)
        if task.kind == "cdc":
            ct = table.column("_change_type").cast(pa.string())
        else:
            ct = pa.array([task.change_type] * n, type=pa.string())
        arrays.append(ct)
        names.append("_change_type")
        arrays.append(pa.array([task.version] * n, type=pa.int64()))
        names.append("_commit_version")
        ts = _dt.datetime.fromtimestamp(task.ts_ms / 1000, tz=_dt.timezone.utc).replace(tzinfo=None)
        arrays.append(pa.array([ts] * n, type=pa.timestamp("us")))
        names.append("_commit_timestamp")
        out = pa.table(dict(zip(names, arrays)))
        yield from out.to_batches(max_chunksize=1 << 16)


class DeltaCdfDataSource(DataSource):
    """``format("delta_cdf")`` — streaming change feed of a Delta table."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf"

    def schema(self) -> T.StructType:
        meta = _latest_metadata(
            storage_for_uri(self.options["path"]), self.options["path"]
        )
        table_schema = parse_schema_string(meta["schemaString"])
        return T.StructType(list(table_schema.fields) + CDF_COLS)

    def streamReader(self, schema: T.StructType) -> DeltaCdfStreamReader:
        return DeltaCdfStreamReader(schema, dict(self.options))
