"""Batch read facade: ``spark.read.format("delta_kernel")``.

The batch twin of the streaming CDF source (streaming/cdf_source.py),
built on the PySpark 4 Python Data Source API. Unlike
``DeltaTable.to_df()`` — which plans from ``scan_files_df()`` inside the
host SparkSession — this reader plans its input partitions from the
SparkSession-free Arrow replay (sources/pyreplay.py):

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

Options: ``path`` (required), ``versionAsOf`` (int), ``timestampAsOf``
(epoch ms or ISO datetime; ICT-aware O(log n) resolution), ``targetBytes``
(bytes of data per read task, default 128 MiB), ``predicate`` (SQL
string) — parsed by plans/sql_parser into the typed AST, partition-pruned
exactly at planning (pure-Python 3VL, plans/py_predicate.py), and applied
executor-side as a pyarrow Expression (row-group statistics pruning +
exact row filtering). Unsupported predicates raise rather than silently
returning unfiltered rows.

The same format also exposes a Structured Streaming APPEND source
(``spark.readStream.format("delta_kernel")`` — see
:class:`DeltaKernelStreamReader`): offsets are commit versions, each
micro-batch reads the files added in its version range, with Delta's
ignoreDeletes/ignoreChanges semantics for non-append commits.

Reference: the read path composes kernel/src/scan/mod.rs semantics
(file listing + DV + file constants + scan predicate) behind Spark's
source API.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from delta_kernel_rs_spark.functions.schema_codec import parse_schema_string, physical_name
from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.pyreplay import (
    bin_pack_by_size,
    ipc_deserialize,
    ipc_serialize,
    live_files_arrow,
    pq_read,
    protocol_of,
    snapshot_metadata,
)
from delta_kernel_rs_spark.sources.storage import storage_for_uri

DEFAULT_TARGET_BYTES = 128 << 20

#: The facade reads parquet with pyarrow, which cannot decode VARIANT
#: pages (plain or shredded) the way the JVM reader can — narrow the
#: read gate so variant-bearing tables fail fast at planning with a
#: feature error instead of a mid-scan decode error.
from delta_kernel_rs_spark.sources.snapshot import Protocol as _Protocol  # noqa: E402

_PYARROW_READER_FEATURES = _Protocol.SUPPORTED_READER_FEATURES - {
    "variantType",
    "variantType-preview",
    "variantShredding",
    "variantShredding-preview",
}


def register_batch_source(spark) -> None:
    # The reader implements pushFilters, and Spark refuses to plan such a
    # source unless Python filter pushdown is enabled — turn it on for the
    # registering session (it is dynamic and in session.RUNTIME_CONFS too).
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:  # pragma: no cover - immutable on exotic sessions
        pass
    spark.dataSource.register(DeltaKernelDataSource)


def _opts(options: dict) -> dict:
    # Spark lower-cases data source option keys.
    return {k.lower(): v for k, v in options.items()}


def _warn_rate_limit_under_available_now(option_name: str) -> None:
    """One AvailableNow run of a rate-limited Python stream is ONE bounded
    micro-batch, not a full backfill (no SupportsTriggerAvailableNow hook
    in the Python DataSourceStreamReader API) — say so at runtime, not
    just in the docstring (ADVICE r11). The source cannot see the trigger
    type, so the warning fires whenever a rate limit is configured."""
    import warnings

    warnings.warn(
        f"{option_name} paces processingTime triggers; under "
        "Trigger.AvailableNow the Python streaming API processes exactly "
        "ONE bounded micro-batch per run, so one run is NOT a full "
        "backfill (the checkpoint advances; re-runs continue). For a "
        "one-shot full backfill use "
        "delta_kernel_rs_spark.streaming.available_now_backfill().",
        RuntimeWarning,
        stacklevel=3,
    )


def _resolve_version(storage, path: str, opts: dict) -> int | None:
    """versionAsOf / timestampAsOf → pinned version (None = latest).

    timestampAsOf accepts epoch milliseconds or an ISO datetime (naive =
    UTC) and resolves through the ICT-aware O(log n) history search."""
    version = opts.get("versionasof")
    ts = opts.get("timestampasof")
    if version is not None and ts is not None:
        raise ValueError("set versionAsOf or timestampAsOf, not both")
    if version is not None:
        return int(version)
    if ts is None:
        return None
    from delta_kernel_rs_spark.sources.history import version_at_timestamp_for_storage

    return version_at_timestamp_for_storage(storage, path, _parse_ts_ms(ts))


def _parse_ts_ms(ts: str) -> int:
    """Epoch milliseconds or ISO datetime (naive = UTC) → epoch ms."""
    try:
        return int(ts)
    except ValueError:
        import datetime as _dt

        d = _dt.datetime.fromisoformat(ts)
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return int(d.timestamp() * 1000)


def _parse_predicate_opt(pred_str: str | None, table_schema: T.StructType):
    """Parse + literal-coerce + validate a predicate option against the
    table schema; raises for out-of-grammar or uncompilable predicates
    (silently returning unfiltered rows would be wrong)."""
    if not pred_str:
        return None
    from delta_kernel_rs_spark.plans.py_predicate import (
        coerce_literals,
        to_arrow_expr,
    )
    from delta_kernel_rs_spark.plans.sql_parser import try_parse_sql_predicate

    ast = try_parse_sql_predicate(pred_str, table_schema)
    if ast is None:
        raise ValueError(
            f"predicate {pred_str!r} is outside the supported SQL "
            "grammar; drop the option and .filter() instead"
        )
    ast = coerce_literals(ast, table_schema)
    to_arrow_expr(
        ast,
        {f.name: physical_name(f) for f in table_schema.fields},
        table_schema,
    )
    return ast


def _filter_to_ast(f, table_schema: T.StructType):
    """Translate one pushed :class:`pyspark.sql.datasource.Filter` into the
    engine's typed predicate AST (plans/expressions.py), or None when the
    filter's shape is outside what the engine can use for skipping
    (nested column paths, non-scalar literals, patterns with wildcards).

    Returning None is always safe: every pushed filter is ALSO returned
    to Spark for re-application (see :meth:`DeltaKernelBatchReader
    .pushFilters`), so translation only ever ADDS pruning power."""
    import datetime as _dt
    from decimal import Decimal

    from pyspark.sql import datasource as DS

    from delta_kernel_rs_spark.plans import expressions as E

    if isinstance(f, DS.Not):
        child = _filter_to_ast(f.child, table_schema)
        return E.Not(child) if child is not None else None
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested struct paths stay Spark-side
    name = attr[0]
    if name not in {fl.name for fl in table_schema.fields}:
        return None
    col = E.Col(name)
    scalar = (bool, int, float, str, Decimal, _dt.date, _dt.datetime)

    def ok(v) -> bool:
        return v is None or isinstance(v, scalar)

    cmp_ops = {
        DS.EqualTo: "eq",
        DS.GreaterThan: "gt",
        DS.GreaterThanOrEqual: "ge",
        DS.LessThan: "lt",
        DS.LessThanOrEqual: "le",
    }
    for cls, op in cmp_ops.items():
        if isinstance(f, cls):
            return E.Compare(op, col, E.Literal(f.value)) if ok(f.value) else None
    if isinstance(f, DS.EqualNullSafe):
        return E.NotDistinct(col, E.Literal(f.value)) if ok(f.value) else None
    if isinstance(f, DS.In):
        vals = tuple(f.value)
        return E.In(col, vals) if all(ok(v) for v in vals) else None
    if isinstance(f, DS.IsNull):
        return E.IsNull(col)
    if isinstance(f, DS.IsNotNull):
        return E.IsNotNull(col)
    if isinstance(f, (DS.StringStartsWith, DS.StringEndsWith, DS.StringContains)):
        s = f.value
        if not isinstance(s, str) or any(ch in s for ch in ("%", "_", "\\")):
            return None  # would need LIKE escaping the AST doesn't model
        if isinstance(f, DS.StringStartsWith):
            return E.Like(col, s + "%")
        if isinstance(f, DS.StringEndsWith):
            return E.Like(col, "%" + s)
        return E.Like(col, "%" + s + "%")
    return None


def _select_fields(schema: T.StructType, columns: str | None) -> list:
    """Apply the ``columns`` option (comma-separated logical names) —
    column pruning for the facade, which the Python Data Source API cannot
    push down automatically. Table order is preserved; unknown names fail
    fast on the driver."""
    if not columns:
        return list(schema.fields)
    want = [c.strip() for c in columns.split(",") if c.strip()]
    known = {f.name for f in schema.fields}
    missing = [c for c in want if c not in known]
    if missing:
        raise ValueError(f"columns option names unknown columns: {missing}")
    wset = set(want)
    return [f for f in schema.fields if f.name in wset]


@dataclass
class _FileSliceTask(InputPartition):
    """One read task: an Arrow IPC buffer of its file-list slice."""

    ipc: bytes


class DeltaKernelDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "delta_kernel"

    def _is_cdf(self) -> bool:
        return (
            str(_opts(self.options).get("readchangefeed", "false")).lower()
            == "true"
        )

    def _segment(self):
        # memoized: Spark calls schema() and reader() on the same instance,
        # and timestampAsOf resolution costs a listing + O(log n) commit
        # reads — pay it once per load(), not per callback
        cached = getattr(self, "_seg_cache", None)
        if cached is not None:
            return cached
        opts = _opts(self.options)
        path = opts["path"].rstrip("/")
        storage = storage_for_uri(path)
        seg = build_log_segment(storage, path, _resolve_version(storage, path, opts))
        self._seg_cache = (storage, seg)
        return self._seg_cache

    def schema(self) -> T.StructType:
        if self._is_cdf():
            # end-version schema + the three CDF columns. Start-side
            # validation happens in the BATCH reader only — the streaming
            # CDF reader defaults startingVersion itself.
            opts = _opts(self.options)
            path = opts["path"].rstrip("/")
            storage = storage_for_uri(path)
            end = _resolve_cdf_end(storage, path, opts)
            seg = build_log_segment(storage, path, end)
            meta, proto = snapshot_metadata(storage, seg)
            protocol_of(proto).ensure_read_supported(
                supported=_PYARROW_READER_FEATURES
            )
            full = parse_schema_string(meta["schemaString"])
            return T.StructType(
                _select_fields(full, opts.get("columns")) + _CDF_META_FIELDS
            )
        storage, seg = self._segment()
        meta, proto = snapshot_metadata(storage, seg)
        protocol_of(proto).ensure_read_supported(supported=_PYARROW_READER_FEATURES)
        full = parse_schema_string(meta["schemaString"])
        return T.StructType(_select_fields(full, _opts(self.options).get("columns")))

    def reader(self, schema: T.StructType):
        if self._is_cdf():
            return DeltaKernelCDFReader(self.options)
        opts = dict(self.options)
        if any(k.lower() == "timestampasof" for k in opts):
            # hand the reader the already-resolved pinned version instead of
            # re-running the history search
            _, seg = self._segment()
            opts = {
                k: v
                for k, v in opts.items()
                if k.lower() not in ("timestampasof", "versionasof")
            }
            opts["versionAsOf"] = str(seg.version)
        return DeltaKernelBatchReader(schema, opts)

    def writer(self, schema: T.StructType, overwrite: bool) -> "DeltaKernelBatchWriter":
        if overwrite:
            raise ValueError(
                "delta_kernel sink is append-only; use DeltaTable for overwrite"
            )
        return DeltaKernelBatchWriter(schema, self.options)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> "DeltaKernelStreamWriter":
        if overwrite:
            raise ValueError("delta_kernel streaming sink is append-only")
        return DeltaKernelStreamWriter(schema, self.options)

    def streamReader(self, schema: T.StructType):
        if self._is_cdf():
            # delta-spark idiom: readStream + readChangeFeed on the SAME
            # format serves the streaming change feed (the standalone
            # "delta_cdf" format remains as the explicit spelling).
            # Batch-only options must fail fast here, never silently no-op
            # (the stream is unbounded, so an ending bound cannot be
            # honored; predicate is a batch-reader feature).
            opts = _opts(self.options)
            for key, label in (
                ("endingversion", "endingVersion"),
                ("endingtimestamp", "endingTimestamp"),
                ("predicate", "predicate"),
                ("versionasof", "versionAsOf"),
                ("timestampasof", "timestampAsOf"),
            ):
                if opts.get(key) is not None:
                    raise ValueError(
                        f"{label} is not supported for streaming "
                        "readChangeFeed; it applies to batch reads only"
                    )
            from delta_kernel_rs_spark.streaming.cdf_source import (
                DeltaCdfStreamReader,
            )

            return DeltaCdfStreamReader(schema, dict(self.options))
        return DeltaKernelStreamReader(schema, self.options)


class _FileSliceReadMixin:
    """Executor-side read of a ``_FileSliceTask`` — shared by the batch
    reader and the streaming append reader. Requires attributes ``_path``,
    ``_table_schema``, ``_pcols``, ``_predicate`` (may be None); readers
    may set ``_out_fields`` to emit a pruned projection (predicates still
    evaluate against the full schema)."""

    @property
    def _output_fields(self) -> list:
        return getattr(self, "_out_fields", None) or list(self._table_schema.fields)

    def _predicate_cols(self) -> frozenset:
        """Logical column paths the predicate references (cached)."""
        cached = getattr(self, "_pred_cols", None)
        if cached is not None:
            return cached
        from delta_kernel_rs_spark.plans.expressions import Col as _Col

        def walk(node, acc):
            for attr in ("expr", "left", "right", "child"):
                sub = getattr(node, attr, None)
                if sub is not None:
                    walk(sub, acc)
            for sub in getattr(node, "children", ()) or ():
                walk(sub, acc)
            if isinstance(node, _Col):
                acc.add(node.path)
            return acc

        self._pred_cols = frozenset(
            walk(self._predicate, set()) if self._predicate is not None else ()
        )
        return self._pred_cols

    def _pv_typed(self, pv_items) -> dict:
        from delta_kernel_rs_spark.streaming.cdf_source import _parse_pv_py

        pv = dict(pv_items or [])
        out = {}
        for f in self._table_schema.fields:
            if f.name in self._pcols:
                raw = pv.get(physical_name(f), pv.get(f.name))
                out[f.name] = _parse_pv_py(raw, f.dataType)
        return out

    def _read_slice(self, partition: "_FileSliceTask") -> Iterator[Any]:
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
            physical_name(f) for f in self._output_fields if f.name not in pset
        ]
        name_map = {f.name: physical_name(f) for f in self._table_schema.fields}
        for i in range(files.num_rows):
            import urllib.parse

            rel = urllib.parse.unquote(files.column("path")[i].as_py())
            abs_path = (
                rel if "://" in rel or rel.startswith("/") else f"{self._path}/{rel}"
            )
            avail = pq_read_schema_names(abs_path)
            cols = [c for c in phys_cols if c in avail]
            pv_items = files.column("partition_values")[i].as_py() or []
            pv = dict(pv_items)

            # Per-file residual: partition columns and file-absent columns
            # substitute as literals; a True verdict reads unfiltered, a
            # False verdict skips the file entirely, unknown compiles to a
            # pyarrow filter (row-group stats pruning + exact row filter —
            # the Python twin of Catalyst's parquet pushdown).
            row_filter = None
            if self._predicate is not None:
                from delta_kernel_rs_spark.plans.py_predicate import (
                    eval_3vl,
                    substitute,
                    to_arrow_expr,
                )

                missing = {
                    f.name
                    for f in self._table_schema.fields
                    if f.name not in pset and physical_name(f) not in avail
                }
                known_row = self._pv_typed(pv_items)
                known_row.update({m: None for m in missing})
                known = set(self._pcols) | missing
                verdict = eval_3vl(self._predicate, known_row, known)
                if verdict is False:
                    continue
                if verdict is None:
                    row_filter = to_arrow_expr(
                        substitute(self._predicate, known_row, known),
                        name_map,
                        self._table_schema,
                    )

            dv = files.column("dv")[i].as_py()
            has_dv = bool(dv and dv.get("storageType"))
            read_cols = cols
            if has_dv and row_filter is not None:
                # the in-memory residual filter (applied after DV masking)
                # references full-schema columns; pq_read(filters=...) can
                # filter on non-projected columns, Table.filter cannot — so
                # widen the projection to the predicate's columns
                needed = {name_map.get(p, p) for p in self._predicate_cols()}
                read_cols = cols + [
                    c for c in sorted(needed & set(avail)) if c not in cols
                ]
            # read_cols == [] is a metadata-sized read: pyarrow preserves
            # num_rows on a zero-column projection, which is all a
            # partition-columns-only output (or a pure count) needs
            if has_dv or row_filter is None:
                table = pq_read(abs_path, columns=read_cols)
            else:
                table = pq_read(abs_path, columns=read_cols, filters=row_filter)
            if has_dv:
                rows = read_dv_row_indexes(storage, self._path, dv)
                mask_idx = pa.array(rows, type=pa.int64())
                indices = pa.array(range(table.num_rows), type=pa.int64())
                keep = pc.invert(pc.is_in(indices, value_set=mask_idx))
                table = table.filter(keep)
                if row_filter is not None:
                    # DV selection is by physical row index, so it must be
                    # applied before any row filtering shifts positions
                    table = table.filter(row_filter)
            n = table.num_rows
            arrays, names = [], []
            for f in self._output_fields:
                at = to_arrow_type(f.dataType)
                if f.name in pset:
                    raw = pv.get(physical_name(f), pv.get(f.name))
                    val = _parse_pv_py(raw, f.dataType)
                    arrays.append(pa.array([val] * n, type=at))
                else:
                    pn = physical_name(f)
                    if table.num_columns and pn in table.column_names:
                        arrays.append(table.column(pn).cast(at))
                    else:
                        arrays.append(pa.nulls(n, type=at))
                names.append(f.name)
            yield pa.RecordBatch.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
                names,
            )


class DeltaKernelBatchReader(_FileSliceReadMixin, DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        opts = _opts(options)
        self._path = opts["path"].rstrip("/")
        self._target_bytes = int(opts.get("targetbytes", DEFAULT_TARGET_BYTES))
        storage = storage_for_uri(self._path)
        self._version = _resolve_version(storage, self._path, opts)
        self._seg = build_log_segment(storage, self._path, self._version)
        meta, proto = snapshot_metadata(storage, self._seg)
        # same gate as Snapshot.create: never silently misread a table whose
        # protocol demands reader behavior this engine lacks
        protocol_of(proto).ensure_read_supported(supported=_PYARROW_READER_FEATURES)
        self._table_schema = parse_schema_string(meta["schemaString"])
        self._pcols = list(meta.get("partitionColumns") or [])
        self._configuration = meta.get("configuration") or {}
        self._predicate = _parse_predicate_opt(
            opts.get("predicate"), self._table_schema
        )
        self._out_fields = _select_fields(self._table_schema, opts.get("columns"))

    # -- filter pushdown (driver-side worker, before partitions()) --------
    def pushFilters(self, filters):
        """Spark's pushed filters drive the engine's file skipping.

        The reference treats the scan predicate as a first-class builder
        input (kernel/src/scan/mod.rs:383-437, PhysicalPredicate::try_new
        :439-509); the Spark-idiomatic spelling is this hook — a bare
        ``.filter("x > 5")`` on a facade read prunes partitions at
        planning, skips files, and row-group-prunes the parquet reads,
        with no ``predicate`` option needed (the option remains as the
        explicit spelling and composes via AND).

        Every filter is returned to Spark for re-application. That is the
        reference's own scan contract — data skipping is best-effort and
        "engines must re-apply the predicate" (scan/mod.rs docs) — so the
        translation layer only ever ADDS pruning, never owns row-level
        correctness. Requires spark.sql.python.filterPushdown.enabled
        (set by session.RUNTIME_CONFS; Spark fails fast when off).
        """
        translated = []
        name_map = {f.name: physical_name(f) for f in self._table_schema.fields}
        for f in filters:
            ast = _filter_to_ast(f, self._table_schema)
            if ast is None:
                continue
            try:
                from delta_kernel_rs_spark.plans.py_predicate import (
                    coerce_literals,
                    to_arrow_expr,
                )

                ast = coerce_literals(ast, self._table_schema)
                to_arrow_expr(  # must compile for executors
                    ast, name_map, self._table_schema
                )
            except Exception:
                continue  # stays Spark-side only
            translated.append(ast)
        if translated:
            from delta_kernel_rs_spark.plans import expressions as E

            parts = ([self._predicate] if self._predicate is not None else []) + translated
            self._predicate = parts[0] if len(parts) == 1 else E.And(tuple(parts))
            self._pred_cols = None  # invalidate the cached column set
        return filters

    # -- planning (driver-side worker; no per-file Python objects) -------
    def partitions(self) -> Sequence[InputPartition]:
        storage = storage_for_uri(self._path)
        files = live_files_arrow(storage, self._seg)
        if self._predicate is not None and files.num_rows:
            # unified file skipping: exact partition pruning (typed 3VL
            # over partitionValues) + stats-based min/max skipping from
            # add.stats — the facade twin of plans/data_skipping.py
            # (reference data_skipping.rs keep-rule: drop a file only on a
            # definitively-False verdict; unknown always keeps)
            from delta_kernel_rs_spark.plans.expressions import normalize
            from delta_kernel_rs_spark.plans.py_skipping import FileSkipEvaluator

            ev = FileSkipEvaluator(
                self._table_schema, self._pcols, self._configuration
            )
            pred = normalize(self._predicate)
            keep = [
                ev.verdict(pred, self._pv_typed(pv), st) is not False
                for pv, st in zip(
                    files.column("partition_values").to_pylist(),
                    files.column("stats").to_pylist(),
                )
            ]
            import pyarrow as pa

            files = files.filter(pa.array(keep, type=pa.bool_()))
        # stats served planning; keep them off the executor IPC tasks
        files = files.drop_columns(["stats"])
        slices = bin_pack_by_size(files, self._target_bytes)
        if not slices:
            return [_FileSliceTask(ipc_serialize(files))]  # empty table
        return [_FileSliceTask(ipc_serialize(s)) for s in slices]

    # -- execution (workers) ---------------------------------------------
    def read(self, partition: _FileSliceTask) -> Iterator[Any]:
        return self._read_slice(partition)


# ---------------------------------------------------------------------------
# CDF through the facade: spark.read.format("delta_kernel")
#   .option("readChangeFeed", "true").option("startingVersion", 0).load()
#
# The SparkSession-free twin of sources/cdf.py table_changes (reference
# kernel/src/table_changes/mod.rs:1-170): planning classifies the range's
# commits into cdc / insert / delete / DV-swap events (cdc supersedes
# add/remove within its commit, log_replay.rs:46-100), bin-packs them
# into read tasks, and executors read the parquet, apply DV exclusions /
# bitmap diffs (resolve_dvs.rs) and emit logical rows with the three CDF
# metadata columns. Driver state is O(file events in the range) — the
# same bound as table_changes' per-arm path lists.

_CDF_META_FIELDS = [
    T.StructField("_change_type", T.StringType(), True),
    T.StructField("_commit_version", T.LongType(), True),
    T.StructField("_commit_timestamp", T.TimestampType(), True),
]


def _cdf_enabled(meta: dict) -> bool:
    cfg = meta.get("configuration") or {}
    return str(cfg.get("delta.enableChangeDataFeed", "false")).lower() == "true"


def _resolve_cdf_end(storage, path: str, opts: dict) -> int:
    """End version for CDF reads: endingVersion, endingTimestamp (last
    commit at/before it), or the current tip."""
    ev, et = opts.get("endingversion"), opts.get("endingtimestamp")
    if ev is not None and et is not None:
        raise ValueError("set endingVersion or endingTimestamp, not both")
    if ev is not None:
        return int(ev)
    if et is not None:
        from delta_kernel_rs_spark.sources.history import (
            version_at_timestamp_for_storage,
        )

        return version_at_timestamp_for_storage(storage, path, _parse_ts_ms(et))
    return build_log_segment(storage, path).version


def _resolve_cdf_range(storage, path: str, opts: dict) -> tuple[int, int]:
    """CDF range from options; raises on contradictory or invalid ranges
    (range-validation errors must surface through the facade, not produce
    silently-empty feeds)."""
    sv, st = opts.get("startingversion"), opts.get("startingtimestamp")
    if sv is not None and st is not None:
        raise ValueError("set startingVersion or startingTimestamp, not both")
    if sv is None and st is None:
        raise ValueError(
            "readChangeFeed requires startingVersion or startingTimestamp"
        )
    if sv is not None:
        start = int(sv)
    else:
        from delta_kernel_rs_spark.sources.history import (
            first_version_after_for_storage,
        )

        start = first_version_after_for_storage(storage, path, _parse_ts_ms(st))
    end = _resolve_cdf_end(storage, path, opts)
    if start > end:
        raise ValueError(f"start {start} > end {end}")
    return start, end


def _cdf_event_schema():
    import pyarrow as pa

    from delta_kernel_rs_spark.sources.pyreplay import DV_TYPE

    return pa.schema(
        [
            ("kind", pa.string()),
            ("path", pa.string()),
            ("size", pa.int64()),
            ("partition_values", pa.map_(pa.string(), pa.string())),
            ("dv_old", DV_TYPE),
            ("dv_new", DV_TYPE),
            ("version", pa.int64()),
            ("ts_ms", pa.int64()),
        ]
    )


def _plan_cdf_events(storage, table_path: str, start: int, end: int, listing=None):
    """One Arrow table of (kind, path, pv, dvs, version, ts) change events
    for the range — cdc supersedes add/remove per commit, remove+add of
    the same path is a DV swap, bare adds/removes are whole-file
    inserts/deletes; a mid-range metaData that disables CDF fails the
    whole range (reference table_changes/mod.rs:90-162).

    ``listing`` (name → FileEntry) lets a caller that already listed the
    log reuse it; otherwise only the [start, end] commit files are
    stat()ed — O(range), never O(log size). A long-lived streaming table
    must not pay a full directory listing per trigger."""
    import pyarrow as pa

    from delta_kernel_rs_spark.sources.pyreplay import _iter_actions

    log_dir = f"{table_path}/_delta_log"
    if listing is None:
        listing = {}
        for v in range(start, end + 1):
            name = f"{v:020d}.json"
            p = f"{log_dir}/{name}"
            if storage.exists(p):
                listing[name] = storage.stat(p)
    rows: list[dict] = []
    for v in range(start, end + 1):
        name = f"{v:020d}.json"
        entry = listing.get(name)
        if entry is None:
            raise ValueError(
                f"commit {v} is missing from the log — the requested CDF "
                f"range [{start}, {end}] is unavailable (log retention may "
                "have expired it)"
            )
        ict: int | None = None
        adds: dict[str, dict] = {}
        removes: dict[str, dict] = {}
        cdcs: list[dict] = []
        for action in _iter_actions(storage, f"{log_dir}/{name}"):
            if "commitInfo" in action:
                t = (action["commitInfo"] or {}).get("inCommitTimestamp")
                if t is not None:
                    ict = int(t)
            elif "metaData" in action:
                if not _cdf_enabled(action["metaData"]):
                    raise ValueError(
                        f"change data feed was not enabled at version {v}; "
                        "the requested range cannot be served"
                    )
            elif "add" in action and action["add"].get("dataChange"):
                adds[action["add"]["path"]] = action["add"]
            elif "remove" in action and action["remove"].get("dataChange"):
                removes[action["remove"]["path"]] = action["remove"]
            elif "cdc" in action:
                cdcs.append(action["cdc"])
        ts = ict if ict is not None else entry.last_modified_ms

        def event(kind, src, dv_old=None, dv_new=None, _v=v, _ts=ts):
            return {
                "kind": kind,
                "path": src["path"],
                "size": int(src.get("size") or 0),
                "partition_values": list((src.get("partitionValues") or {}).items()),
                "dv_old": dv_old,
                "dv_new": dv_new,
                "version": _v,
                "ts_ms": _ts,
            }

        if cdcs:  # cdc supersedes add/remove for its commit
            rows.extend(event("cdc", c) for c in cdcs)
            continue
        for p, a in adds.items():
            if p in removes:
                rows.append(
                    event(
                        "swap",
                        a,
                        dv_old=removes[p].get("deletionVector"),
                        dv_new=a.get("deletionVector"),
                    )
                )
            else:
                rows.append(event("insert", a, dv_new=a.get("deletionVector")))
        rows.extend(
            event("delete", r, dv_old=r.get("deletionVector"))
            for p, r in removes.items()
            if p not in adds
        )
    return pa.Table.from_pylist(rows, schema=_cdf_event_schema())


class _CdfEventReadMixin:
    """Executor-side read of a CDF event slice — shared by the batch CDF
    reader and the streaming change-feed source. Requires attributes
    ``_path``, ``_table_schema``, ``_pcols``, ``_out_fields``. DV bitmaps
    decode on EXECUTORS (the driver ships descriptors, never row
    indexes)."""

    def _read_cdf_events(self, partition: "_FileSliceTask") -> Iterator[Any]:
        import urllib.parse

        import pyarrow as pa
        import pyarrow.compute as pc

        from delta_kernel_rs_spark.functions.dv import read_dv_row_indexes

        events = ipc_deserialize(partition.ipc)
        if events.num_rows == 0:
            return
        storage = storage_for_uri(self._path)
        pset = set(self._pcols)
        data_fields = [f for f in self._out_fields if f.name not in pset]

        def dv_rows(dv: dict | None) -> set[int]:
            if not dv or not dv.get("storageType"):
                return set()
            return set(read_dv_row_indexes(storage, self._path, dv))

        for i in range(events.num_rows):
            kind = events.column("kind")[i].as_py()
            rel = urllib.parse.unquote(events.column("path")[i].as_py())
            abs_path = (
                rel if "://" in rel or rel.startswith("/") else f"{self._path}/{rel}"
            )
            pv = dict(events.column("partition_values")[i].as_py() or [])
            version = events.column("version")[i].as_py()
            ts_ms = events.column("ts_ms")[i].as_py()
            avail = pq_read_schema_names(abs_path)
            phys_cols = [
                physical_name(f) for f in data_fields if physical_name(f) in avail
            ]

            if kind == "cdc":
                # cdc parquet physically carries _change_type (never
                # column-mapped — an internal column, like the reference's
                # physical_to_logical.rs injection)
                cols = phys_cols + (
                    ["_change_type"] if "_change_type" in avail else []
                )
                table = pq_read(abs_path, columns=cols)
                ct = (
                    table.column("_change_type").cast(pa.string())
                    if "_change_type" in table.column_names
                    else pa.nulls(table.num_rows, type=pa.string())
                )
                yield self._cdf_batch(table, pv, ct, version, ts_ms)
            elif kind == "swap":
                old_set = dv_rows(events.column("dv_old")[i].as_py())
                new_set = dv_rows(events.column("dv_new")[i].as_py())
                newly_deleted = sorted(new_set - old_set)
                restored = sorted(old_set - new_set)
                if not newly_deleted and not restored:
                    continue
                table = pq_read(abs_path, columns=phys_cols)
                idx = pa.array(newly_deleted + restored, type=pa.int64())
                picked = table.take(idx)
                ct = pa.array(
                    ["delete"] * len(newly_deleted) + ["insert"] * len(restored),
                    type=pa.string(),
                )
                yield self._cdf_batch(picked, pv, ct, version, ts_ms)
            else:  # insert / delete: whole file minus its DV-hidden rows
                hidden = dv_rows(
                    events.column("dv_new" if kind == "insert" else "dv_old")[
                        i
                    ].as_py()
                )
                table = pq_read(abs_path, columns=phys_cols)
                if hidden:
                    indices = pa.array(range(table.num_rows), type=pa.int64())
                    keep = pc.invert(
                        pc.is_in(
                            indices,
                            value_set=pa.array(sorted(hidden), type=pa.int64()),
                        )
                    )
                    table = table.filter(keep)
                ct = pa.array([kind] * table.num_rows, type=pa.string())
                yield self._cdf_batch(table, pv, ct, version, ts_ms)

    def _cdf_batch(self, table, pv: dict, ct, version: int, ts_ms: int):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        from delta_kernel_rs_spark.streaming.cdf_source import _parse_pv_py

        n = table.num_rows
        pset = set(self._pcols)
        arrays, names = [], []
        for f in self._out_fields:
            at = to_arrow_type(f.dataType)
            if f.name in pset:
                raw = pv.get(physical_name(f), pv.get(f.name))
                arrays.append(pa.array([_parse_pv_py(raw, f.dataType)] * n, type=at))
            else:
                pn = physical_name(f)
                if pn in table.column_names:
                    arrays.append(table.column(pn).cast(at))
                else:
                    arrays.append(pa.nulls(n, type=at))
            names.append(f.name)
        arrays.append(ct)
        names.append("_change_type")
        arrays.append(pa.array([version] * n, type=pa.int64()))
        names.append("_commit_version")
        ts_type = to_arrow_type(T.TimestampType())
        arrays.append(
            pa.array([ts_ms * 1000] * n, type=pa.int64()).cast(ts_type)
        )
        names.append("_commit_timestamp")
        return pa.RecordBatch.from_arrays(
            [
                a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in arrays
            ],
            names,
        )


class DeltaKernelCDFReader(_CdfEventReadMixin, DataSourceReader):
    def __init__(self, options: dict):
        opts = _opts(options)
        self._path = opts["path"].rstrip("/")
        self._target_bytes = int(opts.get("targetbytes", DEFAULT_TARGET_BYTES))
        # options the CDF path does not implement must fail fast, never
        # silently no-op (a predicate that doesn't filter is a wrong answer)
        if opts.get("predicate"):
            raise ValueError(
                "predicate is not supported with readChangeFeed; "
                ".filter() the returned DataFrame instead"
            )
        if opts.get("versionasof") is not None or opts.get("timestampasof") is not None:
            raise ValueError(
                "versionAsOf/timestampAsOf don't apply to readChangeFeed; "
                "use startingVersion/endingVersion (or the Timestamp forms)"
            )
        storage = storage_for_uri(self._path)
        self._start, self._end = _resolve_cdf_range(storage, self._path, opts)
        end_seg = build_log_segment(storage, self._path, self._end)
        meta, proto = snapshot_metadata(storage, end_seg)
        protocol_of(proto).ensure_read_supported(supported=_PYARROW_READER_FEATURES)
        if not _cdf_enabled(meta):
            raise ValueError(
                "change data feed is not enabled (delta.enableChangeDataFeed)"
            )
        self._table_schema = parse_schema_string(meta["schemaString"])
        # CDF must have been on for the WHOLE range: commits written while
        # it was off carry no metaData at all, so the in-range metaData
        # gate alone cannot catch them — also check AS OF start. The same
        # start snapshot drives the reference's range-boundary schema rule
        # (table_changes/mod.rs:378-385, CdfMode::ChangeDataFeed requires
        # start schema == end schema): a range spanning an incompatible
        # schema change must ERROR, never silently null-fill old files
        # under the end-version schema.
        if self._start < end_seg.version:
            start_seg = build_log_segment(storage, self._path, self._start)
            start_meta, _ = snapshot_metadata(storage, start_seg)
            if not _cdf_enabled(start_meta):
                raise ValueError(
                    f"change data feed was not enabled at version "
                    f"{self._start}; the requested range cannot be served"
                )
            if parse_schema_string(start_meta["schemaString"]) != self._table_schema:
                raise ValueError(
                    f"change data feed range [{self._start}, {self._end}] "
                    "spans a schema change: the start and end version "
                    "schemas are different — split the read at the schema "
                    "change"
                )
        self._pcols = list(meta.get("partitionColumns") or [])
        self._out_fields = _select_fields(self._table_schema, opts.get("columns"))

    # -- planning (driver-side worker) -----------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        storage = storage_for_uri(self._path)
        events = _plan_cdf_events(storage, self._path, self._start, self._end)
        slices = bin_pack_by_size(events, self._target_bytes)
        if not slices:
            return [_FileSliceTask(ipc_serialize(events))]  # empty range
        return [_FileSliceTask(ipc_serialize(s)) for s in slices]

    # -- execution (workers) ----------------------------------------------
    def read(self, partition: _FileSliceTask) -> Iterator[Any]:
        return self._read_cdf_events(partition)


class DeltaKernelStreamReader(_FileSliceReadMixin, DataSourceStreamReader):
    """Structured Streaming source over table APPENDS:
    ``spark.readStream.format("delta_kernel")``.

    Offsets are commit versions; each micro-batch emits the rows of files
    added (dataChange) in ``[start, end)`` — the streaming twin of the
    incremental scan (sources/incremental.py; reference
    kernel/src/incremental_scan/mod.rs), packaged as a Spark source.

    Delta-streaming semantics for non-append commits: a commit that
    removes data files fails the stream unless ``ignoreDeletes`` (plain
    deletes are dropped) or ``ignoreChanges`` (rewritten files are
    re-emitted in full — consumers must dedup) is set. dataChange=false
    rewrites (OPTIMIZE, DV purge) are always invisible.

    Options: ``path`` (required), ``startingVersion`` (int or ``latest``,
    default 0), ``startingTimestamp`` (epoch ms or ISO datetime — first
    commit at/after it, ICT-aware), ``predicate`` (SQL string, same
    semantics as the batch facade), ``columns``, ``ignoreDeletes``,
    ``ignoreChanges``, ``targetBytes``, ``maxFilesPerTrigger`` /
    ``maxBytesPerTrigger`` (admission control: each micro-batch admits
    add-files until either cap is reached, slicing INSIDE a commit when
    needed — offsets carry (version, index) like Delta's source offset,
    so a half-consumed commit resumes at its next file. At least one
    file is always admitted so the stream progresses. The Python source
    API never hands the source its restart offset before the first
    ``latestOffset`` call, so the reader keeps a Spark-authoritative
    consumed floor — raised by ``partitions`` starts and ``commit``
    ends — and always slices above it: a restart costs at most one
    empty micro-batch while the floor re-syncs from the offset log,
    and already-emitted files can never be re-read even if the offset
    log briefly rewinds).

    TRIGGER CAVEAT: under ``Trigger.AvailableNow`` Spark captures ONE
    ``latestOffset()`` and stops there (the Python DataSourceStreamReader
    API has no SupportsTriggerAvailableNow hook), so a RATE-LIMITED
    stream processes exactly one bounded batch per run — the checkpoint
    advances and the next run continues, but one run is not a full
    backfill. Rate limits pace ``processingTime`` triggers, where
    ``latestOffset`` is called per trigger. Same caveat and pin as the
    CDF source (streaming/cdf_source.py).
    """

    def __init__(self, schema: T.StructType, options: dict):
        opts = _opts(options)
        self._path = opts["path"].rstrip("/")
        self._target_bytes = int(opts.get("targetbytes", DEFAULT_TARGET_BYTES))
        self._ignore_deletes = str(opts.get("ignoredeletes", "false")).lower() == "true"
        self._ignore_changes = str(opts.get("ignorechanges", "false")).lower() == "true"
        mf = opts.get("maxfilespertrigger")
        mb = opts.get("maxbytespertrigger")
        self._max_files = int(mf) if mf is not None else None
        self._max_bytes = int(mb) if mb is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("maxFilesPerTrigger must be >= 1")
        if self._max_bytes is not None and self._max_bytes < 1:
            raise ValueError("maxBytesPerTrigger must be >= 1")
        if self._max_files is not None or self._max_bytes is not None:
            _warn_rate_limit_under_available_now(
                "maxFilesPerTrigger/maxBytesPerTrigger"
            )
        #: per-version add-file cache so admission + planning read each
        #: commit JSON once; evicted below the committed offset.
        self._adds_cache: dict[int, list[dict]] = {}
        storage = storage_for_uri(self._path)
        seg = build_log_segment(storage, self._path)
        meta, proto = snapshot_metadata(storage, seg)
        protocol_of(proto).ensure_read_supported(supported=_PYARROW_READER_FEATURES)
        self._table_schema = parse_schema_string(meta["schemaString"])
        self._pcols = list(meta.get("partitionColumns") or [])
        # optional row filter, evaluated exactly like the batch facade's
        # (partition 3VL short-circuit + per-file pyarrow residual)
        self._predicate = _parse_predicate_opt(
            opts.get("predicate"), self._table_schema
        )
        # schema() applies the columns option, so the emitted batches must too
        self._out_fields = _select_fields(self._table_schema, opts.get("columns"))
        sv = opts.get("startingversion")
        st = opts.get("startingtimestamp")
        if sv is not None and st is not None:
            raise ValueError("set startingVersion or startingTimestamp, not both")
        if st is not None:
            from delta_kernel_rs_spark.sources.history import (
                first_version_after_for_storage,
            )

            self._start = first_version_after_for_storage(
                storage, self._path, _parse_ts_ms(st)
            )
        elif sv is None:
            self._start = 0
        elif str(sv).lower() == "latest":
            self._start = seg.version + 1
        else:
            self._start = int(sv)
        #: ``startingVersion=latest`` re-resolves to the CURRENT tip every
        #: construction, so after a restart self._start may sit ABOVE the
        #: query's checkpointed position — seeding the cursor/floor from
        #: it would silently skip every commit that arrived while the
        #: query was down. Such moving starts keep a None (unknown) seed:
        #: rate limits engage only once partitions()/commit() teach the
        #: floor from Spark's authoritative offsets (for a FRESH
        #: latest-query the first batch is empty anyway — it starts at
        #: the tip). Fixed starts (default 0, explicit version, resolved
        #: timestamp) are restart-stable and seed directly, so limits
        #: bound even the very first backlog batch.
        fixed_start = not (sv is not None and str(sv).lower() == "latest")
        #: admission cursor: everything below it has been handed out in a
        #: latestOffset() result. Seeded at construction — Spark may call
        #: latestOffset() before initialOffset() (separate planning and
        #: execution runner processes).
        self._cursor: tuple[int, int] | None = (
            (self._start, 0) if fixed_start else None
        )
        #: Spark-authoritative consumed floor: raised by partitions()
        #: starts and commit() ends. partitions() slices from it so a
        #: rewound offset log can never re-emit rows, and it can only
        #: ever RISE to offsets Spark itself reported.
        self._hwm: tuple[int, int] | None = (
            (self._start, 0) if fixed_start else None
        )

    # -- offsets ---------------------------------------------------------
    @staticmethod
    def _okey(off: dict) -> tuple[int, int]:
        return (off["version"], off.get("index", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start, "index": 0}

    def _commit_adds(self, storage, v: int) -> list[dict]:
        """dataChange add actions of commit ``v`` (cached), after the
        Delta-streaming validation of remove/rewrite commits."""
        cached = self._adds_cache.get(v)
        if cached is not None:
            return cached
        from delta_kernel_rs_spark.sources.pyreplay import _iter_actions

        cpath = f"{self._path}/_delta_log/{v:020d}.json"
        commit_adds: list[dict] = []
        removed: set[str] = set()
        for action in _iter_actions(storage, cpath):
            if "add" in action and action["add"].get("dataChange"):
                commit_adds.append(action["add"])
            elif "remove" in action and action["remove"].get("dataChange"):
                removed.add(action["remove"]["path"])
        if removed and not (self._ignore_deletes or self._ignore_changes):
            raise ValueError(
                f"commit {v} of {self._path} removes data files; this "
                "source streams appends only — set ignoreDeletes to "
                "drop deletes, or ignoreChanges to re-emit rewritten "
                "files"
            )
        if removed and self._ignore_deletes and not self._ignore_changes:
            # a commit with BOTH removes and adds is a rewrite
            # (COW delete/update/merge), not a plain delete — same
            # distinction Delta's streaming source draws
            if commit_adds:
                raise ValueError(
                    f"commit {v} rewrites files (update/merge/COW "
                    "delete); ignoreDeletes covers remove-only commits "
                    "— set ignoreChanges to re-emit rewritten files"
                )
        self._adds_cache[v] = commit_adds
        return commit_adds

    def _tip(self, storage) -> int:
        entries = storage.list_dir(f"{self._path}/_delta_log")
        versions = [
            int(e.path[-25:-5])
            for e in entries
            if e.path.endswith(".json") and e.path[-25:-5].isdigit()
        ]
        return (max(versions) + 1) if versions else self._start

    def latestOffset(self) -> dict:
        storage = storage_for_uri(self._path)
        tip = self._tip(storage)
        known = [p for p in (self._cursor, self._hwm) if p is not None]
        if not known or (self._max_files is None and self._max_bytes is None):
            # unlimited — or a moving-start restart whose true position
            # only Spark's offset log knows: read to the tip (partitions()
            # will slice from Spark's authoritative start)
            base = max(known) if known else (tip, 0)
            self._cursor = max(base, (tip, 0))
            return {"version": self._cursor[0], "index": self._cursor[1]}
        base = max(known)

        v, idx = base
        n_files = 0
        n_bytes = 0
        while v < tip:
            adds = self._commit_adds(storage, v)
            while idx < len(adds):
                size = int(adds[idx].get("size") or 0)
                over_files = (
                    self._max_files is not None and n_files + 1 > self._max_files
                )
                over_bytes = (
                    self._max_bytes is not None and n_bytes + size > self._max_bytes
                )
                if n_files > 0 and (over_files or over_bytes):
                    self._cursor = (v, idx)
                    return {"version": v, "index": idx}
                n_files += 1
                n_bytes += size
                idx += 1
            v, idx = v + 1, 0
        self._cursor = max(base, (tip, 0))
        return {"version": self._cursor[0], "index": self._cursor[1]}

    def commit(self, end: dict) -> None:
        # a committed batch is consumed for sure: raise the floor
        e = self._okey(end)
        self._hwm = e if self._hwm is None else max(self._hwm, e)
        for v in [k for k in self._adds_cache if k < self._hwm[0]]:
            del self._adds_cache[v]

    # -- planning --------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from delta_kernel_rs_spark.sources.pyreplay import _adds_from_pylist

        storage = storage_for_uri(self._path)
        # Spark's batch start is authoritative consumed state (offset log
        # / checkpoint). Slice from max(start, floor) so that even if an
        # out-of-sync limited latestOffset briefly rewound the offset log
        # below the checkpoint, already-emitted files are never re-read.
        s = self._okey(start)
        sv, si = s if self._hwm is None else max(s, self._hwm)
        self._hwm = (sv, si)
        ev, ei = self._okey(end)
        self._cursor = (
            (ev, ei) if self._cursor is None else max(self._cursor, (ev, ei))
        )
        adds: list[dict] = []
        for v in range(sv, ev + 1):
            # the end offset is exclusive: version ev is read only up to
            # index ei, so (ev, 0) reads nothing from ev at all
            commit_adds = (
                self._commit_adds(storage, v) if (v < ev or ei > 0) else []
            )
            lo = si if v == sv else 0
            hi = ei if v == ev else len(commit_adds)
            adds.extend(commit_adds[lo:hi])
        files = _adds_from_pylist(adds).drop_columns(["stats"])
        slices = bin_pack_by_size(files, self._target_bytes)
        if not slices:
            return [_FileSliceTask(ipc_serialize(files))]  # empty batch
        return [_FileSliceTask(ipc_serialize(s)) for s in slices]

    # -- execution (workers) ---------------------------------------------
    def read(self, partition: _FileSliceTask) -> Iterator[Any]:
        return self._read_slice(partition)


def pq_read_schema_names(path: str) -> list[str]:
    import pyarrow.parquet as pq

    if "://" in path and not path.startswith("file://"):
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        return pq.read_schema(rel, filesystem=fs).names
    return pq.read_schema(path.removeprefix("file://")).names


# ---------------------------------------------------------------------------
# Write support: df.write.format("delta_kernel") and writeStream sink.
#
# Executors write parquet files directly (Arrow batches in, one file per
# (task, partition-value) out, footer-contract stats computed in-memory);
# the driver-side commit()/abort() hooks run with NO SparkSession, so the
# commit goes through sources/pycommit.py — blind-append actions with a
# per-micro-batch txn action for exactly-once streaming replay
# (reference kernel/src/transaction/mod.rs commit shape).


@dataclass
class _WriteResult(WriterCommitMessage):
    """Per-task commit message: fully-built add actions."""

    adds: list  # list[dict]


#: Input types the sink accepts per table type beyond exact equality —
#: lossless widening only (the Arrow cast at write time cannot lose values).
_WIDEN_OK = frozenset(
    {
        ("tinyint", "smallint"),
        ("tinyint", "int"),
        ("tinyint", "bigint"),
        ("smallint", "int"),
        ("smallint", "bigint"),
        ("int", "bigint"),
        ("float", "double"),
    }
)


class _DeltaKernelWriterBase:
    """Shared driver-side validation + executor-side write.

    The sink refuses tables whose protocol demands enforcement it cannot
    provide (reference: the kernel fails writes on unknown writerFeatures
    rather than landing unenforced data — table_features gating), and
    enforces everything it *can* SparkSession-free: NOT NULL invariants via
    Arrow null counts, CHECK constraints / column invariants /
    generated-column verification compiled through the typed predicate AST
    to pyarrow expressions, evaluated per task before any file is written.
    Identity columns and row tracking need driver-side state handshakes
    (HWM / baseRowId), so those tables are rejected up front with a pointer
    to DeltaTable.append."""

    @staticmethod
    def _sink_writer_features() -> frozenset:
        from delta_kernel_rs_spark.sources.snapshot import Protocol

        return Protocol.SUPPORTED_WRITER_FEATURES - {
            "identityColumns",
            "rowTracking",
            # the sink writes data files itself and does not materialize
            # partition values into them, nor shred variants
            "materializePartitionColumns",
            "variantShredding",
            "variantShredding-preview",
        }

    def __init__(self, schema: T.StructType, options: dict):
        opts = _opts(options)
        self._path = opts["path"].rstrip("/")
        storage = storage_for_uri(self._path)
        seg = build_log_segment(storage, self._path)
        meta, proto = snapshot_metadata(storage, seg)
        protocol_of(proto).ensure_write_supported(self._sink_writer_features())
        self._table_schema = parse_schema_string(meta["schemaString"])
        self._pcols = list(meta.get("partitionColumns") or [])
        config = meta.get("configuration") or {}
        self._config = config
        if config.get("delta.enableRowTracking", "false").lower() == "true":
            # legacy-config tables may enable this without a feature list
            raise ValueError(
                "delta_kernel sink cannot write row-tracking tables "
                "(baseRowId assignment) — use DeltaTable.append"
            )
        for f in self._table_schema.fields:
            fm = f.metadata or {}
            if "delta.identity.start" in fm or "delta.identity.step" in fm:
                raise ValueError(
                    f"identity column {f.name}: the sink cannot advance the "
                    "high-water mark — use DeltaTable.append"
                )

        table_names = [f.name for f in self._table_schema.fields]
        if sorted(schema.fieldNames()) != sorted(table_names):
            raise ValueError(
                f"stream/write schema {schema.fieldNames()} does not match "
                f"table columns {table_names}"
            )
        by_name = {f.name: f for f in self._table_schema.fields}
        for f_in in schema.fields:
            got = f_in.dataType.simpleString()
            want = by_name[f_in.name].dataType.simpleString()
            if got != want and (got, want) not in _WIDEN_OK:
                raise ValueError(
                    f"column {f_in.name}: write type {got} does not match "
                    f"table type {want} (only lossless widening is implicit)"
                )

        # Compile every write-side check now; an unenforceable table must
        # fail at the driver, not land unchecked data from executors.
        from delta_kernel_rs_spark.plans.py_predicate import (
            UnsupportedPredicate,
            coerce_literals,
            to_arrow_expr,
        )
        from delta_kernel_rs_spark.plans.sql_parser import try_parse_sql_predicate
        from delta_kernel_rs_spark.sources.transaction import constraint_predicates

        self._not_null = [f.name for f in self._table_schema.fields if not f.nullable]
        self._checks: list[tuple[str, str, object]] = []
        for name, sql in constraint_predicates(config, self._table_schema):
            if name.startswith("notnull("):
                continue  # Arrow null_count is the cheaper exact check
            ast = try_parse_sql_predicate(sql, self._table_schema)
            if ast is not None:
                ast = coerce_literals(ast, self._table_schema)
                try:
                    to_arrow_expr(ast, {}, self._table_schema)
                except UnsupportedPredicate:
                    ast = None
            if ast is None:
                raise ValueError(
                    f"table constraint {name} ({sql!r}) is outside the "
                    "sink's enforceable grammar — use DeltaTable.append, "
                    "which verifies it with Spark expressions"
                )
            self._checks.append((name, sql, ast))

    def _enforce(self, tbl) -> None:
        """Per-task write-side verification (same semantics as the Spark
        Transaction's constraint scan: a NULL verdict violates)."""
        for fname in self._not_null:
            nulls = tbl.column(fname).null_count
            if nulls:
                raise ValueError(
                    f"NOT NULL violation: column {fname} has {nulls} null row(s)"
                )
        if self._checks:
            from delta_kernel_rs_spark.plans.py_predicate import to_arrow_expr

            for name, sql, ast in self._checks:
                ok = tbl.filter(
                    to_arrow_expr(ast, {}, self._table_schema)
                ).num_rows
                if ok != tbl.num_rows:
                    raise ValueError(
                        f"constraint {name} violated by {tbl.num_rows - ok} "
                        f"row(s): {sql}"
                    )

    # -- executor side ---------------------------------------------------
    def write(self, iterator):
        """One parquet file per (task, partition value); Arrow end-to-end."""
        import urllib.parse
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        from delta_kernel_rs_spark.functions.partition_codec import (
            serialize_partition_value,
        )
        from delta_kernel_rs_spark.functions.stats import (
            eligible_stats_columns,
            stats_json,
            stats_selection,
        )
        from delta_kernel_rs_spark.sources.table_properties import TableProperties

        fields = self._table_schema.fields
        pset = set(self._pcols)
        data_fields = [f for f in fields if f.name not in pset]
        part_fields = [f for f in fields if f.name in pset]
        phys_schema = T.StructType(
            [T.StructField(physical_name(f), f.dataType, True, f.metadata) for f in data_fields]
        )
        arrow_schema = pa.schema(
            [pa.field(physical_name(f), to_arrow_type(f.dataType)) for f in data_fields]
        )

        batches = list(iterator)
        if not batches:
            return _WriteResult(adds=[])
        tbl = pa.Table.from_batches(batches)
        self._enforce(tbl)
        # logical -> physical projection in table-schema order
        data = pa.table(
            {
                physical_name(f): tbl.column(f.name).cast(
                    to_arrow_type(f.dataType)
                )
                for f in data_fields
            }
        ).cast(arrow_schema)

        groups: list[tuple[dict, pa.Table]] = []
        if part_fields:
            keys = None
            for f in part_fields:
                part = pc.cast(tbl.column(f.name), pa.string())
                part = pc.coalesce(part, pa.scalar("\x01NULL\x01", pa.string()))
                keys = part if keys is None else pc.binary_join_element_wise(
                    keys, part, "\x02"
                )
            uniq = pc.unique(keys)
            for k in uniq:
                mask = pc.equal(keys, k)
                sub = data.filter(mask)
                row = {
                    f.name: tbl.column(f.name).filter(mask)[0].as_py()
                    for f in part_fields
                }
                pv = {
                    physical_name(f): serialize_partition_value(row[f.name], f.dataType)
                    for f in part_fields
                }
                groups.append((pv, sub))
        else:
            groups.append(({}, data))

        storage = storage_for_uri(self._path)
        adds = []
        for pv, sub in groups:
            if sub.num_rows == 0:
                continue
            dirpart = "/".join(
                f"{k}={'__HIVE_DEFAULT_PARTITION__' if v is None else urllib.parse.quote(v, safe='')}"
                for k, v in pv.items()
            )
            rel = (dirpart + "/" if dirpart else "") + f"part-{_uuid.uuid4().hex}.parquet"
            abs_path = f"{self._path}/{rel}"
            _write_parquet_any(
                sub,
                abs_path,
                compression=TableProperties.from_configuration(
                    self._config
                ).parquet_compression_codec,
            )
            size = storage.stat(abs_path).size
            raw = {"numRecords": sub.num_rows, "min": {}, "max": {}, "nullCount": {}}
            for f in eligible_stats_columns(
                phys_schema,
                **stats_selection(
                    self._config, {f.name: physical_name(f) for f in data_fields}
                ),
            ):
                col = sub.column(f.name)
                raw["nullCount"][f.name] = col.null_count
                if sub.num_rows > col.null_count:
                    mm = pc.min_max(col)
                    raw["min"][f.name] = mm["min"].as_py()
                    raw["max"][f.name] = mm["max"].as_py()
            adds.append(
                {
                    "add": {
                        "path": "/".join(
                            urllib.parse.quote(seg_) for seg_ in rel.split("/")
                        ),
                        "partitionValues": pv,
                        "size": size,
                        "modificationTime": storage.stat(abs_path).last_modified_ms,
                        "dataChange": True,
                        "stats": stats_json(raw, phys_schema),
                    }
                }
            )
        return _WriteResult(adds=adds)

    # -- driver side (no SparkSession) -----------------------------------
    def _collect_adds(self, messages) -> list[dict]:
        adds: list[dict] = []
        for m in messages:
            if m is not None:
                adds.extend(m.adds)
        return adds

    def _abort_files(self, messages) -> None:
        storage = storage_for_uri(self._path)
        import urllib.parse

        for a in self._collect_adds(messages):
            try:
                storage.delete(f"{self._path}/{urllib.parse.unquote(a['add']['path'])}")
            except OSError:
                pass


class DeltaKernelStreamWriter(_DeltaKernelWriterBase, DataSourceStreamArrowWriter):
    """Micro-batch sink: each epoch commits once; replays are deduped via a
    ``txn`` action keyed by (queryId-or-option, batchId)."""

    def __init__(self, schema: T.StructType, options: dict):
        super().__init__(schema, options)
        opts = _opts(options)
        # exactly-once across restarts: prefer an explicit txnAppId, else
        # derive a stable id from the checkpoint location
        app = opts.get("txnappid")
        if not app:
            ckpt = opts.get("checkpointlocation")
            app = f"delta-kernel-sink-{ckpt}" if ckpt else f"delta-kernel-sink-{uuid4_hex()}"
        self._app_id = app

    def commit(self, messages, batchId: int) -> None:
        from delta_kernel_rs_spark.sources.pycommit import commit_append

        commit_append(
            storage_for_uri(self._path),
            self._path,
            self._collect_adds(messages),
            operation="STREAMING UPDATE",
            app_id=self._app_id,
            txn_version=batchId,
        )

    def abort(self, messages, batchId: int) -> None:
        self._abort_files(messages)


class DeltaKernelBatchWriter(_DeltaKernelWriterBase, DataSourceArrowWriter):
    """df.write.format("delta_kernel").mode("append") — append-only."""

    def commit(self, messages) -> None:
        from delta_kernel_rs_spark.sources.pycommit import commit_append

        commit_append(
            storage_for_uri(self._path),
            self._path,
            self._collect_adds(messages),
            operation="WRITE",
        )

    def abort(self, messages) -> None:
        self._abort_files(messages)


def uuid4_hex() -> str:
    import uuid as _uuid

    return _uuid.uuid4().hex


def _write_parquet_any(tbl, path: str, compression: str | None = None) -> None:
    """pyarrow parquet write for plain paths and URIs, creating parents.
    ``compression`` is the canonical delta.parquet.compression.codec value
    (pyarrow spells uncompressed ``none`` and the LZ4 block format
    ``lz4``); ``None`` keeps pyarrow's default (snappy)."""
    import pyarrow.parquet as pq

    kw = {}
    if compression is not None:
        kw["compression"] = {"uncompressed": "none", "lz4_raw": "lz4"}.get(
            compression, compression
        )
    if "://" in path and not path.startswith("file://"):
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        parent = rel.rsplit("/", 1)[0]
        fs.create_dir(parent, recursive=True)
        pq.write_table(tbl, rel, filesystem=fs, **kw)
        return
    import os

    local = path.removeprefix("file://")
    os.makedirs(os.path.dirname(local), exist_ok=True)
    pq.write_table(tbl, local, **kw)
