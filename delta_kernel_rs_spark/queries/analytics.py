"""Relational-operator coverage queries over the synthetic tables.

Each query exercises one node of the reference's declarative plan IR
(reference: kernel/src/plans/ir/nodes.rs:29-46 — ScanParquet, ScanJson,
Values, Project, Filter, Load, Aggregate, SemiJoin, UnionAll) or one of the
expression ops (reference: kernel/src/expressions/mod.rs:464-559), expressed
Spark-first so Catalyst gets full pushdown/pruning/codegen freedom.

Determinism contract with the DuckDB oracle: double aggregations are
computed on exact integer-scaled values (``ROUND(x*scale) -> BIGINT`` sums,
then one float division), so results are bit-identical regardless of
partitioning / summation order. Raw double columns pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_kernel_rs_spark.queries import register
from delta_kernel_rs_spark.queries.tables import load_table


def _money_sum(expr: Column, scale: int) -> Column:
    """Order-independent exact sum of a fixed-point double expression."""
    cents = F.round(expr * F.lit(float(scale)), 0).cast("long")
    return (F.sum(cents) / F.lit(float(scale))).cast("double")


def _money_sum_sql(expr_sql: str, scale: int) -> str:
    return (
        f"CAST(SUM(CAST(ROUND(({expr_sql}) * {scale}.0, 0) AS BIGINT))"
        f" / {scale}.0 AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# q01 — Aggregate + Filter + Project (TPC-H Q1 shape).
# Reference parity: Aggregate node (plans/ir/nodes.rs:474-571), Filter
# (:323-328), Project (:281-321) over ScanParquet (:100-185).
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money_sum(F.col("l_quantity"), 100).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
            _money_sum(disc_price, 10000).alias("sum_disc_price"),
            _money_sum(charge, 1000000).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


register(
    "q01_pricing_summary",
    q01_pricing_summary,
    f"""
    SELECT l_returnflag, l_linestatus,
           {_money_sum_sql('l_quantity', 100)} AS sum_qty,
           {_money_sum_sql('l_extendedprice', 100)} AS sum_base_price,
           {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 10000)} AS sum_disc_price,
           {_money_sum_sql('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 1000000)} AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# q02 — newest-wins dedup, the kernel's flagship log-replay aggregate:
# max_by(action, version) GROUP BY file_key (reference:
# kernel/src/plans/mod.rs:16-25, Agg::MaxNonNullBy at
# plans/ir/nodes.rs:639-672). Here: latest event per user by event_id.
# ---------------------------------------------------------------------------
def q02_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user temporal queries, three arms:
    latest — max_by aggregation (the original q02)
    asof   — AS-OF JOIN: each click/view attributed to the user's latest
             purchase at-or-before its timestamp (operators/temporal.py
             union-tag rewrite: one window shuffle, no join, no per-key
             blowup; oracle = DuckDB's native ASOF LEFT JOIN)
    range  — RANGE JOIN: per purchase, clicks in the preceding hour
             (band-bucketed equi-join, never a per-key cross product)."""
    from delta_kernel_rs_spark.operators.temporal import asof_join, range_join

    ev = load_table(spark, sf_dir, "events")
    nl = F.lit(None).cast("long")
    latest = ev.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("etype"),
        F.max_by("value", "event_id").alias("val"),
        F.max("event_id").alias("eid"),
    ).select(
        F.lit("latest").alias("arm"), "user_id", "etype", "val", "eid",
        nl.alias("eid2"), nl.alias("usec"),
    )

    probe = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    # one build row per (user, ts): ties pre-deduped so the match is
    # well-defined in every engine
    build = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("pid"))
    )
    asof = asof_join(probe, build, ["user_id"], "ts", ["pid"]).select(
        F.lit("asof").alias("arm"),
        "user_id",
        F.col("event_type").alias("etype"),
        F.col("value").alias("val"),
        F.col("event_id").alias("eid"),
        F.col("pid_asof").alias("eid2"),
        (F.unix_micros("ts") - F.unix_micros("asof_time")).alias("usec"),
    )

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("c_eid")
    )
    paired = range_join(
        purchases, clicks, ["user_id"], "ts", "ts", 3_600_000_000
    )
    rng = paired.groupBy("user_id", "event_id", "value").agg(
        F.count(F.lit(1)).alias("n_clicks")
    ).select(
        F.lit("range").alias("arm"), "user_id",
        F.lit("purchase").alias("etype"), F.col("value").alias("val"),
        F.col("event_id").alias("eid"), F.col("n_clicks").alias("eid2"),
        nl.alias("usec"),
    )
    return latest.unionByName(asof).unionByName(rng)


register(
    "q02_latest_event_per_user",
    q02_latest_event_per_user,
    """
    SELECT 'latest' AS arm, user_id,
           max_by(event_type, event_id) AS etype,
           max_by(value, event_id) AS val,
           MAX(event_id) AS eid,
           CAST(NULL AS BIGINT) AS eid2,
           CAST(NULL AS BIGINT) AS usec
    FROM events GROUP BY user_id
    UNION ALL
    SELECT 'asof', p.user_id, p.event_type, p.value, p.event_id, b.pid,
           epoch_us(p.ts) - epoch_us(b.ts)
    FROM (SELECT * FROM events WHERE event_type IN ('click', 'view')) p
    ASOF LEFT JOIN (
      SELECT user_id, ts, MAX(event_id) AS pid
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) b
    ON p.user_id = b.user_id AND p.ts >= b.ts
    UNION ALL
    SELECT 'range', p.user_id, 'purchase', p.value, p.event_id,
           COUNT(*), CAST(NULL AS BIGINT)
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
     AND epoch_us(c.ts) < epoch_us(p.ts)
    GROUP BY p.user_id, p.event_id, p.value
    """,
)


# ---------------------------------------------------------------------------
# q03 — SemiJoin, both polarities (reference plans/ir/nodes.rs:790-829;
# inverted=true is the checkpoint-arm anti join of the metadata scan,
# kernel/src/scan/scan_plan.rs:49-80). One query, two arms with a common
# schema so both join types sit inside the driver's correctness gate:
#   semi — orders having at least one heavy lineitem
#   anti — customers with no 'F'-status orders
# ---------------------------------------------------------------------------
def q03_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    semi = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select(
            F.lit("semi").alias("arm"),
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("s1"),
            F.lit(None).cast("string").alias("s2"),
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    anti = (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti")
        .select(
            F.lit("anti").alias("arm"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("s1"),
            F.col("c_mktsegment").alias("s2"),
        )
    )
    return semi.unionByName(anti)


register(
    "q03_semi_anti_join",
    q03_semi_anti_join,
    """
    SELECT 'semi' AS arm, o_orderkey AS key, o_orderstatus AS s1,
           CAST(NULL AS VARCHAR) AS s2
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    UNION ALL
    SELECT 'anti', c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)


# ---------------------------------------------------------------------------
# q05 — UnionAll of N inputs with agreeing schemas (reference:
# plans/ir/nodes.rs:831-865), plus a per-arm file-constant column exactly
# like the kernel's per-file lit columns.
# ---------------------------------------------------------------------------
_VALUES_ROWS = [
    (1, "checkpoint", 10.5),
    (2, "commit", 1.25),
    (3, "compacted", 4.0),
    (4, None, None),
]


def q05_union_values_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnionAll of three filtered scan arms PLUS a Values arm (reference
    plans/ir/nodes.rs:212-279): inline literal rows union'd against real
    table arms, exactly the kernel's last-checkpoint-hint Values shape."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "value", F.lit("arm_click").alias("arm")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", F.lit("arm_purchase").alias("arm")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "value", F.lit("arm_error").alias("arm")
    )
    values = spark.createDataFrame(
        _VALUES_ROWS, "id INT, kind STRING, weight DOUBLE"
    ).select(
        F.col("id").cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.col("weight").alias("value"),
        F.concat(F.lit("arm_values_"), F.coalesce("kind", F.lit("null"))).alias(
            "arm"
        ),
    )
    return clicks.unionByName(purchases).unionByName(errors).unionByName(values)


register(
    "q05_union_values_arms",
    q05_union_values_arms,
    """
    SELECT event_id, user_id, value, 'arm_click' AS arm FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, value, 'arm_purchase' AS arm FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, value, 'arm_error' AS arm FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT CAST(id AS BIGINT), CAST(NULL AS BIGINT), CAST(weight AS DOUBLE),
           'arm_values_' || COALESCE(kind, 'null')
    FROM (VALUES (1, 'checkpoint', 10.5), (2, 'commit', 1.25),
                 (3, 'compacted', 4.0), (4, NULL, NULL)) AS t(id, kind, weight)
    """,
)


# ---------------------------------------------------------------------------
# q07 — ParseJson: permissive JSON-string -> struct (reference:
# kernel/src/expressions/mod.rs:331-359; JsonHandler.parse_json
# lib.rs:661-729). events.props is a JSON document.
# ---------------------------------------------------------------------------
def q07_parse_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("props_struct", F.from_json("props", "k BIGINT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("props_struct.k")).alias("sum_k"),
        F.count(F.col("props_struct.k")).alias("n_parsed"),
    )


register(
    "q07_parse_json_props",
    q07_parse_json_props,
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_parsed
    FROM events GROUP BY event_type
    """,
)


# ---------------------------------------------------------------------------
# q08 — multi-join star query with broadcast dims (Load-node composition;
# broadcast = the kernel's "file-constant columns are per-file broadcast"
# idea applied to dimension tables). Revenue per region.
# ---------------------------------------------------------------------------
def q08_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            _money_sum(disc_price, 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


register(
    "q08_revenue_by_region",
    q08_revenue_by_region,
    f"""
    SELECT r_name,
           {_money_sum_sql('l_extendedprice * (1.0 - l_discount)', 10000)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)


# ---------------------------------------------------------------------------
# q09 — window top-k per group (beyond reference parity — SURVEY §2.6 notes
# the reference documents ROW_NUMBER as the dedup equivalent; Spark has it
# natively). Deterministic tie-break on o_orderkey.
# ---------------------------------------------------------------------------
def q09_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    # Two-stage top-k: segment cardinality is tiny (5), so a single global
    # window would sort the whole fact table in 5 tasks at scale. Stage 1
    # keeps top-k per (segment, input partition) — high-cardinality key,
    # fully parallel; any global top-k row is necessarily in its
    # partition's top-k. Stage 2 ranks the ≤ k·partitions survivors.
    pre_w = Window.partitionBy("c_mktsegment", F.spark_partition_id()).orderBy(*order_cols)
    pre = (
        joined.withColumn("prn", F.row_number().over(pre_w))
        .filter(F.col("prn") <= 3)
        .drop("prn")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(*order_cols)
    return (
        pre.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


register(
    "q09_topk_orders_per_segment",
    q09_topk_orders_per_segment,
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
)


# ---------------------------------------------------------------------------
# q10 — expression-language coverage: arithmetic (+,-,*,/), Coalesce,
# CASE/keep-predicate struct shape, 3VL junctions, NOT-inversion, Cast
# (reference: kernel/src/expressions/mod.rs:61-183, 361-369).
# ---------------------------------------------------------------------------
def q10_expression_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    keep = (F.col("l_quantity") > 30) | (F.col("l_discount") < 0.02)
    return (
        li.filter(keep & ~(F.col("l_tax") > 0.07))
        .select(
            "l_orderkey",
            "l_linenumber",
            # Exact 6-decimal fixed-point via integer scaling — ROUND(x, 2)
            # would sit on half-boundaries where Spark and DuckDB disagree.
            (F.round(charge * F.lit(1000000.0), 0).cast("long") / F.lit(1000000.0))
            .cast("double")
            .alias("charge"),
            F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
                "flag_or_none"
            ),
            (F.col("l_quantity").cast("long") - F.lit(1)).alias("qty_minus_one"),
        )
    )


register(
    "q10_expression_ops",
    q10_expression_ops,
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           * 1000000.0, 0) AS BIGINT) / 1000000.0 AS DOUBLE) AS charge,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           CAST(l_quantity AS BIGINT) - 1 AS qty_minus_one
    FROM lineitem
    WHERE (l_quantity > 30 OR l_discount < 0.02) AND NOT (l_tax > 0.07)
    """,
)


# ---------------------------------------------------------------------------
# q11 — event-time tumbling window (streaming-shaped; batch equivalent of
# the Structured Streaming windowed agg in streaming/). Buckets as epoch
# seconds so both engines emit identical BIGINTs.
# ---------------------------------------------------------------------------
def q11_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money_sum(F.col("value"), 100).alias("sum_value"),
        )
    )


register(
    "q11_tumbling_events",
    q11_tumbling_events,
    f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, event_type,
           COUNT(*) AS n_events,
           {_money_sum_sql('value', 100)} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# q12 — global (empty group-by) aggregate, min/max/count — the Aggregate
# node's global form (reference: plans/ir/nodes.rs:474-571 "empty group_by").
# ---------------------------------------------------------------------------
def q12_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_orderdate"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_orderdate"),
        F.max("o_totalprice").alias("max_price"),
        _money_sum(F.col("o_totalprice"), 100).alias("sum_price"),
    )


register(
    "q12_global_agg",
    q12_global_agg,
    f"""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_orderdate,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_orderdate,
           MAX(o_totalprice) AS max_price,
           {_money_sum_sql('o_totalprice', 100)} AS sum_price
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# q13 — struct constructor with keep-predicate + StructPatch sparse edits
# (reference: Expression::Struct kernel/src/expressions/mod.rs:473-487,
# struct patches kernel/src/struct_patch.rs).
# ---------------------------------------------------------------------------
def q13_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_kernel_rs_spark.plans.expressions import (
        Arith,
        Col,
        Compare,
        Literal,
        StructExpr,
        StructPatchBuilder,
    )

    events = load_table(spark, sf_dir, "events")
    # struct(t, v) kept only where value > 10 (NULL otherwise)...
    kept = StructExpr(
        fields=(("t", Col("event_type")), ("v", Col("value"))),
        keep=Compare("gt", Col("value"), Literal(10.0)),
    )
    staged = events.select("event_id", kept.to_spark().alias("s"))
    # ...then a sparse patch: add v2 = v*2, drop t — O(edits), untouched
    # fields pass through (NULL struct stays NULL).
    patch = (
        StructPatchBuilder("s")
        .set("v2", Arith("multiply", Col("s.v"), Literal(2.0)))
        .drop("t")
        .build()
    )
    patched = staged.select("event_id", patch.to_spark().alias("p"))
    return patched.select(
        "event_id", F.col("p.v").alias("v"), F.col("p.v2").alias("v2")
    )


register(
    "q13_struct_ops",
    q13_struct_ops,
    """
    SELECT event_id,
           CASE WHEN value > 10 THEN value END AS v,
           CASE WHEN value > 10 THEN value * CAST(2.0 AS DOUBLE) END AS v2
    FROM events
    """,
)


# ---------------------------------------------------------------------------
# q14 — gap-based sessionization: Spark's session_window aggregate (the
# Structured-Streaming session operator, exercised here in batch). A new
# session starts when an event is >= 30 minutes after the previous one;
# session end = last event + gap (half-open [start, end) windows, so an
# event landing exactly on a session's end begins a NEW session — the
# oracle's lag/cumsum reconstruction uses >= to match).
# ---------------------------------------------------------------------------
def q14_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            F.col("n_events"),
        )
    )


register(
    "q14_user_sessions",
    q14_user_sessions,
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
           CAST(epoch_us(max(ts) + INTERVAL 30 MINUTE) AS BIGINT)
             AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
