"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible data pipeline — re-running
the job must select the same rows, and an ANSI-SQL oracle must be able to
re-derive the selection. Both operators therefore key off the md5 hex of
a stable id (byte-identical in Spark and DuckDB; see operators/hashing.py
for the cross-engine-determinism rationale):

* :func:`deterministic_sample` — keep rows whose md5-hex prefix sorts
  below a threshold. A k-hex-char threshold gives rate = int(t,16)/16^k
  (e.g. ``'8'`` → 1/2, ``'1999'`` → ~10.0%). Pure filter: no shuffle, no
  RNG state, trivially repartition-stable at any scale.
* :func:`cap_per_group` — at most N rows per group, chosen by md5 order
  (a deterministic reservoir): the standard "cap documents per domain /
  language" curation step. One shuffle on the group key; skewed groups
  cost what any per-group top-k costs (the window is rank-limited, so
  Spark's WindowGroupLimit pushes the cap before the full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(key: Column, chars: int = 4) -> Column:
    """Lowercase md5-hex prefix of a stable key — the sampling coordinate."""
    return F.substring(F.md5(key.cast("string")), 1, chars)


def deterministic_sample(
    df: DataFrame, key_col: str, threshold_hex: str
) -> DataFrame:
    """Keep rows with ``md5(key)[:len(threshold)] < threshold`` (hex order)."""
    return df.filter(
        hash_bucket(F.col(key_col), len(threshold_hex)) < F.lit(threshold_hex)
    )


def cap_per_group(
    df: DataFrame, group_cols: list[str], key_col: str, n: int
) -> DataFrame:
    """At most ``n`` rows per group, selected in md5(key) order.

    The md5 order is an unbiased, reproducible shuffle of each group; the
    key itself breaks (practically impossible) digest ties so the result
    is a pure function of the input set.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixture_thresholds(rates: dict[str, float], chars: int = 4) -> dict[str, str]:
    """Per-group md5-hex-prefix thresholds encoding sampling rates.

    A rate quantizes to ``floor(rate * 16^chars)`` buckets of the hex
    space (4 chars = 1/65536 granularity); the comparison is plain
    lexicographic string order on lowercase hex, which every engine
    totals identically — that is what makes the selection reproducible
    cross-engine, unlike rand()-based sampling."""
    scale = 16 ** chars
    out = {}
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
        q = min(scale, int(r * scale))
        out[g] = "g" if q == scale else format(q, f"0{chars}x")  # 'g' > any hex
    return out


def weighted_mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    chars: int = 4,
) -> DataFrame:
    """Training-mixture reweighting: keep each ``group_col`` value at its
    configured rate (groups without a rate drop entirely), deterministically
    by ``md5(key)`` prefix. Map-only — no shuffle, no join, no RNG state —
    so the same mixture re-derives identically on any cluster layout, and
    re-runs over a grown corpus keep previously-selected rows selected
    (the hash, not the population, decides).
    """
    thr = mixture_thresholds(rates, chars)
    mapping = F.create_map(
        *[F.lit(x) for g in sorted(thr) for x in (g, thr[g])]
    )
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, chars)
        < F.coalesce(mapping[F.col(group_col)], F.lit("0" * chars))
    )


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    token_col: Column | str,
    key_col: str,
    budget_tokens: int,
    weights: dict[str, float],
) -> DataFrame:
    """Fill a global token budget across groups at configured weights.

    The planning step of assembling a training mix: each group gets a
    quota of ``floor(budget * weight / sum(weights))`` tokens, then
    documents are admitted in md5(key) order (the reproducible shuffle)
    until the RUNNING token total would exceed the quota — i.e. the
    selected set is the maximal md5-prefix of the group whose token sum
    fits. Adds ``cum_tokens`` (the running total including the row) and
    ``quota_tokens``.

    Scale: one window shuffle partitioned by group. The running sum is
    inherently sequential WITHIN a group (that is the semantics), but
    groups fill in parallel — the same shape as any per-group cumsum; no
    driver state, no RNG, and identical selection on any cluster layout.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    quotas = {g: int(budget_tokens * w / total_w) for g, w in weights.items()}
    qmap = F.create_map(
        *[F.lit(x) for g in sorted(quotas) for x in (g, quotas[g])]
    )
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("quota_tokens", qmap[F.col(group_col)].cast("long"))
        .filter(F.col("quota_tokens").isNotNull())
        .withColumn("cum_tokens", F.sum(tok.cast("long")).over(w))
        .filter(F.col("cum_tokens") <= F.col("quota_tokens"))
    )


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    fractions: list[tuple[str, float]],
) -> DataFrame:
    """Deterministic stratified train/val/test split: EXACT per-stratum
    proportions, not just in-expectation.

    Rows rank within their stratum by md5(key) order (an unbiased,
    reproducible shuffle); the first ``ceil(f1*n)`` become the first
    split, the next band the second, and so on — so every stratum
    contributes its exact share to every split regardless of stratum
    skew. ``fractions`` is an ordered [(label, fraction)] list whose
    fractions sum to 1; the last label absorbs the remainder.

    Scale shape: ONE window shuffle partitioned by the strata (rank +
    count in the same window pass, no second aggregation or join). The
    assignment is a pure function of the input set — re-running on any
    cluster layout, or after appending new strata, reproduces the same
    labels for existing rows within an unchanged stratum.
    """
    if abs(sum(f for _, f in fractions) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    wc = Window.partitionBy(*strata_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wc)
    )
    # when-chain in declaration order: rn <= ceil(cum_frac * n) → label
    chain = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        cond = F.col("__rn") <= F.ceil(F.lit(cum) * F.col("__n"))
        chain = (
            F.when(cond, F.lit(name))
            if chain is None
            else chain.when(cond, F.lit(name))
        )
    last = F.lit(fractions[-1][0])
    split = chain.otherwise(last) if chain is not None else last
    return out.withColumn("split", split).drop("__rn", "__n")


def dsir_importance(
    docs: DataFrame,
    target,
    buckets: int = 256,
    ratio_threshold: float = 1.0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how target-like its hashed-ngram distribution is, then select by an
    ABSOLUTE ratio threshold.

    ``target`` is a boolean Column marking the target domain (e.g.
    ``F.col("lang") == "en"``). Features are word occurrences hashed into
    ``buckets`` via the cross-engine md5 construction
    (operators/hashing.py). Each occurrence contributes the
    Laplace-smoothed target/raw count ratio in integer micro-units —
    ``round(1e6 * (tgt[b]+1) / (raw[b]+1))`` summed as BIGINT, so the
    per-doc score is order-free and bit-identical across engines (IEEE
    division is exact-rounded; integer sums commute).

    Scale shape (r12 rewrite, guide §2.4 / §1.2 "the distributed
    algorithm"): the per-document bucket histogram is a per-row function
    — one sorted run-length fold over the ≤ ``buckets``-distinct bucket
    array — so NO (doc, bucket) shuffle exists at all. The global
    distribution is one tiny groupBy(bucket) over the exploded in-row
    histograms (≤ ``buckets`` rows per doc, map-side combined to
    ``buckets`` rows total) whose ``buckets``-row result is collected to
    the driver (metadata-sized, the k-means-centroids class) and scoring
    is a map-only in-row fold against the literal bucket→ratio map — the
    former shape executed the explode + (doc, bucket) count aggregation
    TWICE (once per side of a broadcast join) and paid a doc-keyed
    aggregation afterwards. Selection stays a map-only threshold on the
    per-token mean ratio — NOT a global top-k rank, which would need a
    total order over every document at 100 TB.

    ``keep_cols`` ride the per-row projection for free (no join-back —
    callers needing doc metadata name it here instead of re-joining the
    corpus on doc_id).

    Output: doc_id, *keep_cols, n_tokens, importance_micro, selected.
    """
    from delta_kernel_rs_spark.operators.parallel import (
        ensure_min_parallelism,
        materialize_column,
    )

    # per-word buckets via the same cross-engine md5 construction
    # (operators/hashing.md5_hash32), as in-row SQL over the word array
    b_sql = (
        "transform(filter(split(text, ' '), w -> w != ''), "
        "w -> CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
        f" % {buckets})"
    )
    # sorted run-length fold -> array<struct<b, cnt>>: equal buckets are
    # adjacent after array_sort, each run closes into one histogram entry
    close = (
        "CASE WHEN s.v IS NULL THEN s.out "
        "ELSE concat(s.out, array(named_struct('b', s.v, 'cnt', s.c))) END"
    )
    hist_sql = (
        "aggregate(array_sort(__b), "
        "named_struct('v', CAST(NULL AS BIGINT), 'c', 0L, "
        "'out', CAST(array() AS ARRAY<STRUCT<b: BIGINT, cnt: BIGINT>>)), "
        "(s, x) -> CASE WHEN s.v IS NOT NULL AND x = s.v THEN "
        "named_struct('v', s.v, 'c', s.c + 1L, 'out', s.out) "
        f"ELSE named_struct('v', x, 'c', 1L, 'out', {close}) END, "
        f"s -> {close})"
    )
    base = materialize_column(
        materialize_column(
            ensure_min_parallelism(
                docs.select(
                    "doc_id", *keep_cols, target.alias("__target"), "text"
                )
            ),
            F.expr(b_sql),
            "__b",
        ).filter(F.size("__b") > 0),
        F.expr(hist_sql),
        "__bc",
    )
    term = F.round(
        F.lit(1_000_000.0) * (F.col("tgt_cnt") + 1) / (F.col("raw_cnt") + 1)
    ).cast("long")
    dist_rows = (
        base.select(F.col("__target"), F.explode("__bc").alias("e"))
        .groupBy(F.col("e.b").alias("b"))
        .agg(
            F.sum("e.cnt").alias("raw_cnt"),
            F.sum(
                F.when(F.col("__target"), F.col("e.cnt")).otherwise(F.lit(0))
            ).alias("tgt_cnt"),
        )
        .select("b", term.alias("term"))
        .collect()
    )
    if dist_rows:
        map_sql = "map(" + ", ".join(
            f"{r['b']}L, {r['term']}L" for r in dist_rows
        ) + ")"
    else:
        map_sql = "CAST(map() AS MAP<BIGINT, BIGINT>)"
    scored = base.select(
        "doc_id",
        *keep_cols,
        F.expr("aggregate(__bc, 0L, (acc, e) -> acc + e.cnt)").alias("n_tokens"),
        F.expr(
            f"aggregate(__bc, 0L, (acc, e) -> acc + e.cnt * element_at({map_sql}, e.b))"
        ).alias("importance_micro"),
    )
    return scored.select(
        "doc_id",
        *keep_cols,
        "n_tokens",
        "importance_micro",
        (
            F.col("importance_micro") * F.lit(1.0) / F.col("n_tokens")
            >= F.lit(ratio_threshold * 1_000_000.0)
        ).alias("selected"),
    )
