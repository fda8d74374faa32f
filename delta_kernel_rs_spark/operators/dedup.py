"""Document deduplication operators: exact, MinHash-LSH, SimHash, Jaccard.

The reference engine manages the *table* substrate; these operators are the
dedup passes a training-data pipeline runs over it (VERDICT round-1 item 1;
the `documents` fixture table is the target).

Every operator is a bucketed/shuffle-friendly DataFrame plan — candidate
generation never does an unbucketed all-pairs crossJoin:

- exact: hash-groupBy on the text digest (one shuffle on md5(text)).
- MinHash-LSH: signature → band signatures → equi-join on (band, sig)
  buckets → exact Jaccard verify on the candidates only.
- exact Jaccard: inverted-index join on shingle (pairs sharing >=1 shingle),
  count-based intersection — the classic exact-similarity-join plan.
- SimHash: per-word hash → 32 per-bit partial sums in ONE aggregation
  (no row blowup), sign-combined into the fingerprint.

All hashes are the cross-engine-deterministic constructions from
``operators.hashing`` so the DuckDB oracle can replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_kernel_rs_spark.operators.hashing import (
    BAND_ROWS,
    MINHASH_PRIME,
    N_PERMUTATIONS,
    PERMUTATIONS,
    md5_hash32,
)
from delta_kernel_rs_spark.operators.parallel import ensure_min_parallelism


def with_word_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3, out: str = "shingles"
) -> DataFrame:
    """Add the distinct set of word k-shingles; drops rows with < k words.

    Shingle construction is the CPU-heavy head of every text-similarity
    plan, so under-partitioned input (a single parquet row group) is
    fanned out first — see ``operators.parallel``.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    df = ensure_min_parallelism(df)
    ws = F.split(F.col(text_col), " ")
    # materialize the token array once per row: inlined into the transform
    # lambda below, the split would re-run per shingle — O(L^2) per doc
    # (see materialize_column; round-12 scale-growth find)
    df = materialize_column(df.filter(F.size(ws) >= k), ws, "__ws")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("__ws") - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice("__ws", i, k)),
        )
    )
    # materialize the OUTPUT array too (r12 batch 2): left as a plain
    # withColumn alias, CollapseProject inlines the whole O(L) shingle
    # construction into every downstream reference — a consumer that
    # explodes the column gets an inferred `size(expr) > 0 AND
    # isnotnull(expr)` filter, i.e. THREE evaluations per row (HOFs are
    # CodegenFallback, so no CSE rescues it; seen verbatim in the p04
    # physical plan's Filter node). The Generate barrier makes every
    # downstream reference a plain attribute read.
    return materialize_column(df, shingles, out).drop("__ws")


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: surviving (minimum) id + copy count.

    The only shuffle is the groupBy on the 128-bit digest — at 100 TB this
    is a plain hash aggregation with map-side partial combine.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def _minhash_minima_arrow(batches):
    """Vectorized 64-permutation MinHash minima over Arrow batches.

    Input batches: (id, __xs list<int64>); output: (id, m0..m63).
    EXACT integer arithmetic: a, b, x < 2^31 so a*x + b < 2^62 + 2^31
    fits int64, and numpy's ``%`` on non-negative int64 matches the JVM's
    — minima are bit-identical to the former JVM expressions (asserted
    over the full gate corpus when this path landed, and pinned by the
    oracle gate). Permutations loop one at a time so peak temp memory is
    O(batch values), not O(64 × values).
    """
    import numpy as np
    import pyarrow as pa

    n_perm = len(PERMUTATIONS)
    for batch in batches:
        ids = batch.column(0)
        xs = batch.column(1)
        n = len(ids)
        names = [batch.schema.names[0]] + [f"m{p}" for p in range(n_perm)]
        if n == 0:
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array([], type=pa.int64())] * n_perm, names=names
            )
            continue
        lens_arr = pa.compute.list_value_length(xs)
        lens = lens_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = xs.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # rows with NULL or empty hash arrays get NULL minima, exactly
        # like array_min over an empty/null array
        mask = lens == 0
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        safe_offs = np.minimum(offs, max(flat.size - 1, 0))
        cols = []
        if flat.size == 0:
            null_col = pa.nulls(n, type=pa.int64())
            cols = [null_col] * n_perm
        else:
            for a, b in PERMUTATIONS:
                h = (a * flat + b) % MINHASH_PRIME
                mins = np.minimum.reduceat(h, safe_offs)
                cols.append(
                    pa.array(mins, type=pa.int64(), mask=mask)
                    if mask.any()
                    else pa.array(mins, type=pa.int64())
                )
        yield pa.RecordBatch.from_arrays([ids] + cols, names=names)


def _band_rows_from_text_arrow(k: int, id_field: str):
    """Whole LSH banding pass over Arrow batches of (id, text).

    Per document: word k-shingles → 32-bit md5 hashes → 64 permutation
    minima → 16 per-band md5 signatures, all inside one Python pass
    (guide §4.2). Every step replays the engine/oracle contract
    bit-for-bit:

    * tokenization is ``text.split(" ")`` — same empty-string-preserving
      single-space semantics as ``F.split(text, " ")`` / DuckDB
      ``string_split(text, ' ')``;
    * the shingle hash is the first 8 md5 hex chars as an unsigned int
      (``md5_hash32``) mod P — ``int.from_bytes(md5(s).digest()[:4])`` is
      that value exactly, and duplicates/order can't move a minimum so
      ``array_distinct`` is unnecessary here;
    * minima use the same exact int64 arithmetic as
      ``_minhash_minima_arrow`` (a*x+b < 2^62, no overflow);
    * band signatures are md5 over the comma-joined decimal minima —
      byte-identical to ``md5(concat_ws(",", cast(m as string)...))``.

    Docs with fewer than k words emit no rows (the with_word_shingles
    filter). Output: one (id, band, band_sig) row per (doc, band).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    n_bands = N_PERMUTATIONS // BAND_ROWS
    A = np.array([a for a, _ in PERMUTATIONS], dtype=np.int64).reshape(-1, 1)
    B = np.array([b for _, b in PERMUTATIONS], dtype=np.int64).reshape(-1, 1)

    def gen(batches):
        md5 = hashlib.md5
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            # one flat hash array for the whole batch: per-doc segment
            # boundaries drive a reduceat per permutation
            flat: list[int] = []
            doc_ids: list = []
            offs: list[int] = []
            counts: list[int] = []
            for doc_id, text in zip(ids, texts):
                if doc_id is None or text is None:
                    continue
                ws = text.split(" ")
                n_sh = len(ws) - (k - 1)
                if n_sh < 1:
                    continue
                doc_ids.append(doc_id)
                offs.append(len(flat))
                counts.append(n_sh)
                join = " ".join
                flat.extend(
                    int.from_bytes(
                        md5(join(ws[i : i + k]).encode("utf-8")).digest()[:4],
                        "big",
                    )
                    for i in range(n_sh)
                )
            if not doc_ids:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([], type=batch.schema.field(0).type),
                        pa.array([], type=pa.int32()),
                        pa.array([], type=pa.string()),
                    ],
                    names=[id_field, "band", "band_sig"],
                )
                continue
            hs = np.array(flat, dtype=np.int64) % MINHASH_PRIME
            offs_np = np.array(offs, dtype=np.int64)
            # (64, n_shingles) permuted hashes → per-doc minima via reduceat
            minima = np.empty((len(doc_ids), N_PERMUTATIONS), dtype=np.int64)
            for p in range(N_PERMUTATIONS):
                h = (A[p, 0] * hs + B[p, 0]) % MINHASH_PRIME
                minima[:, p] = np.minimum.reduceat(h, offs_np)
            out_ids, out_band, out_sig = [], [], []
            for d, doc_id in enumerate(doc_ids):
                row = minima[d]
                for band in range(n_bands):
                    seg = row[band * BAND_ROWS : (band + 1) * BAND_ROWS]
                    sig = md5(
                        ",".join(str(int(m)) for m in seg).encode("utf-8")
                    ).hexdigest()
                    out_ids.append(doc_id)
                    out_band.append(band)
                    out_sig.append(sig)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, type=batch.schema.field(0).type),
                    pa.array(out_band, type=pa.int32()),
                    pa.array(out_sig, type=pa.string()),
                ],
                names=[id_field, "band", "band_sig"],
            )

    return gen


def minhash_band_rows_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, band, band_sig) LSH bucket rows straight from raw text.

    MAP-ONLY like minhash_band_signatures, but the whole banding pass —
    tokenize, shingle, md5-hash, permutation minima, band signatures —
    runs vectorized in ONE ``mapInArrow`` (r13, guide §4.2): the JVM
    route evaluated three interpreted CodegenFallback HOF chains per row
    (split+slice+concat shingling, per-shingle conv(substring(md5)))
    before the Arrow minima pass, and re-ran the corpus-sized shingle
    subtree that the verify joins already execute. Only (id, text)
    crosses the boundary. Values are bit-identical to the JVM path (see
    _band_rows_from_text_arrow) and stay pinned by the oracle gate.
    """
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType.simpleString()
    schema = T.StructType.fromDDL(
        f"{id_col} {id_type}, band int, band_sig string"
    )
    src = ensure_min_parallelism(df.select(id_col, text_col))
    return src.mapInArrow(_band_rows_from_text_arrow(k, id_col), schema)


def minhash_band_signatures(
    df: DataFrame, id_col: str = "doc_id", shingle_col: str = "shingles"
) -> DataFrame:
    """(id, band, band_sig) rows: the LSH bucketing key per document.

    Plan shape: MAP-ONLY, no shuffle. The 32-bit shingle hashes are
    computed once per document in the JVM (md5 is the cross-engine
    contract and codegen-friendly), then ONLY ``(id, hashes)`` crosses to
    an Arrow-batched ``mapInArrow`` where numpy computes all 64
    permutation minima vectorized (r12 batch 2, guide §4.2: higher-order
    functions are CodegenFallback, so 64 interpreted ``array_min(
    transform(...))`` expressions per row cost more than one vectorized
    native pass — same-JVM A/B 3.11 → 2.57 s on the bands subplan at
    sf0.1, minima asserted bit-identical). Band signatures are md5 over
    the in-order minima of each band, computed back in the JVM,
    unchanged.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    hashed = materialize_column(
        df,
        F.transform(
            F.col(shingle_col), lambda s: md5_hash32(s) % MINHASH_PRIME
        ),
        "__xs",
    )
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType.simpleString()
    minima_schema = T.StructType.fromDDL(
        f"{id_col} {id_type}, "
        + ", ".join(f"m{p} long" for p in range(N_PERMUTATIONS))
    )
    minima = hashed.select(F.col(id_col), F.col("__xs")).mapInArrow(
        _minhash_minima_arrow, minima_schema
    )
    n_bands = N_PERMUTATIONS // BAND_ROWS
    band_sigs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{p}").cast("string")
                            for p in range(band * BAND_ROWS, (band + 1) * BAND_ROWS)
                        ],
                    )
                ).alias("band_sig"),
            )
            for band in range(n_bands)
        ]
    )
    return minima.select(F.col(id_col), F.explode(band_sigs).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig")
    )


def _jaccard(inter: Column, size_a: Column, size_b: Column) -> Column:
    return inter.cast("double") / (size_a + size_b - inter)


def neardup_pairs_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH candidates + exact verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and word-k-shingle
    Jaccard >= threshold. Candidates come only from shared LSH band buckets
    (equi-join shuffle on (band, band_sig)); the exact Jaccard check on the
    candidate pairs removes LSH false positives, so precision is exact and
    recall is the banding probability (1-(1-j^r)^b ~ 1 for j near 1).

    The shingle-set frame appears three times in the plan (minhash input
    + both verify sides). r12 (guide §5 "caching is only worth it when
    recomputing is more expensive than the memory pressure"): the former
    MEMORY_AND_DISK persist is GONE — measured at sf0.1, materializing
    the shingle-array cache cost 3.6 s while one map-only recompute costs
    0.5 s, and the cached runs showed multi-second GC/spill instability
    (a 69 s outlier pass) where the persist-free plan is steady. At
    100 TB the same trade holds harder: a corpus-sized array cache
    thrashes storage memory, while re-running tokenize+shingle is pure
    map-side compute that scales with cores.
    """
    docs = with_word_shingles(df, text_col=text_col, k=k)
    sets_df = docs.select(
        F.col(id_col), "shingles", F.size("shingles").alias("n_sh")
    )
    # Banding runs straight off (id, text) in one Arrow pass (r13, guide
    # §4.2) — the JVM shingle subtree now executes ONLY for the verify
    # sides (1 execution via ReusedExchange), not a second time for the
    # signature input, and the interpreted per-shingle md5 HOF is gone.
    bands = minhash_band_rows_from_text(df, id_col=id_col, text_col=text_col, k=k)

    # Candidate pairs per LSH bucket via ONE groupBy + in-row pair
    # expansion (r12, guide §2.4): the former bands⋈bands self-join
    # re-executed the whole signature subtree on both sides and shuffled
    # it twice; grouping by (band, band_sig) computes signatures once,
    # shuffles once, and emits each bucket's sorted-id pairs with a
    # flatten/transform — identical pair set (a < b by sort order),
    # probe-measured 4.4 s → 1.0 s on the isolated stage. Bucket sizes
    # are LSH-collision-bounded, the same guarantee the join relied on.
    buckets = (
        bands.groupBy("band", "band_sig")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # materialize the O(bucket²) pair array before exploding (r12 batch
    # 2): explode(expr) gets an inferred size/isnotnull filter, so the
    # inlined expansion evaluated 3× per bucket row
    from delta_kernel_rs_spark.operators.parallel import materialize_column as _mat

    cands = (
        _mat(
            buckets,
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "b -> struct(a AS doc_a, b AS doc_b))))"
            ),
            "__pairs",
        )
        .select(F.explode(F.col("__pairs")).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    # Shuffle-hash verify joins with EXCHANGE REUSE (r12 batch 2, guide
    # §2.4/§3.1): the earlier broadcast(cands) hint stopped Catalyst from
    # broadcasting the shingle-array frame, but still STREAMED that frame
    # on both verify joins — two full executions of tokenize+shingle.
    # Hinting shuffle_hash on the small side instead makes both verify
    # joins shuffle sets_df by doc_id — two canonically identical
    # exchanges, so AQE's stage cache executes the shingle frame ONCE and
    # the second join reads a ReusedExchange (verified in the final
    # adaptive plan). Net: 3 → 2 executions of the tokenize+shingle
    # subtree for the whole query, at the cost of one shuffle of the
    # shingle frame. Build sides stay the candidate pairs (two longs per
    # row) and the already-candidate-pruned j1 output — never the corpus.
    j1 = cands.hint("shuffle_hash").join(
        sets_df.alias("sa"), F.col("doc_a") == F.col(f"sa.{id_col}")
    )
    return (
        j1.hint("shuffle_hash")
        .join(sets_df.alias("sb"), F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            _jaccard(inter, F.col("sa.n_sh"), F.col("sb.n_sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


#: Chooser knobs: docs sampled for vocabulary statistics, and the
#: estimated per-posting join fanout (Σf²/Σf, scaled to the full corpus)
#: above which the count-method posting join is considered quadratic
#: enough that prefix pruning pays for its extra passes.
JACCARD_AUTO_SAMPLE_DOCS = 2_000
JACCARD_AUTO_FANOUT_CUTOFF = 1_000.0


def _choose_jaccard_method(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    block_cols: list[str],
) -> str:
    """Vocabulary-statistics chooser between ``count`` and ``prefix``.

    The count method's posting self-join materializes Σ_g f_g(f_g-1)/2
    intermediate rows (f_g = shingle g's document frequency within its
    block); its cost per input posting is the fanout Σf²/Σf. On dense
    small vocabularies that stays modest and count wins (no extra
    passes); on large skewed vocabularies it explodes and PPJoin-style
    prefix pruning wins. Estimate the fanout from a bounded sample of
    docs (frequency scales linearly in corpus size, so sampled fanout
    is scaled back up by N/m) and compare against the cutoff.
    """
    # r13 (guide §1.2, §5): the probe itself cost ~0.9 s of a ~2.4 s
    # query — the sampled gram statistics ran interpreted
    # (CodegenFallback) shingle HOFs plus an explode + two aggregations
    # over the 2000-doc sample. The sample is BOUNDED (~2 MB of text),
    # so the statistic is now computed on the driver from the collected
    # raw sample — one cheap limit-collect plus the count-star job,
    # ~0.3 s total. Same sampling policy (first JACCARD_AUTO_SAMPLE_DOCS
    # rows), same per-(block, gram) frequency statistic, same cutoff —
    # the decision is unchanged for any fixed input, and either choice
    # is lossless (plan cost only, never the result).
    n_docs = df.count()
    m = min(n_docs, JACCARD_AUTO_SAMPLE_DOCS)
    if m == 0:
        return "count"
    sample = (
        df.limit(JACCARD_AUTO_SAMPLE_DOCS)
        .select(*[F.col(c) for c in block_cols], F.col(text_col))
        .collect()
    )
    from collections import Counter

    freq: Counter = Counter()
    for row in sample:
        text = row[text_col]
        if text is None:
            continue
        ws = text.split(" ")
        if len(ws) < k:
            continue
        block = tuple(row[c] for c in block_cols)
        for g in {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}:
            freq[(block, g)] += 1
    tot = sum(freq.values())
    if not tot:
        return "count"
    f2 = sum(f * f for f in freq.values())
    est_fanout = (f2 / tot) * (n_docs / m)
    return "prefix" if est_fanout > JACCARD_AUTO_FANOUT_CUTOFF else "count"


def jaccard_pairs_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    block_cols: list[str] | None = None,
    method: str = "auto",
) -> DataFrame:
    """Exact Jaccard similarity join via an inverted index on shingles.

    Two lossless plans, chosen by ``method``:

    * ``"count"``: full posting equi-join; the intersection size
      IS the per-pair join count (map-side partial counts, one shuffle) —
      no second verify pass. Best when the shingle vocabulary is small /
      dense, where prefix pruning cannot remove anything.
    * ``"prefix"`` (PPJoin-style): order each document's shingles by
      global rarity; a qualifying pair must share its smallest common
      shingle, which provably lies inside both documents' length
      ``n - ceil(τ·n) + 1`` prefixes — candidates come from an equi-join
      on PREFIX shingles only, then exact-intersection verify. Best at
      corpus scale with realistic (large, skewed) vocabularies, where the
      frequent shingles land in suffixes and never generate pairs.
    * ``"auto"`` (default): pick between them from sampled vocabulary
      statistics — see :func:`_choose_jaccard_method`. Both plans are
      lossless, so the choice affects cost only, never the result.
    """
    if method == "auto":
        method = _choose_jaccard_method(df, id_col, text_col, k, block_cols or [])
    if method == "count":
        return _jaccard_pairs_count(df, id_col, text_col, k, threshold, block_cols)
    if method != "prefix":
        raise ValueError(f"unknown method {method!r}")
    docs = with_word_shingles(df, text_col=text_col, k=k)
    block_cols = block_cols or []
    base = docs.select(
        F.col(id_col), *[F.col(c) for c in block_cols], F.col("shingles")
    )
    all_posting = base.select(F.col(id_col), F.explode("shingles").alias("g"))
    freq = all_posting.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    ordered = (
        all_posting.join(freq, "g")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("cnt", "g"))), lambda s: s["g"]
            ).alias("sorted_sh")
        )
    )
    from pyspark.storagelevel import StorageLevel

    # rarity-sorted shingle frame feeds the prefix posting and both
    # verify sides — cache spillably so the sort-by-frequency join runs
    # once, not three times
    sets_df = (
        base.join(ordered, id_col)
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.col("sorted_sh"),
            F.size("sorted_sh").alias("n_sh"),
            (
                F.size("sorted_sh")
                - F.ceil(F.lit(threshold) * F.size("sorted_sh")).cast("int")
                + F.lit(1)
            ).alias("prefix_len"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    posting = sets_df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.explode(F.slice("sorted_sh", 1, F.col("prefix_len"))).alias("g"),
    )
    join_on = [F.col("pa.g") == F.col("pb.g"), F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")]
    join_on += [F.col(f"pa.{c}") == F.col(f"pb.{c}") for c in block_cols]
    cands = (
        posting.alias("pa")
        .join(posting.alias("pb"), on=join_on)
        .select(
            F.col(f"pa.{id_col}").alias("doc_a"), F.col(f"pb.{id_col}").alias("doc_b")
        )
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa.sorted_sh"), F.col("sb.sorted_sh")))
    return (
        cands.join(sets_df.alias("sa"), F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sets_df.alias("sb"), F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            _jaccard(inter, F.col("sa.n_sh"), F.col("sb.n_sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _jaccard_pairs_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    threshold: float,
    block_cols: list[str] | None,
) -> DataFrame:
    """Count-based exact similarity join: |A∩B| = posting-join row count.

    The candidate stage stays a posting⋈posting self-join on the shingle
    (NOT the in-row bucket expansion used by the LSH/winnowing paths):
    this method is chosen precisely when the vocabulary is small/dense,
    where hot shingles own corpus-sized posting lists — a
    collect_list bucket would materialize an O(f²) pair array inside ONE
    row (measured 2.65 → 8.1 s at sf0.1; guide §2.5 "it cannot split a
    single enormous key"), while the join streams the same fanout across
    tasks. r12 changes that DID stick (guide §2.3/§2.4): both posting
    sides now CARRY ``n_sh``, so the two size-lookup joins are gone
    (first() aggregates read the carried sizes), and with the shingle
    frame down to 2 consumers the MEMORY_AND_DISK persist costs more
    than one extra map-only shingle pass (same measurement as
    neardup_pairs_minhash) — dropped.
    """
    block_cols = block_cols or []
    docs = with_word_shingles(df, text_col=text_col, k=k)
    posting = docs.select(
        F.col(id_col),
        F.size("shingles").alias("n_sh"),
        *[F.col(c) for c in block_cols],
        F.explode("shingles").alias("g"),
    )
    join_on = [F.col("pa.g") == F.col("pb.g"), F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")]
    join_on += [F.col(f"pa.{c}") == F.col(f"pb.{c}") for c in block_cols]
    # Join strategy left to the planner (r12 batch 2, measured): at bench
    # scale Catalyst broadcasts one posting side and executes the
    # tokenize+shingle+explode subtree twice; forcing shuffle_hash made
    # both sides' exchanges canonically identical (AQE ReusedExchange ran
    # the subtree once) but measured 2.5× SLOWER same-JVM (1.5 vs 4.1 s):
    # the shuffle + per-partition hash build of the exploded posting
    # costs more than the saved map-side pass here. At corpus scale the
    # size estimates exceed the broadcast threshold, the planner picks a
    # shuffle join on its own, and the same exchange reuse fires without
    # a hint — so the hint would only pessimize the small-scale case.
    pairs = (
        posting.alias("pa")
        .join(posting.alias("pb"), on=join_on)
        .groupBy(
            F.col(f"pa.{id_col}").alias("doc_a"), F.col(f"pb.{id_col}").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("pa.n_sh").alias("na"),
            F.first("pb.n_sh").alias("nb"),
        )
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        _jaccard(F.col("inter"), F.col("na"), F.col("nb")).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def _signbits_to_long_sql(sums_slice: str, bits: int) -> str:
    """SQL folding a slice of per-bit sign sums into the fingerprint long:
    bit j set iff sum_j > 0 — the same ``CASE WHEN b_j > 0 THEN 2^j`` the
    former aggregate columns combined."""
    powers = ",".join(f"{1 << j}L" for j in range(bits))
    return (
        f"aggregate(zip_with({sums_slice}, array({powers}), "
        "(v, p) -> CASE WHEN v > 0 THEN p ELSE 0L END), "
        "0L, (acc, v) -> acc + v)"
    )


def simhash_columns(
    ws_col: str, bits: int = 32, halves: int = 1
) -> tuple[Column, str]:
    """(per-word-hash column, sign-sum SQL) for map-only SimHash over a
    pre-materialized distinct-word array ``ws_col``.

    r12 rewrite (guide §2.4): SimHash is a per-document function, so the
    per-bit ±1 sums are ONE in-row fold — each word contributes a
    ``bits``-element sign vector (from md5 halves computed once per word
    via the materialized hash column) and ``aggregate``+``zip_with``
    accumulates them — zero exchanges instead of a distinct-word explode
    plus a ``bits``-column sum-aggregate shuffle. Integer sums in any
    order; identical values (pinned by tests + the oracle gate).

    With ``halves=1`` the hash column is the low md5 half per word and
    the sign vectors are ``bits`` wide; with ``halves=2`` the hash column
    is a struct of both halves and sign vectors are 64 wide (32 per
    half).
    """
    if halves == 1:
        hash_col = F.expr(
            f"transform({ws_col}, w -> "
            "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT))"
        )
        sign_vecs = (
            "transform(__hv, h -> transform(sequence(0, {top}), j -> "
            "CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END))"
        ).format(top=bits - 1)
        width = bits
    else:
        hash_col = F.expr(
            f"transform({ws_col}, w -> named_struct("
            "'a', CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT), "
            "'b', CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT)))"
        )
        sign_vecs = (
            "transform(__hv, h -> transform(sequence(0, 63), j -> "
            "CASE WHEN j < 32 "
            "THEN (CASE WHEN (shiftright(h.a, j) & 1) = 1 THEN 1 ELSE -1 END) "
            "ELSE (CASE WHEN (shiftright(h.b, j - 32) & 1) = 1 THEN 1 ELSE -1 END) "
            "END))"
        )
        width = 64
    sums = (
        f"aggregate({sign_vecs}, array_repeat(0, {width}), "
        "(acc, bv) -> zip_with(acc, bv, (x, y) -> x + y))"
    )
    return hash_col, sums


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-document SimHash fingerprint over distinct words.

    Bit j of the fingerprint is 1 iff the sum over words of
    (bit j of md5_hash32(word) ? +1 : -1) is positive. MAP-ONLY since
    r12: see :func:`simhash_columns` (2.4 s → 0.6 s at sf0.1 for the
    64-bit variant; the former shape exploded distinct words into a
    ``bits``-column sum-aggregate shuffle).
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    hash_col, sums = simhash_columns("__dw", bits=bits, halves=1)
    base = materialize_column(
        ensure_min_parallelism(df).select(F.col(id_col), F.col(text_col)),
        F.expr(f"array_distinct(split({text_col}, ' '))"),
        "__dw",
    )
    staged = materialize_column(
        materialize_column(base, hash_col, "__hv"), F.expr(sums), "__sums"
    )
    return staged.select(
        F.col(id_col),
        F.expr(_signbits_to_long_sql("__sums", bits)).alias("simhash"),
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash as two 32-bit halves ``(s1, s2)`` per document.

    Same MAP-ONLY shape as :func:`simhash` (one in-row fold over per-word
    sign vectors — see :func:`simhash_columns`), hashing each distinct
    word once into both halves of its MD5 — so the fingerprint stays
    exactly reproducible in SQL engines whose BIGINT cannot hold an
    unsigned 64-bit value. Template-heavy corpora collide badly at 32
    bits; 64 is the working width for pair joins.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    hash_col, sums = simhash_columns("__dw", halves=2)
    base = materialize_column(
        ensure_min_parallelism(df).select(F.col(id_col), F.col(text_col)),
        F.expr(f"array_distinct(split({text_col}, ' '))"),
        "__dw",
    )
    staged = materialize_column(
        materialize_column(base, hash_col, "__hv"), F.expr(sums), "__sums"
    )
    return staged.select(
        F.col(id_col),
        F.expr(_signbits_to_long_sql("slice(__sums, 1, 32)", 32)).alias("s1"),
        F.expr(_signbits_to_long_sql("slice(__sums, 33, 32)", 32)).alias("s2"),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash hamming distance.

    Pigeonhole banding (the Manku/Jain/Sarma web-dedup plan): the 64-bit
    fingerprint splits into ``max_hamming + 1`` bands, and any pair within
    hamming distance ``max_hamming`` must agree EXACTLY on at least one
    band — so candidate generation is an equi-join on (band_index,
    band_bits) buckets and recall is total by construction (a theorem, not
    a probability). Verification is ``bit_count(s1a^s1b)+bit_count(s2a^s2b)``
    on the candidates only; no all-pairs product anywhere.

    Returns (doc_a, doc_b, hamming). Scale note: band width here is
    ``64/(k+1)`` bits; for corpora where 2^band_width buckets collide too
    often (billions of docs), widen the fingerprint (128-bit SimHash, same
    construction) rather than shrinking k — the plan shape is unchanged.
    """
    n_bands = max_hamming + 1
    if max_hamming < 1 or 64 % n_bands:
        # max_hamming 0 would need one 64-bit band, which neither the
        # two-halves fingerprint nor a LongType mask can express — for
        # exact-duplicate fingerprints group by (s1, s2) directly
        raise ValueError(
            f"max_hamming must be >= 1 with max_hamming+1 dividing 64, "
            f"got {max_hamming}"
        )
    width = 64 // n_bands
    # r12 (guide §2.4): the fingerprint frame is consumed ONCE — candidate
    # pairs come from one groupBy((band index, band bits)) + in-row pair
    # expansion per bucket, replacing the posting⋈posting self-join that
    # computed the fingerprints on both sides (which is why this used to
    # need a persist) and shuffled them twice. Pair set and hamming values
    # are identical: same bands, same sorted-id a < b order, same
    # bit_count(xor) arithmetic on the carried fingerprints.
    fp = simhash64(df, id_col=id_col, text_col=text_col)

    def band(j: int) -> Column:
        # bands 0.. over s1 then s2; each half contributes 32/width bands
        half, off = ("s1", j) if j < 32 // width else ("s2", j - 32 // width)
        return (
            F.shiftright(F.col(half), off * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .cast("long")
        )

    posting = fp.select(
        F.col(id_col),
        F.col("s1"),
        F.col("s2"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("bidx"), band(j).alias("bval"))
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "s1", "s2", "b.bidx", "b.bval")

    buckets = (
        posting.groupBy("bidx", "bval")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), "s1", "s2"))
            ).alias("ms")
        )
        .filter(F.size("ms") >= 2)
    )
    pair_sql = (
        "flatten(transform(ms, (a, i) -> "
        "transform(slice(ms, i + 2, size(ms)), b -> named_struct("
        f"'doc_a', a.{id_col}, 'doc_b', b.{id_col}, "
        "'hamming', CAST(bit_count(a.s1 ^ b.s1) + bit_count(a.s2 ^ b.s2)"
        " AS INT)))))"
    )
    # materialized before explode — same 3×-evaluation fix as the
    # minhash pair expansion (r12 batch 2)
    from delta_kernel_rs_spark.operators.parallel import materialize_column as _mat

    return (
        _mat(buckets, F.expr(pair_sql), "__pairs")
        .select(F.explode(F.col("__pairs")).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def decontaminate_against(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with an evaluation set (the GPT-3/Pile-style overlap filter).

    Plan shape: both corpora explode to distinct n-grams; the eval side's
    DISTINCT gram set joins the train side's posting list — an equi-join
    on the gram string, never a cross product. At 100 TB the eval set is
    tiny next to the corpus, so Catalyst broadcasts it and contamination
    checking is map-side against the scan.

    Returns one row per CONTAMINATED train doc: (id, n_hits, first_gram)
    where n_hits counts distinct shared grams and first_gram is the
    lexicographically smallest (deterministic evidence). Clean docs are
    absent — callers anti-join to drop flagged docs.
    """
    def grams(df: DataFrame) -> DataFrame:
        from delta_kernel_rs_spark.operators.parallel import materialize_column

        ws = F.split(F.col(text_col), " ")
        # one materialized token array per row (see materialize_column)
        base = materialize_column(
            ensure_min_parallelism(df).filter(F.size(ws) >= n), ws, "__ws"
        )
        g = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("__ws") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__ws", i, n)),
            )
        )
        # materialize the gram array before exploding (r12 batch 2):
        # explode(expr) gets an inferred `size(expr)>0 AND isnotnull(expr)`
        # filter, so the inlined O(L) gram construction ran 3× per row
        base = materialize_column(base, g, "__g")
        return base.select(F.col(id_col), F.explode(F.col("__g")).alias("gram"))

    eval_grams = grams(eval_df).select("gram").distinct()
    # n_hits: plain count, not countDistinct — the per-doc gram array is
    # array_distinct'ed before the explode and the eval side is DISTINCT,
    # so each (doc, gram) survives the join at most once and the counts
    # are provably equal. countDistinct planned a second Expand/dedup
    # aggregation phase per group for nothing (r12, guide §2.4).
    return (
        grams(train_df)
        .join(eval_grams, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("gram").alias("first_gram"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    out: str = "fps",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).

    Hash every word ``k``-gram, slide a window of ``w`` consecutive gram
    hashes, and keep each window's minimum (ties → rightmost position, the
    paper's rule). The guarantee: any shared passage of at least
    ``k + w - 1`` words between two documents yields at least one shared
    selected hash — with only ~``2/(w+1)`` of the grams retained, so the
    inverted index downstream is ~w× smaller than a full shingle index.

    Plan shape: one codegen'd projection per document — nested
    higher-order-function folds, no shuffle, no Python. Documents shorter
    than ``k + w - 1`` words carry no fingerprints and are dropped.

    Returns ``(id_col, fps array<bigint>, n_fps)``.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    df = ensure_min_parallelism(df)
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    # both the token array and the gram-hash array are referenced
    # per-element in transform lambdas below — materialize each once per
    # row or CollapseProject re-runs the whole construction per element:
    # the O(L) gram array rebuilt per (window, offset) was a measured
    # O(L^2 w) blowup at 75 ms/doc (round-12 scale-growth find)
    df = materialize_column(df.filter(n >= k + w - 1), ws, "__ws")
    # gram hashes: H[i] = md5_32(words[i..i+k-1]), i = 1..n-k+1
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__ws") - (k - 1)),
        lambda i: md5_hash32(F.concat_ws(" ", F.slice("__ws", i, k))),
    )
    base = materialize_column(df, grams, "gh").select(F.col(id_col), "gh")
    # per window j (1-based), the (hash, -pos) minimum: struct ordering
    # gives the smallest hash, and the negated position breaks ties
    # toward the RIGHTMOST occurrence — both engines compare the same way
    selected = F.transform(
        F.sequence(F.lit(1), F.size(F.col("gh")) - (w - 1)),
        lambda j: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(w - 1)),
                lambda o: F.struct(
                    F.element_at(F.col("gh"), (j + o).cast("int")).alias("h"),
                    (-(j + o)).cast("long").alias("negpos"),
                ),
            )
        ),
    )
    fps = F.array_distinct(F.transform(selected, lambda s: s.getField("h")))
    # materialize the fingerprint array (r12 batch 2): aliased plainly,
    # the whole window-min fold is inlined into every downstream
    # reference — size() here, plus the posting explode's inferred
    # null/empty filter in winnowing_passage_pairs — i.e. up to three
    # evaluations of the O(L·w) selection per row. The Generate barrier
    # evaluates it once; downstream reads a plain attribute.
    return materialize_column(base, fps, out).select(
        id_col,
        out,
        F.size(out).alias("n_fps"),
    )


def winnowing_passage_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints.

    The passage-overlap dedup pass: unlike whole-document MinHash (p02),
    this catches documents that share *copied passages* while differing
    elsewhere — the dominant contamination/boilerplate mode in web
    corpora. Candidate generation is the inverted-index equi-join on the
    winnowed hash set (~w× smaller than a shingle index); fingerprints
    occurring in more than ``max_df`` documents are dropped first
    (boilerplate guard — the standard df-cap that keeps the posting-list
    self-join from going quadratic on hot passages; the cap is part of
    the operator's spec so the oracle replays it exactly).

    Output: (doc_a, doc_b, shared_fps, overlap) with doc_a < doc_b and
    overlap = shared / min(|fps_a|, |fps_b|).

    100 TB posture: one projection (fingerprints) → one explode → ONE
    hash-keyed aggregation that both applies the df-cap AND expands each
    surviving bucket to ordered pairs in-row (r12, guide §2.4 — the
    former shape paid a separate df-count aggregation, a filter join, a
    posting self-join that executed the fingerprint subtree on both
    sides, and the persist that self-join forced) → one pair
    aggregation. All shuffles on high-cardinality keys; the df-cap
    bounds every bucket at ``max_df`` members, so in-row pair fanout per
    hash is at most max_df² — constant, not corpus-sized. Fingerprint
    sets are distinct per document, so each document appears at most
    once per bucket and the sorted expansion reproduces exactly the
    join's ``doc_a < doc_b`` pairs; shared_fps = number of buckets
    emitting the pair, and each pair carries both ``n_fps`` sizes out of
    the bucket (the former size-lookup ``first`` aggregates now read
    carried fields).
    """
    fps = winnowing_fingerprints(df, id_col=id_col, text_col=text_col, k=k, w=w)
    posting = fps.select(F.col(id_col), "n_fps", F.explode("fps").alias("h"))
    buckets = (
        posting.groupBy("h")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col), "n_fps"))
            ).alias("ms")
        )
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_df))
    )
    pair_sql = (
        "flatten(transform(ms, (a, i) -> "
        "transform(slice(ms, i + 2, size(ms)), b -> named_struct("
        f"'doc_a', a.{id_col}, 'doc_b', b.{id_col}, "
        "'na', a.n_fps, 'nb', b.n_fps))))"
    )
    # materialized before explode — same 3×-evaluation fix as the
    # minhash pair expansion (r12 batch 2)
    from delta_kernel_rs_spark.operators.parallel import materialize_column as _mat

    pairs = (
        _mat(buckets, F.expr(pair_sql), "__pairs")
        .select(F.explode(F.col("__pairs")).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(
            F.count(F.lit(1)).alias("shared_fps"),
            F.first("p.na").alias("na"),
            F.first("p.nb").alias("nb"),
        )
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "shared_fps",
        (
            F.col("shared_fps").cast("double")
            / F.least(F.col("na"), F.col("nb"))
        ).alias("overlap"),
    )


def word_kgram_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(id, pos, g): md5 digest of the word k-gram starting at each
    0-based token position. The shared head of position-aware gram
    pipelines (duplicated_token_spans and the scale-growth probes count
    this exact frame). The token array is materialized once per row —
    inlined, the split would re-run per gram position (O(L^2) per doc;
    round-12 scale-growth find)."""
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    df = ensure_min_parallelism(df)
    ws = F.split(F.col(text_col), " ")
    df = materialize_column(df.filter(F.size(ws) >= k), ws, "__ws")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__ws") - (k - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice("__ws", i, k))),
    )
    # materialize the gram array before exploding (r12 batch 2):
    # posexplode(expr) gets an inferred `size(expr)>0 AND isnotnull(expr)`
    # filter, so the inlined O(L) md5-gram construction ran 3× per row
    df = materialize_column(df, grams, "__gr")
    return df.select(F.col(id_col), F.posexplode(F.col("__gr")).alias("pos", "g"))


def duplicated_token_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Exact substring-level dedup: the maximal duplicated token spans per
    document (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL'22 — ExactSubstr). A token position starts a
    duplicated region when its word ``k``-gram occurs at least twice
    ANYWHERE in the corpus (other documents or elsewhere in the same one);
    overlapping/adjacent hit windows merge into maximal spans, which is
    exactly the set ExactSubstr would cut.

    Unlike the suffix-array construction in the paper (single-machine,
    O(corpus) RAM), this is the distributed equivalent over k-gram
    anchors: any duplicated substring of >= k tokens contains a duplicated
    k-gram, so the merged spans cover every such substring.

    Plan shape (all relational, no Python): one projection hashes each
    position's k-gram (md5 — cross-engine deterministic, and the shuffle
    key is a 32-char digest instead of the k-word string); ONE g-keyed
    count window marks positions whose gram has global multiplicity >= 2
    (r12: replaces groupBy(gram)+join-back, which executed the gram
    projection twice); one doc-keyed aggregation merges hits into spans
    with an in-row sorted fold (gaps-and-islands: a new island starts
    when pos > prev_pos + k, since [p1, p1+k) and [p2, p2+k) are
    disjoint and non-touching exactly when p2 > p1 + k).

    100 TB posture: shuffles key on the gram digest (high cardinality) and
    on ``id_col``; posting lists are never self-joined, so a boilerplate
    gram with a million occurrences costs window fanout linear in its
    occurrences, never quadratic (the per-key window sort spills; the
    alternative broadcast of the duplicated-gram set would outgrow the
    broadcast cap at corpus scale). No driver materialization.

    Returns (id_col, span_start, span_end, span_tokens): token offsets
    with ``span_end`` exclusive, 0-based. Documents with no duplicated
    span are absent — callers join back to cut or drop.
    """
    pos_grams = word_kgram_positions(df, id_col=id_col, text_col=text_col, k=k)
    # Multiplicity as a count window over the gram digest (r12 batch 2,
    # guide §2.4): the former groupBy(g)+join-back executed the
    # md5-gram posexplode subtree TWICE (once under the count aggregate,
    # once on the join's probe side — self-joins re-execute their
    # subtree) and at corpus scale the "small" duplicated-gram set
    # outgrows a broadcast, degenerating into a second full shuffle of
    # the posting stream anyway. The window computes grams ONCE and pays
    # one g-keyed exchange; same-JVM A/B at sf0.1: 1.39 → 1.08 s.
    # Hit positions are identical (count >= 2 on the same key).
    hits = (
        pos_grams.withColumn(
            "n_occ", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .filter(F.col("n_occ") >= 2)
        .select(id_col, "pos")
    )
    # Gaps-and-islands per document in ONE doc-keyed aggregation (r12,
    # guide §2.4): collect the hit positions, sort in-row, and fold into
    # maximal spans — a new span starts exactly when pos > prev + k (the
    # same break rule the former lag window used), otherwise the last
    # span's end advances. Replaces lag-window + cumulative-sum window +
    # a (doc, island) re-aggregation (two exchanges + full sorts) with
    # one exchange; span values are identical integers.
    spans_sql = (
        "transform(aggregate(sort_array(ps), "
        "CAST(array() AS ARRAY<STRUCT<s: INT, l: INT>>), "
        "(acc, p) -> CASE WHEN size(acc) = 0 "
        f"OR p > element_at(acc, size(acc)).l + {k} "
        "THEN concat(acc, array(named_struct('s', p, 'l', p))) "
        "ELSE concat(slice(acc, 1, size(acc) - 1), "
        "array(named_struct('s', element_at(acc, size(acc)).s, 'l', p))) "
        f"END), sp -> named_struct('s', sp.s, 'e', sp.l + {k}))"
    )
    # spans fold materialized before explode — same 3×-evaluation fix as
    # the pair expansions (r12 batch 2): the O(hits)-per-doc fold was
    # inlined into the explode's inferred size/isnotnull filter too
    from delta_kernel_rs_spark.operators.parallel import materialize_column as _mat

    return (
        _mat(
            hits.groupBy(id_col).agg(F.collect_list("pos").alias("ps")),
            F.expr(spans_sql),
            "__spans",
        )
        .select(F.col(id_col), F.explode(F.col("__spans")).alias("sp"))
        .select(
            id_col,
            F.col("sp.s").alias("span_start"),
            F.col("sp.e").alias("span_end"),
            (F.col("sp.e") - F.col("sp.s")).alias("span_tokens"),
        )
    )
