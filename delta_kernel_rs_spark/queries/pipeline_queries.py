"""Oracle-checked LLM-data-pipeline queries (p-family; round-6
consolidation merged same-family entries into multi-arm queries — the
old-id → new-key mapping is in SURVEY.md §8).

Each query runs a pipeline operator from ``delta_kernel_rs_spark.operators``
over the driver's `documents` / `embeddings` fixture tables and has a
DuckDB ANSI-SQL twin producing the identical result set (same column names,
same dtypes, bit-exact values — see operators/hashing.py for the
cross-engine-deterministic constructions).

Oracle-equivalence notes:
- all integer hashing is BIGINT modular arithmetic seeded from MD5 hex —
  byte-identical in both engines;
- all floating-point outputs come from identical expression trees (explicit
  DOUBLE casts, left-fold aggregates in index order), so IEEE semantics
  make them bit-equal;
- p02's Spark side is MinHash-LSH candidate generation + exact verify while
  its oracle is the exact inverted-index similarity join: equality is the
  statement that LSH recall is total on this corpus (verified at sf0.01 and
  sf0.1; banding catch probability at j>=0.8 is 1-(1-j^4)^16 > 0.9998).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_kernel_rs_spark.operators.dedup import (
    exact_duplicate_groups,
    jaccard_pairs_exact,
    neardup_pairs_minhash,
    simhash,
)
from delta_kernel_rs_spark.operators.multimodal import (
    binary_meta,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from delta_kernel_rs_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_blocked,
    ivf_topk,
)
from delta_kernel_rs_spark.operators.text import (
    LANG_MARKERS,
    fingerprint_expr,
    lang_scores,
    quality_columns,
    token_stat_columns,
)
from delta_kernel_rs_spark.queries import register
from delta_kernel_rs_spark.queries.tables import load_table

# ---------------------------------------------------------------------------
# shared DuckDB SQL fragments


def _dk_fold_dot(a: str, b: str, dims: int = 64) -> str:
    """DuckDB left-fold dot product, same element order as the Spark fold."""
    return (
        f"list_reduce(list_transform(range(1,{dims + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE)), (acc,v) -> acc+v)"
    )


#: word k-shingle set in DuckDB: list_distinct over joined k-slices.
def _dk_shingles(k: int) -> str:
    return (
        f"list_distinct(list_transform(range(1, len(ws)-{k - 2}), "
        f"i -> array_to_string(ws[i:i+{k - 1}], ' ')))"
    )


# ---------------------------------------------------------------------------
# p01 exact dedup


def p01_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one survivor (min doc_id) + copy count per distinct text."""
    return exact_duplicate_groups(load_table(spark, sf_dir, "documents"))


register(
    "p01_doc_exact_dedup",
    p01_doc_exact_dedup,
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)

# ---------------------------------------------------------------------------
# p02 MinHash-LSH near-dup (oracle: exact inverted-index similarity join)


def p02_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: banded MinHash candidates + exact Jaccard verify."""
    return neardup_pairs_minhash(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.8
    )


def p02_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair mining, two banded algorithms (merged p02+p21):
    minhash — banded MinHash-LSH candidates + exact Jaccard >= 0.8 verify
    simhash — 64-bit SimHash hamming <= 3 via pigeonhole band buckets
    Neither is all-pairs; the oracles are the exact joins, so equality is
    the statement that both banding schemes have total recall here."""
    from delta_kernel_rs_spark.operators.dedup import simhash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    mh = neardup_pairs_minhash(docs, k=3, threshold=0.8).select(
        F.lit("minhash").alias("arm"),
        "doc_a",
        "doc_b",
        "jaccard",
        F.lit(None).cast("int").alias("hamming"),
    )
    sh = simhash_neardup_pairs(docs, max_hamming=3).select(
        F.lit("simhash").alias("arm"),
        "doc_a",
        "doc_b",
        F.lit(None).cast("double").alias("jaccard"),
        "hamming",
    )
    return mh.unionByName(sh)


def _dk_simhash_half(hv: str) -> str:
    return " + ".join(
        f"(CASE WHEN sum(CASE WHEN ({hv}>>{j})&1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    )


register(
    "p02_neardup_pairs",
    p02_neardup_pairs,
    f"""
    WITH d AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
    s AS (SELECT doc_id, {_dk_shingles(3)} sh FROM d WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, len(sh) n FROM s),
    e AS (SELECT doc_id, unnest(sh) g FROM s),
    pr AS (SELECT pa.doc_id da, pb.doc_id db, count(*) inter
           FROM e pa JOIN e pb ON pa.g = pb.g AND pa.doc_id < pb.doc_id
           GROUP BY 1, 2),
    w AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) word
          FROM documents),
    h AS (SELECT doc_id, ('0x'||substr(md5(word),1,8))::BIGINT hv1,
                         ('0x'||substr(md5(word),9,8))::BIGINT hv2 FROM w),
    f AS (SELECT doc_id, CAST({{s1}} AS BIGINT) s1, CAST({{s2}} AS BIGINT) s2
          FROM h GROUP BY doc_id)
    SELECT 'minhash' AS arm, da AS doc_a, db AS doc_b,
           CAST(inter AS DOUBLE)/(na.n + nb.n - inter) AS jaccard,
           CAST(NULL AS INTEGER) AS hamming
    FROM pr JOIN sz na ON da = na.doc_id JOIN sz nb ON db = nb.doc_id
    WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.8
    UNION ALL
    SELECT 'simhash', fa.doc_id, fb.doc_id, CAST(NULL AS DOUBLE),
           CAST(bit_count(xor(fa.s1, fb.s1))
                + bit_count(xor(fa.s2, fb.s2)) AS INTEGER)
    FROM f fa JOIN f fb ON fa.doc_id < fb.doc_id
    WHERE bit_count(xor(fa.s1, fb.s1)) + bit_count(xor(fa.s2, fb.s2)) <= 3
    """.replace("{s1}", _dk_simhash_half("hv1")).replace(
        "{s2}", _dk_simhash_half("hv2")
    ),
)

# ---------------------------------------------------------------------------
# p03 SimHash fingerprints


def p03_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fingerprints (merged p03+p10): 32-bit SimHash over distinct
    words plus the polynomial rolling-hash document fingerprint — both
    per-row expressions since the r12 map-only SimHash rewrite, so the
    whole query is ONE projection (the former doc_id self-join and the
    SimHash sum-aggregate shuffle are gone; values bit-identical,
    guide §2.4)."""
    from delta_kernel_rs_spark.operators.dedup import (
        _signbits_to_long_sql,
        simhash_columns,
    )
    from delta_kernel_rs_spark.operators.parallel import (
        ensure_min_parallelism,
        materialize_column,
    )

    docs = load_table(spark, sf_dir, "documents")
    hash_col, sums = simhash_columns("__dw", bits=32, halves=1)
    base = materialize_column(
        ensure_min_parallelism(docs.select("doc_id", "text")),
        F.expr("array_distinct(split(text, ' '))"),
        "__dw",
    )
    staged = materialize_column(
        materialize_column(base, hash_col, "__hv"), F.expr(sums), "__sums"
    )
    return staged.select(
        "doc_id",
        F.expr(_signbits_to_long_sql("__sums", 32)).alias("simhash"),
        fingerprint_expr("text").alias("fingerprint"),
    )


_SIMHASH_TERMS = " + ".join(
    f"(CASE WHEN sum(CASE WHEN (hv>>{j})&1 = 1 THEN 1 ELSE -1 END) > 0 "
    f"THEN {1 << j} ELSE 0 END)"
    for j in range(32)
)

register(
    "p03_simhash_fingerprints",
    p03_simhash_fingerprints,
    f"""
    WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) word
               FROM documents),
    h AS (SELECT doc_id, ('0x'||substr(md5(word),1,8))::BIGINT hv FROM w),
    sh AS (SELECT doc_id, CAST({_SIMHASH_TERMS} AS BIGINT) AS simhash
           FROM h GROUP BY doc_id)
    SELECT sh.doc_id, sh.simhash,
           list_reduce(
             [0]::BIGINT[] || list_transform(range(1, length(text)+1),
                                             i -> unicode(substr(text, i, 1))),
             (acc, c) -> (acc*31 + c) % 1000000007) AS fingerprint
    FROM sh JOIN documents USING (doc_id)
    """,
)

# ---------------------------------------------------------------------------
# p04 exact n-gram Jaccard similarity join, blocked by language


def p04_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard >= 0.5 pairs within language blocks (exact)."""
    return jaccard_pairs_exact(
        load_table(spark, sf_dir, "documents"),
        k=2,
        threshold=0.5,
        block_cols=["lang"],
    )


register(
    "p04_ngram_jaccard_blocked",
    p04_ngram_jaccard_blocked,
    f"""
    WITH d AS (SELECT doc_id, lang, string_split(text,' ') ws FROM documents),
    s AS (SELECT doc_id, lang, {_dk_shingles(2)} sh FROM d WHERE len(ws) >= 2),
    sz AS (SELECT doc_id, len(sh) n FROM s),
    e AS (SELECT doc_id, lang, unnest(sh) g FROM s),
    pr AS (SELECT pa.doc_id da, pb.doc_id db, count(*) inter
           FROM e pa JOIN e pb
             ON pa.g = pb.g AND pa.lang = pb.lang AND pa.doc_id < pb.doc_id
           GROUP BY 1, 2)
    SELECT da AS doc_a, db AS doc_b,
           CAST(inter AS DOUBLE)/(na.n + nb.n - inter) AS jaccard
    FROM pr JOIN sz na ON da = na.doc_id JOIN sz nb ON db = nb.doc_id
    WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.5
    """,
)

# ---------------------------------------------------------------------------
# p05 brute-force cosine top-k


_DK_NORM2 = _dk_fold_dot("embedding", "embedding")


def p05_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search, four arms (merged p05+p06+p25+srp):
    brute — exact top-5 cosine neighbors for query vectors vec_id < 8
    ivf   — IVF ANN: centroids = first 16 vectors, probe own bucket
    ivfq  — IVF probe scored on int8 codes of the normalized vectors
            (the 4×-compressed fine-scoring path)
    srp   — signed-random-projection LSH (Charikar hyperplane hash):
            8 deterministic md5-derived planes, equi-join on the
            signature bucket, exact cosine on candidates"""
    from delta_kernel_rs_spark.operators.similarity import (
        ivf_topk_quantized,
        srp_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    brute = cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5).select(
        F.lit("brute").alias("arm"),
        "query_id",
        F.lit(None).cast("long").alias("centroid_id"),
        "neighbor_id",
        "rank",
        F.col("cosine").alias("score"),
    )
    ivf = ivf_topk(emb, n_centroids=16, k=5).select(
        F.lit("ivf").alias("arm"),
        "query_id",
        "centroid_id",
        "neighbor_id",
        "rank",
        F.lit(None).cast("double").alias("score"),
    )
    ivfq = ivf_topk_quantized(emb, n_centroids=16, k=5).select(
        F.lit("ivfq").alias("arm"),
        "query_id",
        "centroid_id",
        "neighbor_id",
        "rank",
        F.col("qcos").alias("score"),
    )
    srp = srp_topk(emb, emb.filter(F.col("vec_id") < 8), n_planes=8, k=5).select(
        F.lit("srp").alias("arm"),
        "query_id",
        F.col("bucket").alias("centroid_id"),
        "neighbor_id",
        "rank",
        F.col("cosine").alias("score"),
    )
    return brute.unionByName(ivf).unionByName(ivfq).unionByName(srp)


def _dk_srp_bucket() -> str:
    """DuckDB expression rebuilding the identical SRP signature: the same
    md5-derived ±1 planes (operators/similarity.srp_signs), the same
    index-order fold."""
    from delta_kernel_rs_spark.operators.similarity import srp_signs

    bits = []
    for p, row in enumerate(srp_signs(8)):
        arr = "[" + ",".join(str(s) for s in row) + "]"
        dot = (
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i]), "
            f"(acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0.0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


register(
    "p05_embedding_topk",
    p05_embedding_topk,
    f"""
    WITH n AS (SELECT vec_id, embedding, {_DK_NORM2} norm2 FROM embeddings),
    srpb AS (SELECT vec_id, embedding, norm2, {_dk_srp_bucket()} AS bucket FROM n),
    bq AS (SELECT vec_id query_id, embedding qe, norm2 qn2 FROM n WHERE vec_id < 8),
    bp AS (SELECT query_id, n.vec_id neighbor_id,
                  {_dk_fold_dot("qe", "n.embedding")} / sqrt(qn2*norm2) cosine
           FROM bq, n WHERE n.vec_id != query_id),
    c AS (SELECT vec_id centroid_id, embedding ce, norm2 cn2 FROM n WHERE vec_id < 16),
    sc AS (SELECT n.vec_id, n.embedding, n.norm2, centroid_id,
                  {_dk_fold_dot("n.embedding", "ce")} / sqrt(n.norm2*cn2) ccos
           FROM n, c),
    asg AS (SELECT vec_id, embedding, norm2, centroid_id
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY ccos DESC, centroid_id) rr
                  FROM sc)
            WHERE rr = 1),
    iq AS (SELECT vec_id query_id, embedding qe, norm2 qn2, centroid_id
           FROM asg WHERE vec_id < 8),
    ipr AS (SELECT query_id, a.centroid_id, a.vec_id neighbor_id,
                   {_dk_fold_dot("qe", "a.embedding")} / sqrt(qn2*a.norm2) cosine
            FROM iq JOIN asg a USING(centroid_id)
            WHERE a.vec_id != query_id),
    nv AS (SELECT vec_id, centroid_id,
                  list_transform(embedding,
                                 x -> CAST(x AS DOUBLE)/sqrt(norm2)) AS nvec
           FROM asg),
    qsc AS (SELECT vec_id, centroid_id, nvec,
                   list_reduce(list_transform(nvec, x -> abs(x)),
                               (acc, v) -> greatest(acc, v))
                     / CAST(127 AS DOUBLE) AS qscale
            FROM nv),
    qc AS (SELECT vec_id, centroid_id, qscale,
                  list_transform(nvec,
                    x -> CAST(CASE WHEN qscale = 0.0 THEN 0.0
                              ELSE least(127.0, greatest(-127.0,
                                     floor(x/qscale + 0.5)))
                              END AS INTEGER)) AS qcodes
           FROM qsc),
    qpr AS (SELECT qq.vec_id query_id, bb.centroid_id, bb.vec_id neighbor_id,
                   CAST(list_reduce(
                          list_transform(range(1, len(qq.qcodes) + 1),
                            i -> CAST(qq.qcodes[i] AS BIGINT)*bb.qcodes[i]),
                          (acc, v) -> acc + v) AS DOUBLE)
                     * qq.qscale * bb.qscale AS qcos
            FROM qc qq JOIN qc bb USING (centroid_id)
            WHERE qq.vec_id < 8 AND bb.vec_id != qq.vec_id)
    SELECT 'brute' AS arm, query_id, CAST(NULL AS BIGINT) AS centroid_id,
           neighbor_id, CAST(rank AS INTEGER) AS rank, cosine AS score
    FROM (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) rank
          FROM bp)
    WHERE rank <= 5
    UNION ALL
    SELECT 'ivf', query_id, centroid_id, neighbor_id,
           CAST(rank AS INTEGER), CAST(NULL AS DOUBLE)
    FROM (SELECT query_id, centroid_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) rank
          FROM ipr)
    WHERE rank <= 5
    UNION ALL
    SELECT 'ivfq', query_id, centroid_id, neighbor_id,
           CAST(rnk AS INTEGER), qcos
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY qcos DESC, neighbor_id) rnk
          FROM qpr)
    WHERE rnk <= 5
    UNION ALL
    SELECT 'srp', query_id, bucket, neighbor_id, CAST(rnk AS INTEGER), cosine
    FROM (SELECT query_id, bucket, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) rnk
          FROM (SELECT q.vec_id AS query_id, q.bucket,
                       c.vec_id AS neighbor_id,
                       {_dk_fold_dot("q.embedding", "c.embedding")}
                         / sqrt(q.norm2 * c.norm2) AS cosine
                FROM srpb q JOIN srpb c USING (bucket)
                WHERE q.vec_id < 8 AND c.vec_id != q.vec_id))
    WHERE rnk <= 5
    """,
)

# ---------------------------------------------------------------------------
# p07 language ID heuristic


def p07_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text signals (merged p07+p08): marker-word language scores
    + argmax prediction, and length/diversity features + combined [0,1]
    quality score — one projection over one scan, all codegen'd."""
    df = load_table(spark, sf_dir, "documents")
    lang_cols = lang_scores("text")
    q_cols = quality_columns("text")
    return df.select(
        "doc_id",
        "lang",
        *[col.alias(name) for name, col in lang_cols.items()],
        *[col.alias(name) for name, col in q_cols.items()],
    )


_DK_WS = "string_split(text,' ')"
_DK_NW = f"len({_DK_WS})"
_DK_TTR = f"CAST(len(list_distinct({_DK_WS})) AS DOUBLE) / {_DK_NW}"
_DK_AWL = (
    f"CAST(list_reduce(list_transform({_DK_WS}, w -> length(w)), "
    f"(acc,v) -> acc+v) AS DOUBLE) / {_DK_NW}"
)

_DK_QUALITY_COLS = f"""
           CAST({_DK_NW} AS INTEGER) AS n_words,
           {_DK_TTR} AS ttr,
           {_DK_AWL} AS avg_word_len,
           CAST(0.4 AS DOUBLE)*({_DK_TTR})
             + CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE),
                 CAST({_DK_NW} AS DOUBLE)/CAST(128.0 AS DOUBLE))
             + CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE),
                 ({_DK_AWL})/CAST(8.0 AS DOUBLE)) AS quality_score
"""


def _dk_lang_quality_sql() -> str:
    hit_cols, keys = [], []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lits = ", ".join(f"'{m}'" for m in markers)
        hits = (
            f"len(list_filter(string_split(text,' '), "
            f"w -> list_contains([{lits}], w)))"
        )
        hit_cols.append(f"CAST({hits} AS INTEGER) AS hits_{lang}")
        keys.append(f"concat(lpad(CAST(1000000 - {hits} AS VARCHAR), 7, '0'), '{lang}')")
    return (
        "SELECT doc_id, lang, "
        + ", ".join(hit_cols)
        + f", substr(least({', '.join(keys)}), 8) AS pred_lang, "
        + _DK_QUALITY_COLS
        + " FROM documents"
    )


register("p07_lang_quality", p07_lang_quality, _dk_lang_quality_sql())

# ---------------------------------------------------------------------------
# p09 token stats


def p09_token_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc accounting (merged p09+p19): whitespace/regex/BPE-bound
    token counts joined with Gopher-style repetition signals (duplicate-
    word fraction, top-bigram and duplicated-trigram character coverage)
    on doc_id."""
    from delta_kernel_rs_spark.operators.parallel import (
        ensure_min_parallelism,
        materialize_column,
    )
    from delta_kernel_rs_spark.operators.text import repetition_signal_columns

    # r12 (guide §2.4): token stats and repetition signals are both
    # per-row expressions over the same scan — computing them in ONE
    # projection removes the former doc_id self-join (two exchanges +
    # three more inside the old explode-based repetition pipeline).
    # Results are bit-identical (same expression trees; the fold-based
    # gram counts are pinned by the oracle gate).
    df = materialize_column(
        ensure_min_parallelism(load_table(spark, sf_dir, "documents")),
        F.split(F.col("text"), " "),
        "__ws",
    )
    cols = token_stat_columns("text")
    cols.update(repetition_signal_columns("__ws", "text"))
    return df.select(
        "doc_id", *[col.alias(name) for name, col in cols.items()]
    )


register(
    "p09_token_repetition",
    p09_token_repetition,
    f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len({_DK_WS}) AS INTEGER) AS n_tokens_ws,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_tokens_re,
             CAST(list_reduce(list_transform({_DK_WS}, w -> (length(w)+3)//4),
                              (acc,v) -> acc+v) AS BIGINT) AS n_tokens_bpe,
             CAST(length(text) AS DOUBLE)
               / len(regexp_extract_all(text, '[a-z0-9]+')) AS chars_per_token
      FROM documents),
    d AS (SELECT doc_id, string_split(text,' ') ws, length(text) nc
          FROM documents),
    w AS (SELECT doc_id, nc,
                 CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)/len(ws)
                   AS dup_word_frac
          FROM d),
    b2 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(ws)),
                         i -> ws[i] || ' ' || ws[i+1])) g
           FROM d WHERE len(ws) >= 2),
    c2 AS (SELECT doc_id, g, count(*) c FROM b2 GROUP BY 1, 2),
    t2 AS (SELECT doc_id, c, g FROM (
             SELECT doc_id, c, g,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY c DESC, g DESC) rn
             FROM c2) WHERE rn = 1),
    b3 AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(ws) - 1),
                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) g
           FROM d WHERE len(ws) >= 3),
    c3 AS (SELECT doc_id, g, count(*) c FROM b3 GROUP BY 1, 2),
    t3 AS (SELECT doc_id,
                  sum(CASE WHEN c > 1 THEN c * length(g) END) dup_chars
           FROM c3 GROUP BY doc_id)
    SELECT tok.doc_id, tok.n_tokens_ws, tok.n_tokens_re, tok.n_tokens_bpe,
           tok.chars_per_token, dup_word_frac,
           COALESCE(CAST(t2.c * length(t2.g) AS DOUBLE)/w.nc, 0.0)
             AS top_bigram_char_frac,
           COALESCE(CAST(t3.dup_chars AS DOUBLE)/w.nc, 0.0)
             AS dup_trigram_char_frac
    FROM tok JOIN w ON tok.doc_id = w.doc_id
    LEFT JOIN t2 ON tok.doc_id = t2.doc_id
    LEFT JOIN t3 ON tok.doc_id = t3.doc_id
    """,
)

# ---------------------------------------------------------------------------
# p11 multimodal binary metadata (mapInPandas plumbing)


def p11_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fan-out, all three stages oracle-checked (round-6
    verdict, next #6): Arrow-batched metadata extraction, bounded-output
    thumbnail resize, and one-row-per-frame sampling — the stubs are
    deterministic byte arithmetic, so the DuckDB twin reconstructs the
    exact thumbnail/frame bytes with substring-on-hex math."""
    df = with_binary_payload(load_table(spark, sf_dir, "documents"))
    meta = binary_meta(df).select(
        F.lit("meta").alias("arm"),
        "doc_id",
        F.lit(0).cast("long").alias("idx"),
        F.col("n_bytes").alias("bytes_out"),
        F.col("header").alias("sig"),
        F.col("fake_width").alias("w"),
        F.col("fake_height").alias("h"),
    )
    # 64x48 stub thumbnail: 8-byte dim header + stride-sampled payload,
    # output bounded at 56 bytes/row regardless of input size
    thumbs = resize_images(df, 64, 48).select(
        F.lit("resize").alias("arm"),
        "doc_id",
        F.lit(0).cast("long").alias("idx"),
        F.col("thumb_bytes").alias("bytes_out"),
        # first two SAMPLED bytes (positions 0 and stride of the source)
        F.lower(F.hex(F.substring(F.col("thumb"), 9, 2))).alias("sig"),
        F.lit(64).cast("long").alias("w"),
        F.lit(48).cast("long").alias("h"),
    )
    # 4-frame uniform sampling: one output row per (doc, frame)
    frames = sample_frames(df, 4).select(
        F.lit("frames").alias("arm"),
        "doc_id",
        F.col("frame_idx").cast("long").alias("idx"),
        F.length("frame").cast("long").alias("bytes_out"),
        F.lower(F.hex(F.substring(F.col("frame"), 1, 4))).alias("sig"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("h"),
    )
    return meta.unionByName(thumbs).unionByName(frames)


register(
    "p11_multimodal_meta",
    p11_multimodal_meta,
    """
    WITH src AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n,
             lower(hex(encode(text))) AS hx
      FROM documents),
    rz AS (
      SELECT doc_id, n, hx, greatest(1, n // 48) AS stride FROM src),
    fr AS (
      SELECT doc_id, n, hx, greatest(1, n // 4) AS seg, unnest(range(4)) AS i
      FROM src)
    SELECT 'meta' AS arm, doc_id, CAST(0 AS BIGINT) AS idx,
           CAST(n AS BIGINT) AS bytes_out,
           substr(hx, 1, 8) AS sig,
           CAST(n % 640 AS BIGINT) AS w,
           CAST((n * 7) % 480 AS BIGINT) AS h
    FROM src
    UNION ALL
    SELECT 'resize', doc_id, CAST(0 AS BIGINT),
           CAST(8 + least(48, (n + stride - 1) // stride) AS BIGINT),
           substr(hx, 1, 2) ||
             CASE WHEN n > stride THEN substr(hx, stride*2 + 1, 2) ELSE '' END,
           CAST(64 AS BIGINT), CAST(48 AS BIGINT)
    FROM rz
    UNION ALL
    SELECT 'frames', doc_id, CAST(i AS BIGINT),
           CAST(least(seg, n - i*seg) AS BIGINT),
           substr(hx, i*seg*2 + 1, least(4, least(seg, n - i*seg))*2),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM fr WHERE i*seg < n
    """,
)

# ---------------------------------------------------------------------------
# p12 embedding-cosine near-dup, blocked

#: dot of the pre-normalized vectors — mirrors the Spark side's
#: normalize-once-then-bare-fold pair scoring (operators/similarity.py).
_dk_fold_norm_dot = (
    "list_reduce(list_transform(range(1,65), i -> a.nvec[i]*b.nvec[i]), "
    "(acc,v) -> acc+v)"
)


def p12_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pairs with cosine >= 0.4 inside label blocks."""
    return embedding_neardup_blocked(
        load_table(spark, sf_dir, "embeddings"), block_col="label", threshold=0.4
    )


register(
    "p12_embedding_neardup_blocked",
    p12_embedding_neardup_blocked,
    f"""
    WITH m AS (SELECT vec_id, label, embedding, {_DK_NORM2} norm2 FROM embeddings),
    n AS (SELECT vec_id, label,
                 list_transform(embedding,
                                x -> CAST(x AS DOUBLE)/sqrt(norm2)) nvec
          FROM m)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS block,
           {_dk_fold_norm_dot} AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_dk_fold_norm_dot} >= 0.4
    """,
)

# ---------------------------------------------------------------------------
# p13 end-to-end prep pass: dedup -> quality filter -> token accounting


def p13_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed shape of a real training-data prep pass: exact dedup
    survivors -> quality-score gate -> token accounting, all in one lazy
    plan (dedup is a semi-join against the survivor set, so Catalyst keeps
    a single pipeline with two shuffles total)."""
    from delta_kernel_rs_spark.operators.dedup import exact_duplicate_groups
    from delta_kernel_rs_spark.operators.text import quality_columns, token_stat_columns

    docs = load_table(spark, sf_dir, "documents")
    survivors = exact_duplicate_groups(docs).select("doc_id")
    quality = quality_columns("text")
    tokens = token_stat_columns("text")
    return (
        docs.join(survivors, "doc_id", "left_semi")
        .select(
            "doc_id",
            quality["quality_score"].alias("quality_score"),
            tokens["n_tokens_re"].alias("n_tokens"),
            tokens["chars_per_token"].alias("chars_per_token"),
        )
        .filter(F.col("quality_score") >= 0.55)
    )


_DK_SCORE = (
    f"CAST(0.4 AS DOUBLE)*({_DK_TTR}) "
    f"+ CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE), "
    f"CAST({_DK_NW} AS DOUBLE)/CAST(128.0 AS DOUBLE)) "
    f"+ CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE), ({_DK_AWL})/CAST(8.0 AS DOUBLE))"
)

register(
    "p13_pipeline_end_to_end",
    p13_pipeline_end_to_end,
    f"""
    WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
    SELECT doc_id,
           {_DK_SCORE} AS quality_score,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '[a-z0-9]+')) AS chars_per_token
    FROM documents
    WHERE doc_id IN (SELECT doc_id FROM surv) AND {_DK_SCORE} >= 0.55
    """,
)

# ---------------------------------------------------------------------------
# p14 PII scrubbing (regex detection + redaction, RE2-compatible subset)


def p14_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect + redact emails / IPv4s / phone numbers.

    The synthetic corpus carries no natural PII, so the query first
    injects a deterministic contact line per document (both engines build
    the identical string); the scrubber then has known-positive text. The
    operator itself (operators/text.py pii_columns) is pure codegen'd
    regex — at 100 TB this is a map-only pass, no shuffle."""
    from delta_kernel_rs_spark.operators.text import pii_columns

    df = load_table(spark, sf_dir, "documents")
    injected = df.withColumn(
        "with_pii",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-0199 from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ),
    )
    cols = pii_columns("with_pii")
    return injected.select(
        "doc_id",
        cols["n_email"].alias("n_email"),
        cols["n_ipv4"].alias("n_ipv4"),
        cols["n_phone"].alias("n_phone"),
        F.md5(cols["redacted"]).alias("redacted_md5"),
    )


_DK_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_DK_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_DK_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"

register(
    "p14_pii_scrub",
    p14_pii_scrub,
    f"""
    WITH inj AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-0199 from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               AS with_pii
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(with_pii, '{_DK_PII_EMAIL}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(with_pii, '{_DK_PII_IP}')) AS INTEGER) AS n_ipv4,
           CAST(len(regexp_extract_all(with_pii, '{_DK_PII_PHONE}')) AS INTEGER) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(with_pii,
                 '{_DK_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_DK_PII_IP}', '<IP>', 'g'),
                 '{_DK_PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM inj
    """,
)

# ---------------------------------------------------------------------------
# p15 deterministic sampling + per-group cap (curation reservoir)


def p15_sampling_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curation sampling, four arms (merged p15+p27+split+dsir):
    strat — ~50% md5-hash sample then at most 40 docs per language in md5
            order (cap-per-group reservoir; one window shuffle)
    mix   — per-language mixture rates (all zh, 90% en, half de/fr, a
            quarter es) as md5-prefix thresholds: map-only, no RNG,
            stable under any cluster layout and corpus growth
    split — stratified train/val/test assignment (90/5/5 EXACT per
            source stratum, md5-ranked; one window shuffle)
    dsir  — DSIR-style importance selection against the lang='en' target
            (hashed-ngram target/raw ratio in integer micro-units; 256-row
            bucket aggregate broadcast back map-only, threshold selection
            with NO global rank — operators/sampling.dsir_importance)."""
    from delta_kernel_rs_spark.operators.sampling import (
        cap_per_group,
        deterministic_sample,
        dsir_importance,
        stratified_split,
        weighted_mixture_sample,
    )

    df = load_table(spark, sf_dir, "documents")
    nx = F.lit(None).cast("string").alias("extra")
    sampled = deterministic_sample(df, "doc_id", "8")  # md5 hex < '8' → ~50%
    strat = cap_per_group(sampled, ["lang"], "doc_id", 40).select(
        F.lit("strat").alias("arm"), "doc_id", "lang", "source", nx
    )
    mix = weighted_mixture_sample(
        df,
        "lang",
        {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 1.0},
        "doc_id",
    ).select(F.lit("mix").alias("arm"), "doc_id", "lang", "source", nx)
    split = stratified_split(
        df, ["source"], "doc_id",
        [("train", 0.9), ("val", 0.05), ("test", 0.05)],
    ).select(
        F.lit("split").alias("arm"), "doc_id", "lang", "source",
        F.col("split").alias("extra"),
    )
    # keep_cols ride the map-only scoring projection (r12): the former
    # join-back on doc_id re-read the corpus for two columns
    dsir = (
        dsir_importance(df, F.col("lang") == "en", keep_cols=("lang", "source"))
        .filter("selected")
        .select(
            F.lit("dsir").alias("arm"), "doc_id", "lang", "source",
            F.col("importance_micro").cast("string").alias("extra"),
        )
    )
    return strat.unionByName(mix).unionByName(split).unionByName(dsir)


register(
    "p15_sampling_mixture",
    p15_sampling_mixture,
    """
    SELECT 'strat' AS arm, doc_id, lang, source,
           CAST(NULL AS VARCHAR) AS extra FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8')
    WHERE rn <= 40
    UNION ALL
    SELECT 'mix', doc_id, lang, source, CAST(NULL AS VARCHAR) FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN 'e666' WHEN 'de' THEN '8000'
                    WHEN 'fr' THEN '8000' WHEN 'es' THEN '4000'
                    WHEN 'zh' THEN 'g' ELSE '0000' END
    UNION ALL
    SELECT 'split', doc_id, lang, source,
           CASE WHEN rn <= CEIL(CAST(0.9 AS DOUBLE) * n) THEN 'train'
                WHEN rn <= CEIL((CAST(0.9 AS DOUBLE) + CAST(0.05 AS DOUBLE)) * n)
                  THEN 'val'
                ELSE 'test' END
    FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents)
    UNION ALL
    SELECT 'dsir', t.doc_id, d.lang, d.source,
           CAST(importance_micro AS VARCHAR)
    FROM (
      WITH w AS (SELECT doc_id, lang = 'en' AS tgt,
                        unnest(string_split(text, ' ')) AS word
                 FROM documents),
      e AS (SELECT doc_id, tgt,
                   ('0x'||substr(md5(word),1,8))::BIGINT % 256 AS b
            FROM w WHERE word <> ''),
      c AS (SELECT b, count(*) AS raw_cnt,
                   count(*) FILTER (WHERE tgt) AS tgt_cnt
            FROM e GROUP BY b)
      SELECT doc_id, count(*) AS n_tokens,
             CAST(SUM(CAST(ROUND(1000000.0*(tgt_cnt+1)/(raw_cnt+1))
                           AS BIGINT)) AS BIGINT) AS importance_micro
      FROM e JOIN c USING (b) GROUP BY doc_id) t
    JOIN documents d USING (doc_id)
    WHERE importance_micro * 1.0 / n_tokens >= 1000000.0
    """,
)

# ---------------------------------------------------------------------------
# p16 KMV distinct sketch (cross-engine-deterministic cardinality estimate)


def p16_kmv_distinct_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-word cardinality per language via the KMV sketch
    (operators/sketch.py). HLL-style sketches can never hash-match across
    engines; KMV's md5-ordered k-minimum construction gives the identical
    estimate in Spark and DuckDB — a real approximate-distinct operator
    that still passes the bit-exact oracle gate."""
    from delta_kernel_rs_spark.operators.sketch import kmv_distinct_estimate

    df = load_table(spark, sf_dir, "documents")
    words = df.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    return kmv_distinct_estimate(words, ["lang"], "word", k=64)


register(
    "p16_kmv_distinct_words",
    p16_kmv_distinct_words,
    """
    WITH dist AS (
      SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS word
      FROM documents),
    hashed AS (
      SELECT lang, word,
             list_reduce(
               [0]::BIGINT[] || list_transform(
                 string_split(substr(md5(word), 1, 8), ''),
                 ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
               (acc, v) -> acc * 16 + v) AS h
      FROM dist),
    ranked AS (
      SELECT lang, h,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, word) AS rn
      FROM hashed)
    SELECT lang,
           CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                ELSE CAST(63.0 AS DOUBLE) * CAST(4294967296.0 AS DOUBLE)
                     / CAST(max(h) AS DOUBLE) END AS n_distinct_est,
           CAST(count(*) AS INTEGER) AS n_kept
    FROM ranked WHERE rn <= 64 GROUP BY lang
    """,
)

# ---------------------------------------------------------------------------
# p17 top-k bigrams (corpus n-gram statistics)


def p17_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 word bigrams: the n-gram statistics pass of a
    training-data pipeline. explode → one count shuffle (map-side partial
    aggregation) → global top-k; ties break on the bigram string so the
    result is a pure function of the corpus."""
    from delta_kernel_rs_spark.operators.parallel import ensure_min_parallelism

    df = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    ws = "split(text, ' ')"
    # zip_with over the two shifted slices pairs adjacent words in ONE
    # array pass — never element_at(split(...), i) inside a lambda, which
    # re-splits the text per element (O(n²) per document). A single-word
    # doc yields an empty zip (slice length 0), matching DuckDB's empty
    # range(1, 1). r13 re-A/B (VERDICT #5): the r12 materialize-before-
    # explode barrier was REVERTED here — same-JVM alternating min-of-6
    # measured inline 0.676 s vs materialized 0.709 s with inline ahead
    # in 5 of 6 pairs (the driver's r12 bench showed the same −16%); a
    # single explode consumer doesn't re-evaluate enough to pay for the
    # extra Generate.
    bigrams = df.select("text").select(
        F.explode(
            F.expr(
                f"zip_with(slice({ws}, 1, size({ws}) - 1), "
                f"slice({ws}, 2, size({ws}) - 1), "
                f"(a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


register(
    "p17_top_bigrams",
    p17_top_bigrams,
    """
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))
             AS bigram
      FROM documents)
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)

# ---------------------------------------------------------------------------
# p18 near-duplicate clusters (connected components over MinHash-LSH pairs)


def p18_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate clusters: hash-min label propagation over
    the p02 pair graph (operators/cluster.py). The oracle is a DuckDB
    recursive CTE computing the identical min-reachable-id labels over
    the exact-Jaccard pair graph."""
    from delta_kernel_rs_spark.operators.cluster import neardup_clusters

    pairs = neardup_pairs_minhash(
        load_table(spark, sf_dir, "documents"), k=3, threshold=0.8
    )
    return neardup_clusters(pairs)


register(
    "p18_neardup_clusters",
    p18_neardup_clusters,
    f"""
    WITH RECURSIVE
    d AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
    s AS (SELECT doc_id, {_dk_shingles(3)} sh FROM d WHERE len(ws) >= 3),
    sz AS (SELECT doc_id, len(sh) n FROM s),
    e AS (SELECT doc_id, unnest(sh) g FROM s),
    pr AS (SELECT pa.doc_id da, pb.doc_id db, count(*) inter
           FROM e pa JOIN e pb ON pa.g = pb.g AND pa.doc_id < pb.doc_id
           GROUP BY 1, 2),
    pairs AS (
      SELECT da, db FROM pr
      JOIN sz na ON da = na.doc_id JOIN sz nb ON db = nb.doc_id
      WHERE CAST(inter AS DOUBLE)/(na.n + nb.n - inter) >= 0.8),
    edges AS (SELECT da a, db b FROM pairs
              UNION ALL SELECT db, da FROM pairs),
    reach(node, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT ed.b, r.lbl FROM reach r JOIN edges ed ON ed.a = r.node),
    lab AS (SELECT node, min(lbl) cluster_id FROM reach GROUP BY node)
    SELECT node AS doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM lab
    """,
)

# ---------------------------------------------------------------------------
# p20 int8 embedding quantization (exact reconstruction-error accounting)


def p20_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding: scale, code checksums,
    saturation count, exact L2/max reconstruction error — one map-only
    projection (operators/similarity.py quantize_int8)."""
    from delta_kernel_rs_spark.operators.similarity import quantize_int8

    return quantize_int8(load_table(spark, sf_dir, "embeddings"))


register(
    "p20_int8_quantization",
    p20_int8_quantization,
    """
    WITH s AS (
      SELECT vec_id, embedding,
             list_reduce(list_transform(embedding,
                                        x -> abs(CAST(x AS DOUBLE))),
                         (acc, v) -> greatest(acc, v))
               / CAST(127 AS DOUBLE) AS scale
      FROM embeddings),
    c AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
               x -> CAST(CASE WHEN scale = 0.0 THEN 0.0
                         ELSE least(127.0, greatest(-127.0,
                                floor(CAST(x AS DOUBLE)/scale + 0.5)))
                         END AS INTEGER)) AS codes
      FROM s),
    e AS (
      SELECT vec_id, scale, codes,
             list_transform(range(1, len(codes) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    - CAST(codes[i] AS DOUBLE)*scale) AS err
      FROM c)
    SELECT vec_id, scale,
           list_reduce(list_transform(codes, c -> CAST(c AS BIGINT)),
                       (acc, v) -> acc + v) AS code_sum,
           list_reduce(list_transform(range(1, len(codes) + 1),
                                      i -> CAST(codes[i] AS BIGINT)*i),
                       (acc, v) -> acc + v) AS code_poshash,
           CAST(len(list_filter(codes, c -> abs(c) = 127)) AS INTEGER)
             AS n_saturated,
           sqrt(list_reduce(list_transform(err, x -> x*x),
                            (acc, v) -> acc + v)) AS l2_err,
           list_reduce(list_transform(err, x -> abs(x)),
                       (acc, v) -> greatest(acc, v)) AS max_err
    FROM e
    """,
)

# ---------------------------------------------------------------------------
# p22 sliding context-window chunking (training-prep tokenized windows)


def p22_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks every 48 tokens per document, 1-based start offsets
    (operators/text.py chunk_documents). Map-only: split + sequence explode."""
    from delta_kernel_rs_spark.operators.text import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), window=64, stride=48
    )


register(
    "p22_context_chunks",
    p22_context_chunks,
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    s AS (SELECT doc_id, ws, len(ws) n,
                 unnest(range(1, len(ws) + 1, 48)) st
          FROM d)
    SELECT doc_id,
           CAST((st - 1) // 48 AS INTEGER) AS chunk_idx,
           CAST(st AS INTEGER) AS start_token,
           CAST(least(64, n - st + 1) AS INTEGER) AS n_tokens,
           array_to_string(ws[st:st+63], ' ') AS chunk_text
    FROM s
    """,
)

# ---------------------------------------------------------------------------
# p23 TF-IDF top terms per document


def p23_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: ranked by (tf/doc_len)*ln(N/df)
    (operators/text.py tfidf_top_terms). The JVM's Math.log and DuckDB's
    libm ln differ in the last ulp, so the double score itself is not
    hash-comparable — the checked output is the integer surface
    (rank, term, tf, df, doc_len). Ranking robustness: distinct
    (tf, df) inputs CAN in principle score mathematically equal
    ((N/d1)^t1 == (N/d2)^t2 has integer solutions) — verified absent on
    both gate corpora, where the smallest relative gap between distinct
    within-doc scores is ~6e-4, twelve orders of magnitude above the
    ~4e-16 cross-engine ln error band (scripts-level exhaustive check)."""
    from delta_kernel_rs_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), top_k=3).drop(
        "tfidf"
    )


register(
    "p23_tfidf_top_terms",
    p23_tfidf_top_terms,
    """
    WITH w AS (SELECT doc_id, len(string_split(text, ' ')) doc_len,
                      unnest(string_split(text, ' ')) term
               FROM documents),
    tf AS (SELECT doc_id, doc_len, term, count(*) ctf
           FROM w GROUP BY 1, 2, 3),
    dfq AS (SELECT term, count(*) cdf FROM tf GROUP BY 1),
    n AS (SELECT count(*) n_docs FROM documents),
    s AS (SELECT doc_id, term, ctf, cdf, doc_len,
                 (CAST(ctf AS DOUBLE)/doc_len)
                   * ln(CAST(n_docs AS DOUBLE)/cdf) AS tfidf
          FROM tf JOIN dfq USING (term), n)
    SELECT doc_id, CAST(rnk AS INTEGER) AS rank, term,
           CAST(ctf AS BIGINT) AS tf, CAST(cdf AS BIGINT) AS df,
           CAST(doc_len AS INTEGER) AS doc_len
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) rnk
          FROM s)
    WHERE rnk <= 3
    """,
)

# ---------------------------------------------------------------------------
# p24 sequence packing (next-fit token bins, shard-parallel)


def p24_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 256-token next-fit bins within doc_id%8 shards
    (operators/packing.py pack_documents — applyInPandas per shard; the
    oracle replays the identical fold as a recursive CTE)."""
    from delta_kernel_rs_spark.operators.packing import pack_documents

    return pack_documents(
        load_table(spark, sf_dir, "documents"), capacity=256, n_shards=8
    )


def _register_p24() -> None:
    from delta_kernel_rs_spark.operators.packing import dk_pack_oracle_sql

    register("p24_sequence_packing", p24_sequence_packing,
             dk_pack_oracle_sql(capacity=256, n_shards=8))


_register_p24()

# ---------------------------------------------------------------------------
# p26 benchmark decontamination (train/eval n-gram overlap filter)


def p26_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs (doc_id % 10 != 0) sharing any word 8-gram with
    the held-out eval slice (doc_id % 10 = 0) — the GPT-3/Pile overlap
    filter (operators/dedup.py decontaminate_against)."""
    from delta_kernel_rs_spark.operators.dedup import decontaminate_against

    docs = load_table(spark, sf_dir, "documents")
    return decontaminate_against(
        docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"), n=8
    )


register(
    "p26_decontamination",
    p26_decontamination,
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    tg AS (SELECT doc_id, unnest({_dk_shingles(8)}) gram
           FROM d WHERE doc_id % 10 != 0 AND len(ws) >= 8),
    eg AS (SELECT DISTINCT unnest({_dk_shingles(8)}) gram
           FROM d WHERE doc_id % 10 = 0 AND len(ws) >= 8)
    SELECT doc_id, count(DISTINCT tg.gram) AS n_hits,
           min(tg.gram) AS first_gram
    FROM tg JOIN eg USING (gram)
    GROUP BY doc_id
    """,
)


# ---------------------------------------------------------------------------
# p29 token-budget mixture fill (training-mix assembly planning)


def p29_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a 60k-token budget at en:3 de:1 fr:1 weights: per-language
    quotas, then documents admitted in md5 order until the running
    regex-token total would exceed the quota (operators/sampling.py
    token_budget_fill). The selected set is a pure function of (corpus,
    budget, weights) — re-runs and cluster layouts cannot change it."""
    from delta_kernel_rs_spark.operators.sampling import token_budget_fill

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    out = token_budget_fill(
        docs.withColumn("n_tokens", n_tokens),
        "lang",
        "n_tokens",
        "doc_id",
        budget_tokens=60_000,
        weights={"en": 3.0, "de": 1.0, "fr": 1.0},
    )
    return out.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "cum_tokens",
        "quota_tokens",
    )


register(
    "p29_token_budget_fill",
    p29_token_budget_fill,
    """
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens,
             CASE lang WHEN 'en' THEN 36000 WHEN 'de' THEN 12000
                       WHEN 'fr' THEN 12000 END AS quota_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens, quota_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t WHERE quota_tokens IS NOT NULL)
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(quota_tokens AS BIGINT) AS quota_tokens
    FROM c WHERE cum_tokens <= quota_tokens
    """,
)

# ---------------------------------------------------------------------------
# p28 winnowing passage fingerprints (copied-passage dedup pairs)


def p28_winnowing_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing copied passages, found via winnowing
    fingerprints (Schleimer et al., SIGMOD'03 — operators/dedup.py
    winnowing_passage_pairs): any shared run of >= k+w-1 words guarantees
    a shared selected hash, with only ~2/(w+1) of the grams indexed.
    The oracle replays the identical k-gram hash / window-min (rightmost
    tie) / df-cap / posting-join pipeline in DuckDB."""
    from delta_kernel_rs_spark.operators.dedup import winnowing_passage_pairs

    return winnowing_passage_pairs(
        load_table(spark, sf_dir, "documents"), k=4, w=4, min_shared=2, max_df=50
    )


register(
    "p28_winnowing_passages",
    p28_winnowing_passages,
    """
    WITH d AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
    g AS (SELECT doc_id,
            list_transform(range(1, len(ws)-2),
              i -> ('0x'||substr(md5(array_to_string(ws[i:i+3],' ')),1,8))::BIGINT)
              AS gh
          FROM d WHERE len(ws) >= 7),
    sel AS (SELECT doc_id,
              list_distinct(list_transform(range(1, len(gh)-2),
                j -> list_reduce(
                       list_transform(range(0, 4), o -> [gh[j+o], -(j+o)]),
                       (a, b) -> CASE WHEN b < a THEN b ELSE a END)[1]))
                AS fps
            FROM g),
    sz AS (SELECT doc_id, len(fps) AS n_fps FROM sel),
    e AS (SELECT doc_id, unnest(fps) AS h FROM sel),
    rare AS (SELECT h FROM (SELECT h, count(*) c FROM e GROUP BY h)
             WHERE c <= 50),
    ek AS (SELECT doc_id, h FROM e JOIN rare USING (h)),
    pr AS (SELECT pa.doc_id da, pb.doc_id db, count(*) shared
           FROM ek pa JOIN ek pb ON pa.h = pb.h AND pa.doc_id < pb.doc_id
           GROUP BY 1, 2)
    SELECT da AS doc_a, db AS doc_b,
           CAST(shared AS BIGINT) AS shared_fps,
           CAST(shared AS DOUBLE)/least(na.n_fps, nb.n_fps) AS overlap
    FROM pr JOIN sz na ON da = na.doc_id JOIN sz nb ON db = nb.doc_id
    WHERE shared >= 2
    """,
)

# ---------------------------------------------------------------------------
# p30 exact substring dedup: maximal duplicated token spans per document


def p30_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document (Lee et al., ACL'22
    ExactSubstr, as distributed k-gram anchors — operators/dedup.py
    duplicated_token_spans): a position is hit when its word 8-gram occurs
    >= 2 times anywhere in the corpus; overlapping hit windows merge into
    maximal [start, end) spans. The oracle replays the identical
    gram-hash / multiplicity / gaps-and-islands pipeline in DuckDB —
    every output is an exact integer."""
    from delta_kernel_rs_spark.operators.dedup import duplicated_token_spans

    return duplicated_token_spans(
        load_table(spark, sf_dir, "documents"), k=8
    )


register(
    "p30_duplicated_spans",
    p30_duplicated_spans,
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    g AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
                 md5(array_to_string(ws[i:i+7], ' ')) AS gr
          FROM d, unnest(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8),
    dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) >= 2),
    h AS (SELECT doc_id, pos FROM g JOIN dup USING (gr)),
    m AS (SELECT doc_id, pos,
                 CASE WHEN pos > lag(pos) OVER w + 8 THEN 1 ELSE 0 END AS brk
          FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    i AS (SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS island
          FROM m)
    SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
           CAST(max(pos) + 8 AS INTEGER) AS span_end,
           CAST(max(pos) + 8 - min(pos) AS INTEGER) AS span_tokens
    FROM i GROUP BY doc_id, island
    """,
)

# ---------------------------------------------------------------------------
# p31 semantic dedup: deterministic k-means + SemDeDup keep rule


def p31_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table
    (operators/similarity.py semantic_dedup): 2-iteration deterministic
    Lloyd k-means (seeds = first 8 vectors; centroid update is the
    integer-scaled exact mean, so the result is order-independent), then
    inside each cluster drop every vector with a lower-id member at
    cosine >= 0.4. The oracle replays the identical two Lloyd passes in
    DuckDB with the same fold expressions — assignments, cluster sizes,
    and keep flags all hash-match."""
    from delta_kernel_rs_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        n_centroids=8,
        n_iters=2,
        threshold=0.4,
    )


def _dk_kmeans_cos(va: str, na2: str, vb: str, nb2: str) -> str:
    return f"{_dk_fold_dot(va, vb)} / sqrt({na2}*{nb2})"


register(
    "p31_semantic_dedup",
    p31_semantic_dedup,
    f"""
    WITH v AS (SELECT vec_id, embedding, {_DK_NORM2} AS n2 FROM embeddings),
    c0 AS (SELECT vec_id AS cid, embedding AS c, n2 AS cn2 FROM v
           WHERE vec_id < 8),
    s1 AS (SELECT v.vec_id, c0.cid,
                  {_dk_kmeans_cos('v.embedding', 'v.n2', 'c0.c', 'c0.cn2')} AS cc
           FROM v, c0),
    a1 AS (SELECT vec_id, cid FROM
             (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cc DESC, cid) rn FROM s1)
           WHERE rn = 1),
    ex AS (SELECT a1.cid, i AS pos,
                  CAST(round(CAST(v.embedding[i] AS DOUBLE)*1000000.0)
                       AS BIGINT) AS sx
           FROM a1 JOIN v USING (vec_id), unnest(range(1, 65)) t(i)),
    per AS (SELECT cid, pos, CAST(sum(sx) AS BIGINT) AS s, count(*) AS n
            FROM ex GROUP BY 1, 2),
    c1 AS (SELECT cid, list(CAST(s AS DOUBLE)/(1000000.0*n) ORDER BY pos) AS c
           FROM per GROUP BY cid),
    c1n AS (SELECT cid, c, {_dk_fold_dot('c', 'c')} AS cn2 FROM c1),
    s2 AS (SELECT v.vec_id, v.embedding, v.n2, c1n.cid,
                  {_dk_kmeans_cos('v.embedding', 'v.n2', 'c1n.c', 'c1n.cn2')} AS cc
           FROM v, c1n),
    a2 AS (SELECT vec_id, embedding, n2, cid FROM
             (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY cc DESC, cid) rn FROM s2)
           WHERE rn = 1),
    dup AS (SELECT DISTINCT b.vec_id FROM a2 a JOIN a2 b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
            AND {_dk_kmeans_cos('a.embedding', 'a.n2', 'b.embedding', 'b.n2')}
                >= 0.4),
    sz AS (SELECT cid, count(*) AS cluster_size FROM a2 GROUP BY cid)
    SELECT a2.vec_id, a2.cid AS cluster_id,
           CAST(sz.cluster_size AS BIGINT) AS cluster_size,
           a2.vec_id NOT IN (SELECT vec_id FROM dup) AS is_kept
    FROM a2 JOIN sz USING (cid)
    """,
)

# ---------------------------------------------------------------------------
# p32 unigram LM outliers: rarest-token documents per language


def p32_unigram_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency outlier detection (operators/text.py
    unigram_surprisal — the CCNet/Gopher frequency-based quality
    lineage): the 5 docs per language whose tokens sit in the LOWEST
    average log2-frequency bucket (corpus-rare vocabulary). The hashed
    surface is all-integer — ``logfreq_milli`` is built from
    ``length(bin(count)) - 1`` buckets, exact in any summation order —
    while the true float ``avg_logprob`` stays informative-only
    (dropped here; see the operator docstring)."""
    from pyspark.sql import Window

    from delta_kernel_rs_spark.operators.text import unigram_surprisal

    scored = unigram_surprisal(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("lang").orderBy(
        F.asc("logfreq_milli"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "doc_id", "n_tokens", "bits_sum",
                "logfreq_milli")
    )


register(
    "p32_unigram_outliers",
    p32_unigram_outliers,
    """
    WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    d AS (SELECT doc_id, lang,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(length(format('{:b}', c.c)) - 1) AS BIGINT)
                   AS bits_sum
          FROM t JOIN c USING (tok) GROUP BY doc_id, lang),
    s AS (SELECT doc_id, lang, n_tokens, bits_sum,
                 CAST((1000 * bits_sum) // n_tokens AS BIGINT)
                   AS logfreq_milli
          FROM d)
    SELECT lang, CAST(rnk AS INTEGER) AS rank, doc_id, n_tokens, bits_sum,
           logfreq_milli
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY logfreq_milli, doc_id) rnk
          FROM s)
    WHERE rnk <= 5
    """,
)
