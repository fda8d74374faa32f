"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

Pure built-in-function column expressions (JVM-side, codegen) — no Python
UDFs anywhere. Each builder returns Column(s) so callers compose them into
scans; every expression has an exact ANSI-SQL twin used by the DuckDB
oracle (same expression tree, explicit DOUBLE casts, left-fold aggregates),
so outputs hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_kernel_rs_spark.operators.parallel import ensure_min_parallelism

#: Marker-word lists for the n-gram/stopword language-ID heuristic.
#: Deliberately tiny and deterministic; real deployments would extend the
#: lists, the argmax machinery is what matters.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "los", "las", "de", "es"],
    "fr": ["le", "les", "des", "et", "est"],
}

FINGERPRINT_MOD = 1_000_000_007


def _words(text_col: str) -> str:
    return f"split({text_col}, ' ')"


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language marker-hit counts plus the argmax prediction.

    Returns {"hits_<lang>": Column, ..., "pred_lang": Column}. Hits count
    marker-word *occurrences* (filter + size, not distinct). The argmax is
    the string-least trick — least over zero-padded "(bigN - hits)||lang"
    keys — which both Spark and ANSI SQL evaluate identically, ties going
    to the alphabetically-first language.
    """
    cols: dict[str, Column] = {}
    keys = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lit_list = ", ".join(f"'{m}'" for m in markers)
        hits = F.expr(
            f"size(filter({_words(text_col)}, w -> array_contains(array({lit_list}), w)))"
        )
        cols[f"hits_{lang}"] = hits
        keys.append(
            f"concat(lpad(CAST(1000000 - size(filter({_words(text_col)}, "
            f"w -> array_contains(array({lit_list}), w))) AS STRING), 7, '0'), '{lang}')"
        )
    cols["pred_lang"] = F.expr(f"substring(least({', '.join(keys)}), 8)")
    return cols


def token_stat_columns(text_col: str = "text") -> dict[str, Column]:
    """Token counts: whitespace, regex word tokens, BPE-ish subword bound.

    ``n_tokens_bpe`` is the ceil(len/4) per-word upper bound a 4-chars-per-
    token BPE would produce — a fold, not a tokenizer; real BPE would be an
    Arrow-batched pandas UDF over a vocab broadcast.
    """
    ws = _words(text_col)
    return {
        "n_tokens_ws": F.expr(f"size({ws})"),
        "n_tokens_re": F.expr(f"size(regexp_extract_all({text_col}, '[a-z0-9]+', 0))"),
        "n_tokens_bpe": F.expr(
            f"aggregate(transform({ws}, w -> (length(w)+3) div 4), 0L, (acc,v) -> acc+v)"
        ),
        "chars_per_token": F.expr(
            f"CAST(length({text_col}) AS DOUBLE) / "
            f"size(regexp_extract_all({text_col}, '[a-z0-9]+', 0))"
        ),
    }


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Heuristic quality features + a combined [0,1] score.

    ttr = type/token ratio; score = 0.4*ttr + 0.3*min(1, n_words/128)
    + 0.3*min(1, avg_word_len/8). All-double arithmetic with the same
    association order as the SQL twin.
    """
    ws = _words(text_col)
    n_words = f"size({ws})"
    n_distinct = f"size(array_distinct({ws}))"
    total_chars = f"aggregate(transform({ws}, w -> length(w)), 0, (acc,v) -> acc+v)"
    ttr = f"CAST({n_distinct} AS DOUBLE) / {n_words}"
    awl = f"CAST({total_chars} AS DOUBLE) / {n_words}"
    return {
        "n_words": F.expr(n_words),
        "ttr": F.expr(ttr),
        "avg_word_len": F.expr(awl),
        "quality_score": F.expr(
            f"CAST(0.4 AS DOUBLE)*({ttr}) "
            f"+ CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE), CAST({n_words} AS DOUBLE)/CAST(128.0 AS DOUBLE)) "
            f"+ CAST(0.3 AS DOUBLE)*least(CAST(1.0 AS DOUBLE), ({awl})/CAST(8.0 AS DOUBLE))"
        ),
    }


#: PII patterns restricted to the RE2-compatible subset (no lookarounds,
#: no backreferences) so Spark's java.util.regex and DuckDB's RE2 agree
#: byte-for-byte on every match. Redaction applies in dict order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_columns(text_col: str = "text") -> dict[str, Column]:
    """PII detection counts + a fully-redacted text column.

    Counts are computed on the ORIGINAL text per category (overlaps count
    in every matching category); ``redacted`` chains replacements in
    PII_PATTERNS order (email → ipv4 → phone — placeholders are
    digit-free, so later patterns cannot match inside earlier
    replacements). Column-API regex (not F.expr) so the pattern string
    reaches the JVM without SQL string-literal escape processing.

    Scale: pure per-row codegen'd expressions — no shuffle, no UDF.
    """
    src = F.col(text_col)
    cols: dict[str, Column] = {}
    red = src
    for name, (pat, repl) in PII_PATTERNS.items():
        cols[f"n_{name}"] = F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0)))
        red = F.regexp_replace(red, pat, repl)
    cols["redacted"] = red
    return cols


def fingerprint_expr(text_col: str = "text") -> Column:
    """Polynomial rolling-hash fingerprint of the whole text.

    acc_{i+1} = (acc_i*31 + codepoint_i) mod 1e9+7, folded left over the
    character sequence. ``split(text, '')`` materializes the char array in
    ONE pass — the earlier ``substring(text, i, 1)`` probe per position was
    an O(n²) walk (each substring re-scans from the head), which dominated
    this operator's runtime on multi-KB documents.
    """
    return F.expr(
        f"aggregate(transform(split({text_col}, ''), ch -> ascii(ch)), 0L, "
        f"(acc, c) -> (acc*31 + c) % {FINGERPRINT_MOD})"
    )


def _gram_array_sql(ws: str, n: int) -> str:
    """SQL for the word ``n``-gram array over a token-array column ``ws``
    (same construction as the former explode path: ``concat_ws`` over
    ``slice`` windows, empty array below ``n`` words)."""
    return (
        f"CASE WHEN size({ws}) >= {n} THEN "
        f"transform(sequence(1, size({ws}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({ws}, i, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def _top_run_chars_sql(arr: str) -> str:
    """SQL (BIGINT, NULL when ``arr`` is empty): ``c * length(g)`` of the
    max ``(count, gram)`` gram — the same value the former
    ``max(struct(c, g))`` aggregation produced, computed per row.

    ``array_sort`` makes equal grams adjacent; a single left fold then
    run-length-counts them, keeping the best (count, gram) pair under
    exactly the struct comparison ``max`` used: higher count wins, ties
    go to the binary-greater gram string.
    """
    best = "(s.bg IS NULL OR s.c > s.bc OR (s.c = s.bc AND s.g > s.bg))"
    return (
        f"aggregate(array_sort({arr}), "
        "named_struct('g', CAST(NULL AS STRING), 'c', 0L, "
        "'bg', CAST(NULL AS STRING), 'bc', 0L), "
        "(s, x) -> CASE "
        "WHEN s.g IS NOT NULL AND x = s.g THEN "
        "named_struct('g', s.g, 'c', s.c + 1L, 'bg', s.bg, 'bc', s.bc) "
        f"WHEN s.g IS NOT NULL AND {best} THEN "
        "named_struct('g', x, 'c', 1L, 'bg', s.g, 'bc', s.c) "
        "ELSE named_struct('g', x, 'c', 1L, 'bg', s.bg, 'bc', s.bc) END, "
        f"s -> CASE WHEN s.g IS NOT NULL AND {best} THEN s.c * length(s.g) "
        "WHEN s.bg IS NOT NULL THEN s.bc * length(s.bg) "
        "ELSE CAST(NULL AS BIGINT) END)"
    )


def _dup_run_chars_sql(arr: str) -> str:
    """SQL (BIGINT, 0 when nothing repeats): total ``c * length(g)`` over
    grams with count > 1 — the same integer total the former
    ``sum(CASE WHEN c > 1 ...)`` aggregation produced (integer addition
    is order-independent, so the run order cannot change the sum)."""
    close = "CASE WHEN s.c > 1L THEN s.d + s.c * length(s.g) ELSE s.d END"
    return (
        f"aggregate(array_sort({arr}), "
        "named_struct('g', CAST(NULL AS STRING), 'c', 0L, 'd', 0L), "
        "(s, x) -> CASE WHEN s.g IS NOT NULL AND x = s.g THEN "
        "named_struct('g', s.g, 'c', s.c + 1L, 'd', s.d) "
        f"ELSE named_struct('g', x, 'c', 1L, 'd', {close}) END, "
        f"s -> {close})"
    )


def repetition_signal_columns(
    ws_col: str, text_col: str = "text"
) -> dict[str, Column]:
    """The three Gopher repetition signals as PURE per-row expressions
    over a pre-materialized token-array column ``ws_col`` (use
    ``operators.parallel.materialize_column`` — inlined, the split would
    re-run per reference).

    This is the r12 map-only replacement for the explode + three-shuffle
    pipeline: per (doc, n) the gram counts are a run-length fold over the
    ``array_sort``-ed gram array — O(L log L) per document, all codegen,
    zero exchanges — producing bit-identical integers to the former
    per-(doc, n, gram) count aggregation (see the fold helpers above; the
    53/53 oracle gate pins the equivalence).
    """
    nc = f"length({text_col})"
    return {
        "dup_word_frac": F.expr(
            f"CAST(size({ws_col}) - size(array_distinct({ws_col})) AS DOUBLE)"
            f" / size({ws_col})"
        ),
        "top_bigram_char_frac": F.expr(
            f"coalesce(CAST({_top_run_chars_sql(_gram_array_sql(ws_col, 2))} "
            f"AS DOUBLE) / {nc}, CAST(0.0 AS DOUBLE))"
        ),
        "dup_trigram_char_frac": F.expr(
            f"coalesce(CAST({_dup_run_chars_sql(_gram_array_sql(ws_col, 3))} "
            f"AS DOUBLE) / {nc}, CAST(0.0 AS DOUBLE))"
        ),
    }


def repetition_signals(
    df: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Gopher-style repetition quality signals, one row per document.

    Excessively repetitive documents are a dominant failure mode in web
    training corpora; these are the standard repetition filters (Rae et
    al., "Scaling Language Models: ... Gopher", §A1.1), adapted to
    newline-free text:

    - ``dup_word_frac``      — fraction of word occurrences that repeat an
                               earlier word: ``(n_words - n_distinct) / n_words``
    - ``top_bigram_char_frac``  — characters covered by the single most
                               frequent word 2-gram, / total chars
    - ``dup_trigram_char_frac`` — characters covered by word 3-grams that
                               occur more than once, / total chars

    Plan shape (100 TB posture, r12 rewrite): MAP-ONLY. Per document the
    gram counts are a run-length fold over the ``array_sort``-ed gram
    array (see :func:`repetition_signal_columns`) — O(L log L) per row,
    all codegen'd expressions, ZERO exchanges (the former shape exploded
    every gram and paid three shuffles plus a doc-keyed join). Ties for
    the top bigram break on the gram string exactly like the former
    ``max(struct(c, g))`` — bit-identical to the DuckDB oracle's
    ``ORDER BY c DESC, g DESC`` choice.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    # materialized once per row: inlined, the split re-runs per gram in
    # the fold lambdas below — O(L^2) per doc (round-12 scale-growth find)
    base = materialize_column(
        ensure_min_parallelism(df).select(F.col(id_col), F.col(text_col)),
        F.split(F.col(text_col), " "),
        "__ws",
    )
    cols = repetition_signal_columns("__ws", text_col)
    return base.select(
        id_col, *[col.alias(name) for name, col in cols.items()]
    )


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding context-window chunking: fixed token windows with overlap.

    The training-prep step that turns documents into model-sized pieces:
    whitespace tokens are cut into ``window``-token chunks every ``stride``
    tokens (overlap = window - stride), and every document yields at least
    one chunk. Output (doc_id, chunk_idx, start_token, n_tokens,
    chunk_text) with 1-based start_token.

    Map-only — one codegen'd projection + an explode over the per-document
    start sequence; no shuffle, no Python. At 100 TB this is the shape you
    want: chunking parallelism is exactly input-split parallelism.
    """
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")
    ws = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(1), F.size(ws), F.lit(stride))
    base = ensure_min_parallelism(df).select(
        F.col(id_col),
        ws.alias("ws"),
        F.size(ws).alias("doc_tokens"),
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    return base.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("start_token"),
        F.least(F.lit(window), F.col("doc_tokens") - F.col("start_token") + 1).alias(
            "n_tokens"
        ),
        F.concat_ws(" ", F.slice("ws", F.col("start_token"), F.lit(window))).alias(
            "chunk_text"
        ),
    )


def _token_histogram_rows(
    df: DataFrame,
    carry: list[Column],
    text_col: str,
    tok_alias: str = "tok",
    ct_alias: str = "ct",
) -> DataFrame:
    """Explode ``df`` to one row per DISTINCT whitespace token per input
    row: (*carry, tok_alias, ct_alias) where ct is the token's in-row
    multiplicity.

    Exactly the frame ``explode(split(text)) + groupBy(carry, tok)``
    produces — but the histogram is a per-row function, so it is built
    in-row from the ``array_sort``-ed token array (r12 batch 5, guide
    §2.4): run ends are the indices where the sorted array changes
    value, run lengths are adjacent-end differences via ``element_at``
    index lookups. O(D log D) per row — no array accumulator is ever
    concatenated (the O(D²) concat-fold shape this replaces was
    rejected in the r12 scale-growth work). Each construction sits
    behind a ``materialize_column`` Generate barrier because the
    lambdas reference the previous array per element (CodegenFallback
    expressions get no CSE). Rows with NULL text vanish exactly as
    ``explode(split(NULL))`` dropped them.
    """
    from delta_kernel_rs_spark.operators.parallel import materialize_column

    d1 = materialize_column(
        df, F.array_sort(F.split(F.col(text_col), " ")), "__s"
    )
    # run-end indices: i is the last index of its run iff i = n-1 or
    # s[i+1] != s[i] (element_at is 1-based).
    # PREDICATE ORDER IS LOAD-BEARING under spark.sql.ansi.enabled
    # (ADVICE r12): OR short-circuits left-to-right in both interpreted
    # and codegen paths, so element_at(__s, i + 2) is never evaluated
    # for the last index; swapping the disjuncts would raise an
    # out-of-bounds error under ANSI mode (non-ANSI would return NULL).
    d2 = materialize_column(
        d1,
        F.expr(
            "filter(transform(__s, (t, i) -> i), i -> "
            "i = size(__s) - 1 OR "
            "element_at(__s, i + 2) != element_at(__s, i + 1))"
        ),
        "__ends",
    )
    # histogram rows: (tok, ct) with ct = run length = ends[j] - ends[j-1]
    d3 = materialize_column(
        d2,
        F.expr(
            "transform(__ends, (e, j) -> struct("
            "element_at(__s, e + 1) AS tok, "
            "CAST(e - (CASE WHEN j = 0 THEN -1 "
            "ELSE element_at(__ends, j) END) AS BIGINT) AS ct))"
        ),
        "__hist",
    )
    return d3.select(*carry, F.explode("__hist").alias("__h")).select(
        *carry,
        F.col("__h.tok").alias(tok_alias),
        F.col("__h.ct").alias(ct_alias),
    )


def tfidf_top_terms(
    df: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    score = (tf / doc_len) * ln(N / df) — raw term frequency normalized by
    document length, classic log idf.

    Input contract (ADVICE r12): ``id_col`` values must be UNIQUE — the
    in-row histogram emits one histogram per input ROW, so a duplicated
    id would be df-counted once per copy and could repeat a term within
    its top_k (the pre-r12 explode + groupBy(id, term) merged such
    copies instead). The fixture tables and every registered query
    satisfy this; callers feeding non-unique ids must pre-dedup.

    r12 shape (guide §2.4): the
    (doc, term) tf counts are an IN-ROW sorted-run histogram
    (`_token_histogram_rows` — r12 batch 5; the former explode +
    groupBy(doc, term) exchange is gone), and the term-keyed document
    frequency is a count window OVER that frame — the former separate
    `groupBy(term)` + join executed the tf subtree twice and added a
    join; the window computes df on the same term-partitioned pass the
    join would have needed anyway. N arrives as a broadcast 1-row
    aggregate — no driver action. The per-document cap is a rank
    window: Spark plans WindowGroupLimit, so each doc materializes
    <= top_k rows on both sides of the final shuffle.
    """
    base = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("doc_len"),
        F.col(text_col),
    )
    tf = _token_histogram_rows(
        base,
        [F.col(id_col), F.col("doc_len")],
        text_col,
        tok_alias="term",
        ct_alias="tf",
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") / F.col("doc_len"))
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "term", "tf", "df", "doc_len", "tfidf")
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Unigram language-model surprisal per document — the classic
    frequency-based quality/outlier scorer (CCNet/Gopher lineage: a doc
    whose tokens are corpus-rare is an outlier; one whose tokens are all
    stopwords is boilerplate).

    Input contract (ADVICE r12): ``id_col`` values must be UNIQUE — the
    in-row histogram emits one histogram per input row, so duplicated
    ids would double-count in the token window (see tfidf_top_terms).

    Two scores per document:

    * ``avg_logprob`` (double): (1/n) * sum_i ln(count(tok_i)) - ln(N) —
      the true average token log-probability under the corpus unigram
      model. Informative, but a distributed float sum is order-dependent,
      so it is NOT part of any hash-checked surface.
    * ``logfreq_milli`` (bigint): 1000 * sum_i floor(log2(count(tok_i)))
      integer-divided by n — the average log2-frequency bucket of the
      doc's tokens, scaled to milli-bits. floor(log2(c)) is computed as
      ``length(bin(c)) - 1`` — pure integer arithmetic, EXACT in any
      summation order and bit-identical across engines. This is the
      score the oracle gate hashes; LOW means corpus-rare tokens (an
      outlier doc), HIGH means stopword soup, and it preserves the
      logprob ordering up to 1-bit count quantization.

    Plan shape (r12, guide §2.3/§2.4): the per-document (token, count)
    histogram is a PER-ROW function, so it is computed in-row from the
    ``array_sort``-ed token array — run ends are the indices where the
    sorted array changes value, run lengths are adjacent-end differences
    (O(D log D) per doc via element_at index lookups, NOT the O(D²)
    concat-fold rejected for p23) — then exploded to the same
    (doc, token, ct) type-compressed frame the former
    explode + groupBy(doc, token) shuffle produced. Corpus counts are
    attached as a ``sum OVER (PARTITION BY token)`` window on that frame
    (the former separate groupBy(token) + join back executed the explode
    subtree TWICE and shuffled raw instances twice) -> one groupBy(doc).
    Net r12 batch 5: the (doc, token)-keyed Exchange is GONE (3 -> 2
    exchanges; probe: identical 5k-row surface, 0.94 -> 0.79 s
    alternating same-JVM). All per-instance sums become ``ct * f(c)``
    over the compressed rows — identical integers (bits_sum, n_tokens
    are exact in any grouping); ``ln_sum`` differs only in float
    association, and ``avg_logprob`` is documented order-dependent and
    excluded from hashed surfaces. Hot tokens ("the") still spread
    across docs, never quadratically.

    Returns (id_col, *keep_cols, n_tokens, bits_sum, logfreq_milli,
    avg_logprob).
    """
    from pyspark.sql import Window

    from delta_kernel_rs_spark.operators.parallel import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    dt = _token_histogram_rows(
        df.select(F.col(id_col), *[F.col(c) for c in keep_cols],
                  F.col(text_col)),
        [F.col(id_col), *[F.col(c) for c in keep_cols]],
        text_col,
    )
    inst = dt.withColumn("c", F.sum("ct").over(Window.partitionBy("tok")))
    # same value as the former sum over the token-count frame, computed
    # from an independent map-only subtree (count of split elements)
    total = df.agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_total")
    )
    per_doc = (
        inst.groupBy(id_col, *keep_cols)
        .agg(
            F.sum("ct").alias("n_tokens"),
            F.sum(F.col("ct") * (F.length(F.bin(F.col("c"))) - 1)).alias(
                "bits_sum"
            ),
            F.sum(F.col("ct") * F.log(F.col("c").cast("double"))).alias(
                "ln_sum"
            ),
        )
    )
    return (
        per_doc.join(F.broadcast(total))
        .select(
            id_col,
            *keep_cols,
            "n_tokens",
            "bits_sum",
            F.expr("(1000 * bits_sum) DIV n_tokens").alias("logfreq_milli"),
            (
                F.col("ln_sum") / F.col("n_tokens")
                - F.log(F.col("n_total").cast("double"))
            ).alias("avg_logprob"),
        )
    )
