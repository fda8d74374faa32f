"""Text analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

Pure built-in-function column expressions (JVM-side, codegen) — no Python
UDFs anywhere. Each builder returns Column(s) so callers compose them into
scans; every expression has an exact ANSI-SQL twin used by the DuckDB
oracle (same expression tree, explicit DOUBLE casts, left-fold aggregates),
so outputs hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
