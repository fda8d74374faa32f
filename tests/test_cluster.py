"""Connected-components clustering (operators/cluster.py) and the
repetition quality signals (operators/text.py repetition_signals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.operators.cluster import (
    ConvergenceError,
    connected_components,
    neardup_clusters,
)
from delta_kernel_rs_spark.operators.text import repetition_signals


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_cc_chain_and_star(spark):
    # chain 1-2-3-4 (diameter 3) + star 10-{11,12,13} + isolated pair 20-21
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_cc_merges_via_shared_node(spark):
    # two pair-lists that share node 5 collapse into one component
    pairs = _pairs(spark, [(5, 9), (1, 5), (9, 30)])
    got = connected_components(pairs)
    assert {r["cluster_id"] for r in got.collect()} == {1}
    assert got.count() == 4


def test_cc_reverse_orientation_and_dups(spark):
    # duplicated + reversed edges don't change the result
    pairs = _pairs(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_round_cap_raises(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(ConvergenceError):
        connected_components(pairs, max_rounds=1)


def test_neardup_clusters_sizes(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in neardup_clusters(pairs).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2),
    }


def test_repetition_signals_values(spark):
    docs = spark.createDataFrame(
        [
            # 4 words, all distinct; bigrams all unique; no dup trigram
            (1, "a b c d"),
            # "x y x y x y": dup_word_frac = 4/6; top bigram "x y" (3 of 5),
            # chars = 3*3=9 over 11 text chars; trigrams "x y x"(2),"y x y"(2)
            # dup chars = 2*5 + 2*5 = 20 over 11
            (2, "x y x y x y"),
            # single word: no bigrams/trigrams at all
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["top_bigram_char_frac"] == pytest.approx(3 / 7)
    assert got[1]["dup_trigram_char_frac"] == 0.0
    assert got[2]["dup_word_frac"] == pytest.approx(4 / 6)
    assert got[2]["top_bigram_char_frac"] == pytest.approx(9 / 11)
    assert got[2]["dup_trigram_char_frac"] == pytest.approx(20 / 11)
    assert got[3]["dup_word_frac"] == 0.0
    assert got[3]["top_bigram_char_frac"] == 0.0
    assert got[3]["dup_trigram_char_frac"] == 0.0


def test_repetition_signals_tie_break(spark):
    # "a b a b c d c d": bigrams "a b"x2, "b a"x1, "c d"x2, "d c"x1 ...
    # tie between "a b" and "c d" at count 2 -> max struct picks "c d"
    # (higher gram string), chars = 2*3 = 6 over 15
    docs = spark.createDataFrame(
        [(1, "a b a b c d c d")], "doc_id long, text string"
    )
    row = repetition_signals(docs).collect()[0]
    assert row["top_bigram_char_frac"] == pytest.approx(6 / 15)


def test_repetition_signals_fold_matches_bruteforce(spark):
    """r12 pin: the map-only run-length fold (sort grams, count runs)
    must reproduce EXACTLY the count-based definition — top (count, gram)
    with ties to the greater gram string, and total chars of grams with
    count > 1 — on adversarial shapes (runs at both ends, multiple ties,
    max-count gram first/last in sort order)."""
    from collections import Counter

    texts = [
        "a a a b b c",            # top run first in sort order
        "z z y y x x w",          # descending words, ties everywhere
        "m n m n m n m n m",      # alternating, long runs after sort
        "q",                      # no grams at all
        "t t",                    # single bigram, no trigram
        "b a b a b a c c c c",    # tie resolution between 'b a'/'a b' + tail run
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        nc = len(t)
        exp = {}
        exp["dup_word_frac"] = (len(ws) - len(set(ws))) / len(ws)
        for n, name in ((2, "top_bigram_char_frac"), (3, "dup_trigram_char_frac")):
            grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)]
            counts = Counter(grams)
            if n == 2:
                if not counts:
                    exp[name] = 0.0
                else:
                    c, g = max((c, g) for g, c in counts.items())
                    exp[name] = c * len(g) / nc
            else:
                dup = sum(c * len(g) for g, c in counts.items() if c > 1)
                exp[name] = dup / nc if counts else 0.0
        for name, want in exp.items():
            assert got[i][name] == pytest.approx(want), (i, name, t)
