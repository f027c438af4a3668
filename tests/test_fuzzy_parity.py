"""fuzz.ratio parity scorer vs the Levenshtein-ratio builtin.

The reference scores name matches with fuzzywuzzy 0.18.0's
``fuzz.ratio`` (``src/ingest_places_data.py:8,58-59``); without
python-Levenshtein installed that is exactly
``int(round(100 * difflib.SequenceMatcher(None, a, b).ratio()))``.
These tests pin the parity UDF to hand-checked fuzz.ratio constants
and document where the two scorers disagree (transpositions:
SequenceMatcher credits out-of-order matching blocks that Levenshtein
charges as edits) — the delta SURVEY.md §2.9 commits to documenting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.fuzzy import (
    fuzz_ratio,
    fuzzy_best_match,
    similarity_score,
)


def _scores(spark, pairs, scorer):
    df = spark.createDataFrame(pairs, ["a", "b"])
    rows = df.select("a", "b", scorer(F.col("a"), F.col("b")).alias("s")).collect()
    return {(r.a, r.b): r.s for r in rows}


def test_fuzz_ratio_matches_fuzzywuzzy_constants(spark):
    # hand-checked against fuzzywuzzy 0.18.0 / difflib semantics
    got = _scores(
        spark,
        [
            ("ha noi", "hanoi"),      # 2*5/11 -> 90.9 -> 91
            ("abab", "abba"),         # blocks "ab"+"a" -> 2*3/8 -> 75
            ("abcd", "abcd"),         # exact -> 100
            ("abc", ""),              # empty side -> 0
            ("Da Nang", "da nang"),   # case-insensitive at the operator
        ],
        fuzz_ratio,
    )
    assert got[("ha noi", "hanoi")] == 91
    assert got[("abab", "abba")] == 75
    assert got[("abcd", "abcd")] == 100
    assert got[("abc", "")] == 0
    assert got[("Da Nang", "da nang")] == 100


def test_fuzz_ratio_null_propagates(spark):
    df = spark.createDataFrame([("x", None)], "a string, b string")
    assert df.select(fuzz_ratio(F.col("a"), F.col("b")).alias("s")).first().s is None


def test_scorer_delta_changes_winner(spark):
    # query "abab": candidate "abzb" is one substitution away
    # (lev ratio 0.75) while "abba" is a transposition (lev ratio 0.50)
    # — but SequenceMatcher scores BOTH 75, and the deterministic
    # candidate-string tie-break then keeps "abba". Same inputs, two
    # defensible winners: this is the reference-vs-builtin delta.
    queries = spark.createDataFrame([("abab",)], ["qname"])
    candidates = spark.createDataFrame([("abzb",), ("abba",)], ["cname"])

    lev = fuzzy_best_match(queries, candidates, "qname", "cname").first()
    assert lev.cname == "abzb" and lev.similarity == 0.75

    par = fuzzy_best_match(
        queries, candidates, "qname", "cname", score_fn=fuzz_ratio
    ).first()
    assert par.cname == "abba" and par.similarity == 75


def test_parity_and_builtin_agree_on_clean_matches(spark):
    # on substitution/prefix-style typos (the common case for place
    # names) both scorers pick the same winner
    queries = spark.createDataFrame([("hanoi",), ("hue",)], ["qname"])
    candidates = spark.createDataFrame(
        [("ha noi",), ("hanoy",), ("hue",), ("hoi an",)], ["cname"]
    )
    for fn in (similarity_score, fuzz_ratio):
        best = {
            r.qname: r.cname
            for r in fuzzy_best_match(
                queries, candidates, "qname", "cname", score_fn=fn
            ).collect()
        }
        assert best == {"hanoi": "ha noi", "hue": "hue"}


def test_jaro_winkler_matches_duckdb_exactly():
    import random

    import duckdb

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.fuzzy import (
        _jaro_winkler_one,
    )

    con = duckdb.connect()
    random.seed(7)
    alph = "abcde#0123"
    tests = [
        (
            "".join(random.choice(alph) for _ in range(random.randint(0, 12))),
            "".join(random.choice(alph) for _ in range(random.randint(0, 12))),
        )
        for _ in range(4000)
    ] + [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""), ("ab", "ba")]
    for a, b in tests:
        exp = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(_jaro_winkler_one(a, b) - exp) < 1e-12, (a, b)
