"""Deterministic split, SCD2 history, and decontamination operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.decontaminate import (
    ngram_overlap,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
    hash_split,
    split_boundaries,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.scd import (
    scd2_history,
)


def test_hash_split_deterministic_and_partition_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.k: r.split for r in hash_split(df, "k", frac).collect()}
    b = {
        r.k: r.split
        for r in hash_split(df.repartition(7), "k", frac).collect()
    }
    assert a == b  # pure function of the key, not of layout
    counts = {s: sum(1 for v in a.values() if v == s) for s in frac}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert counts["val"] > 0 and counts["test"] > 0


def test_hash_split_salt_rerolls(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    frac = {"a": 0.5, "b": 0.5}
    s1 = {r.k: r.split for r in hash_split(df, "k", frac, salt="x").collect()}
    s2 = {r.k: r.split for r in hash_split(df, "k", frac, salt="y").collect()}
    assert s1 != s2


def test_split_boundaries_validate():
    with pytest.raises(ValueError, match="sum to 1"):
        split_boundaries({"a": 0.5, "b": 0.6})


def test_scd2_history_suppresses_runs_and_builds_intervals(spark):
    ts = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, ts(0), 0, "free"),
        (1, ts(1), 1, "free"),   # same value -> suppressed
        (1, ts(2), 2, "paid"),   # change -> new version
        (1, ts(3), 3, "paid"),   # suppressed
        (2, ts(5), 4, None),     # null attr opens first version
        (2, ts(6), 5, None),     # null == null (null-safe) -> suppressed
        (2, ts(7), 6, "free"),   # null -> value is a change
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, plan string"
    )
    h = scd2_history(df, "user_id", "ts", ["plan"], tiebreak_col="event_id")
    got = sorted(
        (
            (r.user_id, r.plan, r.valid_from, r.valid_to, r.is_current)
            for r in h.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "free", ts(0), ts(2), False),
        (1, "paid", ts(2), None, True),
        (2, None, ts(5), ts(7), False),
        (2, "free", ts(7), None, True),
    ]


def test_ngram_overlap_counts_shared_grams(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 2 benchmark 3-grams
            (2, "totally unrelated content here"),
            (3, "quick brown fox"),            # shares exactly 1
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_shared_grams for r in ngram_overlap(docs, bench).collect()}
    # bench grams: {the quick brown, quick brown fox, brown fox sleeps}
    assert got == {1: 2, 3: 1}


def test_stratified_cap_deterministic_and_capped(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
        stratified_cap,
    )

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(300)], "k long, g string"
    )
    a = sorted(r.k for r in stratified_cap(df, "g", "k", cap=7).collect())
    b = sorted(
        r.k for r in stratified_cap(df.repartition(5), "g", "k", cap=7).collect()
    )
    assert a == b and len(a) == 21  # 7 per group, layout-invariant
    # small group below the cap is kept whole
    small = spark.createDataFrame([(1, "x"), (2, "x")], "k long, g string")
    assert stratified_cap(small, "g", "k", cap=7).count() == 2


def test_unigram_logprob_scores_hand_computed(spark):
    import math

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        unigram_logprob_scores,
    )

    # corpus: 'a' x4, 'b' x2, 'z' x1 → total 7 tokens; vocab_size=2
    # keeps {a, b}; 'z' is OOV and gets the ln(0.5/7) floor
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b z")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_scores(
            df, vocab_size=2, keep_threshold=-1.2
        ).collect()
    }
    lp = lambda p: round(math.log(p) * 1e6)
    exp1 = round((3 * lp(4 / 7) + lp(2 / 7)) / 4 / 1e6, 6)
    exp2 = round((lp(4 / 7) + lp(2 / 7) + lp(0.5 / 7)) / 3 / 1e6, 6)
    assert out[1]["lm_score"] == exp1
    assert out[2]["lm_score"] == exp2
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 3
    # doc 2 contains the rare token → lower score, filtered out
    assert out[1]["keep"] is True and out[2]["keep"] is False


def test_apportion_budget_exact_and_invariant(spark):
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
        apportion_budget,
    )

    # weights 3:1:1 over budget 10 → floors [6,2,2], remainder 0
    w = spark.createDataFrame(
        [Row(g="a", w_scaled=3), Row(g="b", w_scaled=1), Row(g="c", w_scaled=1)]
    )
    out = {r["g"]: r["alloc_tokens"] for r in apportion_budget(w, ["g"], budget=10).collect()}
    assert out == {"a": 6, "b": 2, "c": 2}

    # weights forcing remainders: 1:1:1 over 10 → floors [3,3,3], one
    # leftover goes to the lexicographically-first group (tied rems)
    w2 = spark.createDataFrame(
        [Row(g="x", w_scaled=1), Row(g="y", w_scaled=1), Row(g="z", w_scaled=1)]
    )
    out2 = {r["g"]: r["alloc_tokens"] for r in apportion_budget(w2, ["g"], budget=10).collect()}
    assert sum(out2.values()) == 10
    assert out2 == {"x": 4, "y": 3, "z": 3}

    # large uneven weights: the sum invariant must hold exactly
    import random

    rng = random.Random(7)
    rows = [Row(g=f"g{i:02d}", w_scaled=rng.randrange(1, 10**9)) for i in range(25)]
    w3 = spark.createDataFrame(rows)
    out3 = apportion_budget(w3, ["g"], budget=1_000_000).collect()
    assert sum(r["alloc_tokens"] for r in out3) == 1_000_000
