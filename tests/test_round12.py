"""Round-12 pins.

1. The ANSI-mode fact (resolving the r11 CLAUDE.md-vs-ADVICE.md doc
   contradiction): ``spark.sql.ansi.enabled`` is TRUE here — the Spark
   4 build default, not a session override — so int64 overflow is a
   loud ``ArithmeticException [ARITHMETIC_OVERFLOW]``, never a silent
   wrap. Because ``get_spark`` never touches the conf, the driver's
   VANILLA session shares the same build default; the static test pins
   that non-override so a future tuning change can't silently split
   the two sessions' semantics.

2. The r12 driver-stable output convention: the three r11 hash-fail
   queries (``cms_join_size``, ``spearman_rank_correlation``,
   ``pq_codebook_audit``) keep their DECIMAL(38,0) accumulators but
   EMIT string columns, and no registry query emits a decimal column
   at all (the class the extended ``lint_result_types`` gate bans).
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import (
    registry,
    session,
)


def test_ansi_enabled_is_build_default_not_override():
    # get_spark must NOT set spark.sql.ansi.enabled: the tuned session
    # and the driver's vanilla session must share the build default,
    # or overflow semantics would differ between selfcheck and driver.
    src = inspect.getsource(session)
    assert "ansi" not in src.lower()


def test_ansi_enabled_true(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_int64_overflow_raises_loudly(spark):
    # The fact the r11 overflow sweep's docs must cite: under ANSI a
    # LONG sum/product overflow is an ArithmeticException
    # [ARITHMETIC_OVERFLOW], NOT a silent wrap. (DuckDB's SUM(BIGINT)
    # promotes to HUGEINT instead; its BIGINT * BIGINT raises.) Either
    # way an int64 accumulator cannot answer at scale — DECIMAL(38,0)/
    # HUGEINT accumulators are the fix, string/bigint the emitted type.
    df = spark.createDataFrame([(2**62,), (2**62,)], "x long")
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        df.agg(F.sum("x")).collect()
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
        df.select((F.col("x") * F.lit(4)).alias("y")).collect()


@pytest.mark.parametrize(
    "name", ["cms_join_size", "spearman_rank_correlation", "pq_codebook_audit"]
)
def test_r11_hash_fails_emit_strings(spark, name, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    decimal_cols = [c for c, t in df.dtypes if t.startswith("decimal")]
    assert decimal_cols == []
    string_cols = {c for c, t in df.dtypes if t == "string" and c != "event_type"}
    assert string_cols  # the exact-at-100TB columns ride as strings


def test_substring_dedup_spans_semantics(spark):
    # Hand-built corpus: docs 1 and 2 share a verbatim 22-token run
    # (tokens w0..w21), doc 3 is disjoint. At L=20 the shared run must
    # come back as ONE maximal span per doc, with the correct 1-based
    # token bounds, and doc 3 must be absent.
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dup_spans,
    )

    shared = " ".join(f"w{i}" for i in range(22))
    docs = spark.createDataFrame(
        [
            (1, "a b c " + shared),  # shared run at tokens 4..25
            (2, shared + " x y"),  # shared run at tokens 1..22
            (3, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in substring_dup_spans(docs, min_tokens=20).collect()
    }
    assert set(rows) == {1, 2}
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (4, 25)
    assert (rows[2]["span_start"], rows[2]["span_end"]) == (1, 22)
    assert all(r["span_tokens"] == 22 for r in rows.values())


def test_substring_dedup_spans_merges_runs(spark):
    # Two overlapping duplicated regions in one doc merge into one
    # maximal span; a second doc sharing only one of them gets its own.
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dup_spans,
    )

    a = " ".join(f"a{i}" for i in range(25))
    b = " ".join(f"b{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, a + " " + b),  # both runs, adjacent → one 50-token span
            (2, a + " q r s"),
            (3, "p q " + b),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        substring_dup_spans(docs, min_tokens=20).collect(),
        key=lambda r: (r["doc_id"], r["span_start"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: a-run spans tokens 1..25, b-run 26..50; duplicated L-gram
    # START positions are 1..6 (a) and 26..31 (b) — non-contiguous, so
    # they stay two spans (the bridge grams a..b are unique to doc 1)
    assert [
        (r["span_start"], r["span_end"]) for r in by_doc[1]
    ] == [(1, 25), (26, 50)]
    assert [(r["span_start"], r["span_end"]) for r in by_doc[2]] == [(1, 25)]
    assert [(r["span_start"], r["span_end"]) for r in by_doc[3]] == [(3, 27)]


def test_substring_dedup_apply_keeps_first_occurrence(spark):
    import hashlib

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dedup_apply,
    )

    shared = " ".join(f"w{i}" for i in range(22))
    d3_text = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, "a b c " + shared),  # span at 4..25, NOT corpus-first
            (2, shared + " x y"),  # span at 1..22 — (2,1) > (1,4)? No:
            # keeper is min (doc_id, span_start) = doc 1 → doc 1 keeps
            (3, d3_text),  # untouched
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_dedup_apply(docs, 20).collect()}
    # doc 1 holds (1, 4) < (2, 1) in the (doc, start) order → doc 1
    # keeps its copy, doc 2 is cut
    assert rows[1]["n_tokens_removed"] == 0
    assert rows[1]["kept_md5"] == hashlib.md5(
        ("a b c " + shared).encode()
    ).hexdigest()
    assert rows[2]["n_spans_removed"] == 1
    assert rows[2]["n_tokens_removed"] == 22
    assert rows[2]["n_tokens_kept"] == 2
    assert rows[2]["kept_md5"] == hashlib.md5(b"x y").hexdigest()
    # untouched doc: zero removals, md5 of the original text
    assert rows[3]["n_tokens_removed"] == 0
    assert rows[3]["kept_md5"] == hashlib.md5(d3_text.encode()).hexdigest()


def test_substring_dedup_apply_full_removal_is_null(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dedup_apply,
    )

    t = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in substring_dedup_apply(docs, 20).collect()}
    assert rows[1]["n_tokens_removed"] == 0  # corpus-first copy kept
    assert rows[2]["n_tokens_kept"] == 0  # duplicate fully cut
    assert rows[2]["kept_md5"] is None


def test_triangle_plans_have_no_window(spark, sf01_dir):
    # The r12 degree-decoration rewrite: triangle_count /
    # per_vertex_triangles must decorate degrees with a combinable
    # aggregate + joins, never a WindowExec over the 2|E| directed
    # copies (the pre-r12 shape sorted the whole directed edge list).
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
        physical_plan,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.registry import (
        QUERIES,
    )

    for name in ("copurchase_triangles", "local_clustering_topk"):
        plan = physical_plan(QUERIES[name](spark, sf01_dir))
        assert "Window" not in plan, f"{name} regressed to window decoration"


def test_contamination_spans_semantics(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.decontaminate import (
        contamination_spans,
    )

    w = [f"w{i}" for i in range(30)]
    bench = spark.createDataFrame(
        [
            (100, " ".join(w)),  # the benchmark doc
            (200, "p q " + " ".join(w[10:20])),  # shares w10..w19 with 100
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "x y " + " ".join(w[5:20])),  # 15-token verbatim quote
            (2, " ".join(w[0:8]) + " z z z"),  # exactly an 8-token span
            (3, " ".join(w[0:7]) + " u v t s"),  # 7 shared — below L, absent
            (4, " ".join(w[10:20])),  # 10 tokens, in BOTH bench docs
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_spans(corpus, bench, min_tokens=8).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1]["longest_span_tokens"] == 15
    assert rows[1]["best_bench_doc"] == 100
    assert rows[2]["longest_span_tokens"] == 8
    # doc 4 ties at span 10 across bench 100 and 200 → argmax tiebreak
    # is the SMALLER bench doc, and both collisions are counted
    assert rows[4]["longest_span_tokens"] == 10
    assert rows[4]["best_bench_doc"] == 100
    assert rows[4]["n_bench_docs"] == 2


def test_r11_trio_values_match_oracle(spark, sf_dir):
    # Value-level parity at sf0.001 for the re-typed trio (the full
    # driver-conditions check runs via tools/driver_replay.py; this is
    # the in-suite regression net).
    import duckdb

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        TABLES,
    )
    from tools.selfcheck import lint_result_types, rows_key

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name in (
        "cms_join_size",
        "spearman_rank_correlation",
        "pq_codebook_audit",
    ):
        sdf = registry.QUERIES[name](spark, sf_dir)
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(registry.ORACLES[name])
        arrow = res.arrow()
        d_cols = arrow.schema.names
        d_rows = [tuple(r) for r in zip(*[col.to_pylist() for col in arrow.columns])]
        assert lint_result_types(sdf.dtypes, arrow.schema) == [], name
        assert sorted(sdf.columns) == sorted(d_cols), name
        assert rows_key(s_rows, sdf.columns) == rows_key(d_rows, list(d_cols)), name
