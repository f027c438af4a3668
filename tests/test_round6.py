"""Round-6 tests: the one-batch-lag late filter in UPDATE-mode phased
replays, ranking metrics, IVF index reuse, and streaming near-dup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
    update_merge_phased,
)


def _mk_ts_df(spark, *times):
    return spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, h, m),) for h, m in times], "ts timestamp"
    )


def test_update_merge_phased_late_filter_lags_one_batch(spark):
    """Pins SPARK-24634's two-watermark split as update_merge_phased
    documents it: batch i's LATE filter uses the watermark in effect
    during batch i-1 (data through batch i-2), while EVICTION uses the
    batch's own watermark. So a late row in batch 1 (phase 2) is still
    counted — the filter watermark is the pre-run 0 — and an equally
    late row in batch 2 (phase 3) is dropped against the phase-1
    watermark."""
    # phase 1: 10:00 and 12:00 -> in-effect watermark after batch 0 =
    # 12:00 - 2h = 10:00
    p1 = _mk_ts_df(spark, (10, 0), (12, 0))
    # phase 2: 00:30 (window end 01:00 <= 10:00, yet KEPT: filter
    # watermark for batch 1 is still 0) + fresh 12:30
    p2 = _mk_ts_df(spark, (0, 30), (12, 30))
    # phase 3: 01:30 (end 02:00 <= 10:00 -> DROPPED against the
    # phase-1 watermark) + fresh 13:00
    p3 = _mk_ts_df(spark, (1, 30), (13, 0))
    out, stats = update_merge_phased(
        spark, [p1, p2, p3], lateness="2 hours", group_cols=[]
    )
    got = {
        r["window_start"].hour: r["n_events"]
        for r in out.collect()
    }
    assert stats["data_batches"] == 3
    assert stats["rows_per_batch"] == [2, 2, 2]
    # batch 0 and 1 dropped nothing; batch 2 dropped the 01:30 row
    assert stats["rows_dropped"][0] == 0 and stats["rows_dropped"][1] == 0
    assert stats["rows_dropped"][2] > 0
    # 00:30 survived (lagged filter), 01:30 did not
    assert got == {0: 1, 10: 1, 12: 2, 13: 1}


def test_update_merge_phased_guards_batch_structure(spark):
    """The phase/batch correspondence is asserted, not assumed: the
    stats report one data batch per phase with the constructed sizes."""
    p1 = _mk_ts_df(spark, (1, 0), (2, 0), (3, 0))
    p2 = _mk_ts_df(spark, (4, 0))
    out, stats = update_merge_phased(
        spark, [p1, p2], lateness="10 hours", group_cols=[]
    )
    assert stats["rows_per_batch"] == [3, 1]
    assert sum(r["n_events"] for r in out.collect()) == 4


def test_ranking_metrics_hand_case(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        discount_table,
        ranking_metrics,
    )

    disc = discount_table(3)
    exact = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "a", 1), ("q2", "b", 2), ("q2", "c", 3),
         ("q3", "a", 1), ("q3", "b", 2)],  # truncated truth: n_rel=2
        ["q_id", "vec_id", "rank"],
    )
    cand = spark.createDataFrame(
        [("q1", "b", 1), ("q1", "x", 2), ("q1", "a", 3),
         ("q2", "x", 1), ("q2", "y", 2), ("q2", "z", 3),
         ("q3", "b", 1), ("q3", "a", 2)],
        ["q_id", "vec_id", "rank"],
    )
    out = {r["q_id"]: r for r in ranking_metrics(exact, cand, k=3).collect()}
    # q1: hits at candidate ranks 1 and 3
    assert out["q1"]["dcg_scaled"] == disc[0] + disc[2]
    assert out["q1"]["first_rel_rank"] == 1 and out["q1"]["mrr"] == 1.0
    assert out["q1"]["ndcg_at_k"] == round(
        (disc[0] + disc[2]) / sum(disc), 6
    )
    # q2: no relevant hit -> zeros
    assert out["q2"]["dcg_scaled"] == 0
    assert out["q2"]["first_rel_rank"] == 0
    assert out["q2"]["mrr"] == 0.0 and out["q2"]["ndcg_at_k"] == 0.0
    # q3: perfect 2-item ranking against a 2-item truth -> IDCG uses
    # min(k, n_rel)=2, so ndcg is exactly 1
    assert out["q3"]["n_rel"] == 2
    assert out["q3"]["ndcg_at_k"] == 1.0 and out["q3"]["mrr"] == 1.0
    # average precision: L = lcm(1..3) = 6; q1 hits at ranks 1 and 3
    # (hits=1, 2) -> ap_scaled = 1*6 + 2*2 = 10, AP = 10/(6*3)
    assert out["q1"]["ap_scaled"] == 10
    assert out["q1"]["avg_prec_at_k"] == round(10 / 18, 6)
    assert out["q2"]["ap_scaled"] == 0 and out["q2"]["avg_prec_at_k"] == 0.0
    # q3 perfect ranking -> AP exactly 1
    assert out["q3"]["avg_prec_at_k"] == 1.0


def test_ivf_index_persist_probe_parity(spark, sf_dir, tmp_path):
    """The persisted index probes to exactly the same result as the
    in-memory build, and the probe plan statically prunes unprobed
    inverted-list partitions."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        ivf_topk_from_index,
        ivf_topk_learned,
        persist_ivf_index,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "ivf")
    persist_ivf_index(emb, root, n_clusters=16, sample_fraction=0.5)
    live = ivf_topk_learned(
        emb, query_ids=[0, 1, 2], k=5, nprobe=4, sample_fraction=0.5
    )
    stored = ivf_topk_from_index(spark, root, query_ids=[0, 1, 2], k=5, nprobe=4)
    key = lambda r: (r["q_id"], r["rank"])
    a = sorted(
        ((r["q_id"], r["rank"], r["vec_id"], r["similarity"]) for r in live.collect())
    )
    b = sorted(
        ((r["q_id"], r["rank"], r["vec_id"], r["similarity"]) for r in stored.collect())
    )
    assert a == b and len(a) == 15
    # static partition pruning: the literal isin over the partition
    # column must reach the scan as a partition filter
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan


def test_incremental_dedup_stream_matches_sequential_batch(spark, sf_dir):
    """Stream == batch parity: the accreting stream over two
    micro-batches must equal composing the batch operator sequentially
    (phase 2 screened against corpus ∪ phase-1 novels)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        incremental_dedup,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.dedup_stream import (
        incremental_dedup_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(10))
    corpus, p1, p2 = docs.filter(m < 6), docs.filter(m.isin(6, 7)), docs.filter(m.isin(8, 9))

    streamed, stats = incremental_dedup_stream(spark, corpus, [p1, p2])
    assert stats["data_batches"] == 2

    v1 = incremental_dedup(corpus, p1)
    novel1 = p1.join(
        v1.filter("is_novel").select("doc_id"), "doc_id"
    )
    v2 = incremental_dedup(corpus.unionByName(novel1), p2)
    expected = {
        (r["doc_id"], r["is_novel"], r["dup_of"], r["jaccard"])
        for r in v1.collect() + v2.collect()
    }
    got = {
        (r["doc_id"], r["is_novel"], r["dup_of"], r["jaccard"])
        for r in streamed.collect()
    }
    assert got == expected and len(got) > 0


def test_pyds_overwrite_cleans_stale_staged_orphans(spark, tmp_path):
    """A crashed prior save (abort never ran) leaves OLD _staged-*
    orphans; an overwrite commit must remove those along with old
    parts, while a FRESH staged file — possibly a concurrent append's
    in-flight part — must survive the reap (age-threshold rule)."""
    import os

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.pyds import (
        read_jsonl_audit,
        register_jsonl_audit,
    )

    register_jsonl_audit(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    # crashed save's orphan: hours old
    stale = os.path.join(out, "_staged-0-deadbeef.jsonl")
    with open(stale, "w") as f:
        f.write('{"id": 99, "v": "orphan"}\n')
    os.utime(stale, (1_600_000_000, 1_600_000_000))
    # concurrent writer's in-flight part: fresh mtime
    fresh = os.path.join(out, "_staged-1-cafebabe.jsonl")
    with open(fresh, "w") as f:
        f.write('{"id": 98, "v": "inflight"}\n')
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    df.write.format("jsonl_audit").option("path", out).mode("overwrite").save()
    names = os.listdir(out)
    assert not any(n == os.path.basename(stale) for n in names)
    assert os.path.basename(fresh) in names  # concurrent save survives
    back = read_jsonl_audit(spark, out, "id long, v string")
    assert [r["id"] for r in back.collect()] == [1]


def test_check_dim_sees_mixed_lengths_past_first_row(spark):
    """The inline dim guard covers every row at zero extra scans — a
    corpus with one short vector buried mid-table fails fast inside the
    projection that consumes it, without a separate min/max pass."""
    import pytest
    from pyspark.sql import functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        _dim_checked,
    )

    good = spark.createDataFrame(
        [(1, [0.1] * 4), (2, [0.2] * 4)], "vec_id long, embedding array<double>"
    )
    assert (
        good.select(F.size(_dim_checked(F.col("embedding"), 4, "test"))).count() == 2
    )  # no raise
    mixed = spark.createDataFrame(
        [(1, [0.1] * 4), (2, [0.2] * 3), (3, [0.3] * 4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="expected dim=4"):
        mixed.select(F.size(_dim_checked(F.col("embedding"), 4, "test"))).collect()


def test_bench_diff_gate(tmp_path):
    """bench_diff exits 1 only when a common query regresses >=2x AND
    >=+0.5s."""
    import json
    import subprocess
    import sys

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({"queries": {"a": 1.0, "b": 0.1, "c": 2.0}}))
    # a regresses 2.5x/+1.5s (gated); b regresses 3x but only +0.2s (not)
    new.write_text(json.dumps({"queries": {"a": 2.5, "b": 0.3, "c": 2.0}}))
    r = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(new)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 1 and "REGRESSION a" in r.stdout
    assert "REGRESSION b" not in r.stdout
    ok = subprocess.run(
        [sys.executable, "tools/bench_diff.py", str(old), str(old)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert ok.returncode == 0
