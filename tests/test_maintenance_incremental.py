"""Compaction and incremental-rollup maintenance operators."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.incremental import (
    agg_state,
    finalize,
    merge_states,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.maintenance import (
    compact,
    dir_bytes,
)


def test_compact_reduces_file_count_and_preserves_rows(spark, tmp_path):
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    frag = str(tmp_path / "frag")
    df.repartition(50).write.parquet(frag)
    n_frag = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_frag == 50

    out = str(tmp_path / "compacted")
    # target far above total size -> exactly one output file
    back = compact(spark, frag, out, target_file_bytes=1 << 30)
    n_out = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_out == 1
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_sizes_from_actual_bytes(spark, tmp_path):
    df = spark.range(20_000).withColumn("s", F.sha2(F.col("id").cast("string"), 256))
    frag = str(tmp_path / "frag")
    df.repartition(40).write.parquet(frag)
    total = dir_bytes(spark, frag)
    target = total // 4
    out = str(tmp_path / "compacted")
    compact(spark, frag, out, target_file_bytes=target)
    n_out = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    # ceil(total/target) is 4 or 5 depending on rounding
    assert n_out in (4, 5)


@pytest.mark.parametrize("splits", [2, 3, 5])
def test_incremental_merge_equals_direct_aggregation(spark, splits):
    df = spark.createDataFrame(
        [(i, "abc"[i % 3], (i * 7 % 100) / 3.0) for i in range(999)],
        "id long, k string, v double",
    )
    direct = finalize(agg_state(df, ["k"], "v"))
    batched = finalize(
        merge_states(
            [agg_state(df.filter(F.col("id") % splits == i), ["k"], "v") for i in range(splits)],
            ["k"],
        )
    )
    key = lambda r: r.k  # noqa: E731
    d = {key(r): (r.n, r.vmin, r.vmax, r.vsum, r.vavg) for r in direct.collect()}
    b = {key(r): (r.n, r.vmin, r.vmax, r.vsum, r.vavg) for r in batched.collect()}
    assert d == b  # monoid identity: any batching merges to the same state


def test_compact_store_in_place_swap_with_footer_invariant(spark, tmp_path):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.maintenance import (
        compact_store,
        footer_row_count,
        parquet_file_count,
    )

    store = str(tmp_path / "store")
    df = spark.range(8_000).withColumn("cell", F.col("id") % 7)
    # simulate per-batch appends: many small file-sets at one path
    for _ in range(6):
        df.repartition(8).write.mode("append").parquet(store)
    assert parquet_file_count(store) == 48
    before = footer_row_count(store)
    assert before == 48_000

    stats = compact_store(spark, store, target_file_bytes=1 << 30,
                          cluster_by=["cell"])
    assert stats["files_before"] == 48
    assert stats["files_after"] < 48
    assert stats["rows"] == before
    back = spark.read.parquet(store)
    assert back.count() == before
    # cluster_by must keep `cell` a REAL column (no hive-dir retyping)
    assert dict(back.dtypes)["cell"] == "bigint"


def test_compact_store_refuses_and_preserves_old_generation_on_mismatch(
    spark, tmp_path, monkeypatch
):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        maintenance,
    )

    store = str(tmp_path / "store")
    spark.range(1_000).write.parquet(store)
    real = maintenance.footer_row_count
    calls = {"n": 0}

    def lying_counter(path):
        calls["n"] += 1
        return real(path) if calls["n"] == 1 else real(path) + 1

    monkeypatch.setattr(maintenance, "footer_row_count", lying_counter)
    with pytest.raises(RuntimeError, match="invariant violated"):
        maintenance.compact_store(spark, store)
    # old generation untouched, tmp generation cleaned up
    assert real(store) == 1_000
    assert not any(
        d.startswith("store.compact") for d in os.listdir(str(tmp_path))
    )
