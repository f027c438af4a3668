"""Round-11 pins: the fasttext-style quality classifier (engine-exact
integer inference, map-only scoring plan) and the data-volume-
dependent-broadcast audit (the one executed-plan scale class the
global-window / low-par-window / unbounded-buffer detectors don't
cover)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
    quality_classifier_scores,
    quality_weights,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.explain import (
    broadcast_exchange_stats,
    count_oversized_broadcasts,
    count_shuffles,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    load_table,
)


# ------------------------------------------------ quality classifier


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — Spark `div` / DuckDB
    `//` semantics (Python's // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ref_score_micro(text: str, w: list[int], bias: int) -> int:
    toks = text.split(" ")
    s = sum(
        w[int(hashlib.md5(f"qcls:{t}".encode()).hexdigest()[:4], 16) % 64]
        for t in toks
    )
    return _trunc_div(s * 1000, len(toks)) + bias * 1000


def test_quality_weights_deterministic_and_bounded():
    w, bias = quality_weights(64)
    w2, bias2 = quality_weights(64)
    assert (w, bias) == (w2, bias2)
    assert len(w) == 64
    assert all(-1000 <= x <= 1000 for x in w)
    assert -1000 <= bias <= 1000
    # weights must not be degenerate (all one sign would make the
    # keep/drop threshold untestable)
    assert any(x > 0 for x in w) and any(x < 0 for x in w)


def test_quality_classifier_matches_python_reference(spark, sf_dir):
    w, bias = quality_weights(64)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r["doc_id"]: (r["score_micro"], r["keep"])
        for r in quality_classifier_scores(docs, w, bias).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got, "no documents scored"
    for doc_id, text in texts.items():
        exp = _ref_score_micro(text, w, bias)
        assert got[doc_id] == (exp, 1 if exp >= 0 else 0), doc_id
    # both classes must occur at this SF or the threshold is untested
    keeps = {k for _, k in got.values()}
    assert keeps == {0, 1}


def test_quality_classifier_scoring_pass_is_map_only(spark, sf_dir):
    w, bias = quality_weights(64)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = quality_classifier_scores(docs, w, bias)
    scored.collect()
    assert count_shuffles(scored) == 0


# ------------------------------------- broadcast size/growth audit


@pytest.fixture()
def hint_only_broadcasts(spark):
    """Disable AQE/static auto-broadcast so every BroadcastExchange in
    a plan is hint-forced — the size-blind class the audit targets."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset conf
            saved[k] = None
        spark.conf.set(k, "-1")
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_synthetic_violator_broadcast_of_unfiltered_fact_flags(
    hint_only_broadcasts, sf01_dir
):
    spark = hint_only_broadcasts
    li = load_table(spark, sf01_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf01_dir, "orders").select("o_orderkey")
    df = orders.join(
        F.broadcast(li), F.col("o_orderkey") == F.col("l_orderkey")
    )
    df.collect()
    stats = broadcast_exchange_stats(df)
    assert stats, "hinted broadcast missing from executed plan"
    assert max(s["rows"] or 0 for s in stats) >= 10_000
    assert count_oversized_broadcasts(df) >= 1


def test_bounded_dim_broadcast_passes(hint_only_broadcasts, sf01_dir):
    spark = hint_only_broadcasts
    nation = load_table(spark, sf01_dir, "nation")
    cust = load_table(spark, sf01_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    df = cust.join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    df.collect()
    stats = broadcast_exchange_stats(df)
    assert stats and all((s["rows"] or 0) <= 25 for s in stats)
    assert count_oversized_broadcasts(df) == 0


def test_growth_classifier_rule():
    from tools.broadcast_probe import classify

    # domain-bounded: same rows at 10x the data — passes
    assert classify(25, 25, 1 << 10) == []
    # data-proportional: 10x rows at 10x data — flags
    assert classify(2000, 20000, 1 << 20)
    # below the row floor, growth alone doesn't flag (a 30->300-row
    # centroid table is noise, not a fact)
    assert classify(30, 300, 1 << 10) == []
    # fat rows: few rows but a huge built relation — flags
    assert classify(500, 500, 80 << 20)


def test_broadcast_audit_artifact_allowlist():
    """The probe's adjudicated allowlist is CLOSED: any new flagged
    query in BROADCAST_AUDIT.json fails the suite until adjudicated
    here (the test_round9/test_round10 pin pattern)."""
    path = "/root/repo/BROADCAST_AUDIT.json"
    if not os.path.exists(path):
        pytest.skip("BROADCAST_AUDIT.json not generated yet")
    with open(path) as fh:
        audit = json.load(fh)
    allowed: set[str] = set()
    assert set(audit["flagged"]) <= allowed, audit["flagged"]


# ------------------------------------------------ DSIR resampling


def test_dsir_weights_rank_target_language_highest(spark, sf01_dir):
    """DSIR's importance weights must rank the TARGET domain (en)
    strictly highest in mean selected log-weight — the direction
    invariant that survives even when the synthetic corpora overlap
    enough for selection rates to stay near-uniform."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.registry import (
        q_dsir_importance_resample,
    )

    rows = {
        r["lang"]: r
        for r in q_dsir_importance_resample(spark, sf01_dir).collect()
    }
    assert set(rows) == {"de", "en", "es", "fr", "zh"}
    en = rows["en"]["avg_logw_micro"]
    assert all(
        en > rows[lang]["avg_logw_micro"] for lang in ("de", "es", "fr", "zh")
    )
    # fixed-k selection: exactly 200 docs selected corpus-wide
    assert sum(r["n_selected"] for r in rows.values()) == 200
