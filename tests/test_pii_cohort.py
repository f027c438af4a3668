"""Unit tests: PII scan/redaction (operators/pii.py), cohort
retention + funnel (operators/cohort.py), mixture weights
(operators/sampling.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.cohort import (
    cohort_retention,
    funnel,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.pii import (
    pii_scan,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
    mixture_weights,
)


# ------------------------------------------------------------ PII

def test_pii_scan_categories_and_masking(spark):
    rows = [
        (1, "mail me at jo.doe+x@mail.example.org thanks"),
        (2, "card 1234-5678-9012-3456 expires soon"),
        (3, "server at 192.168.0.1 and 10.0.0.255"),
        (4, "call 555-867-5309 today"),
        (5, "clean text with no identifiers at all"),
        (6, "a@b.io then 1111-2222-3333-4444 then 8.8.8.8 then 555-000-1111"),
    ]
    out = {r.doc_id: r for r in pii_scan(spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1].n_email == 1 and out[1].redacted == "mail me at [EMAIL] thanks"
    assert out[2].n_card == 1 and "[CARD]" in out[2].redacted
    assert out[3].n_ipv4 == 2 and out[3].redacted == "server at [IP] and [IP]"
    assert out[4].n_phone == 1 and out[4].redacted == "call [PHONE] today"
    assert out[5].n_pii == 0 and out[5].redacted == rows[4][1]
    assert out[6].n_pii == 4
    assert out[6].redacted == "[EMAIL] then [CARD] then [IP] then [PHONE]"


def test_pii_card_not_eaten_by_phone(spark):
    # 16-digit card must become ONE [CARD], not a partial [PHONE]
    df = spark.createDataFrame([(1, "9999-8888-7777-6666")], ["doc_id", "text"])
    r = pii_scan(df).collect()[0]
    assert r.n_card == 1 and r.n_phone == 0 and r.redacted == "[CARD]"


# ------------------------------------------------- cohort retention

def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_cohort_retention_triangle(spark):
    jan = lambda d, h=0: datetime(2024, 1, d, h)  # 2024-01-01 is a Monday
    rows = [
        (1, "view", jan(1)), (1, "view", jan(2)),   # u1 cohort W0, active W0
        (1, "view", jan(8)),                        # ... and W1
        (2, "view", jan(3)),                        # u2 cohort W0, only W0
        (3, "view", jan(9)), (3, "view", jan(22)),  # u3 cohort W1, active W1+W3
    ]
    got = {
        (r.cohort_us, r.period_offset): r.n_users
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    # createDataFrame naive datetimes land in the session TZ (UTC here)
    w0 = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    w1 = int(datetime(2024, 1, 8, tzinfo=timezone.utc).timestamp() * 1_000_000)
    assert got == {(w0, 0): 2, (w0, 1): 1, (w1, 0): 1, (w1, 2): 1}


def test_cohort_retention_rejects_bad_period(spark):
    with pytest.raises(ValueError):
        cohort_retention(_ev(spark, [(1, "view", datetime(2024, 1, 1))]), period="month")


# ----------------------------------------------------------- funnel

def test_funnel_strict_ordering(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes the whole funnel in order
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # u2 clicks BEFORE viewing: reaches stage 0 only
        (2, "click", t(0)), (2, "view", t(1)),
        # u3 views then clicks, never purchases
        (3, "view", t(0)), (3, "click", t(5)),
        # u4 purchase only: no view, reaches nothing
        (4, "purchase", t(0)),
    ]
    got = {r.stage: r.n_users for r in funnel(_ev(spark, rows)).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_simultaneous_does_not_convert(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(1, "view", t0), (1, "click", t0)]
    got = {r.stage: r.n_users for r in funnel(_ev(spark, rows)).collect()}
    assert got == {"view": 1, "click": 0, "purchase": 0}


def test_funnel_rejects_single_stage(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, [(1, "view", datetime(2024, 1, 1))]), stages=("view",))


# -------------------------------------------------- mixture weights

def test_mixture_weights_sqrt_scaling(spark):
    rows = [("a", 400), ("a", 500), ("b", 100)]  # a: 900 tokens, b: 100
    df = spark.createDataFrame(rows, ["src", "n"])
    out = {r.src: r for r in mixture_weights(df, ["src"], "n").collect()}
    assert out["a"].n_docs == 2 and out["a"].n_tokens == 900
    # sqrt(900)=30, sqrt(100)=10 -> weights 0.75 / 0.25
    assert out["a"].weight == 0.75 and out["b"].weight == 0.25
    assert out["a"].w_scaled == 30_000_000 and out["b"].w_scaled == 10_000_000


def test_mixture_weights_sum_to_one(spark):
    rows = [(f"s{i % 7}", (i * 37) % 1000 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["src", "n"])
    total = sum(r.weight for r in mixture_weights(df, ["src"], "n").collect())
    assert abs(total - 1.0) < 1e-4
