"""Named query registry — the driver contract surface.

Each entry pairs a Spark DataFrame query (built from the operator
library) with a DuckDB-runnable ANSI-SQL oracle. Conventions that make
the order-insensitive value-hash comparison deterministic:

- **Float sums are aggregated in scaled integers** (basis points /
  cents): ``sum(cast(round(x * 10^k) as bigint)) / 10^k`` — integer
  addition is associative, so the result is identical under any
  partitioning/visit order, on Spark and DuckDB alike. Raw double sums
  are NOT reproducible across partitionings and must never be a
  compared output.
- **Timestamps are emitted as epoch microseconds** (``unix_micros`` /
  ``epoch_us``) — bigint on both engines, no timezone/format ambiguity.
- **Every computed column is aliased identically** in the Spark plan
  and the oracle SQL (driver sorts columns by name before hashing).
- **Ranking windows carry a total-order tiebreak** (unique key) so
  row_number is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.cleaning import (
    epoch_us,
    strip_direction_suffix,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
    duplicate_audit,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.freshness import (
    freshness_filter,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.fuzzy import (
    fuzzy_best_match,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
    last_write_wins,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
    tumbling_agg,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.pipeline import (
    star_revenue,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import load_table


def _scaled_sum(col: F.Column, scale: int, alias: str) -> F.Column:
    """Order-independent float sum: per-row scale+round to bigint,
    integer-sum, unscale."""
    return (F.sum(F.round(col * scale).cast("long")) / float(scale)).alias(alias)


# ---------------------------------------------------------------- queries

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate over the fact table.

    Generalizes the reference's count-style reporting aggregates
    (SURVEY.md §2.5 A1/A4) to full group-by metrics. Map-side partial
    aggregation keeps the shuffle at |groups|·|partitions| rows.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _scaled_sum(F.col("l_quantity"), 100, "sum_qty"),
            _scaled_sum(F.col("l_extendedprice"), 100, "sum_base_price"),
            _scaled_sum(disc_price, 10000, "sum_disc_price"),
            _scaled_sum(charge, 10000, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star-schema join+aggregate (see plans.pipeline)."""
    return star_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


ORACLE_STAR_REVENUE = """
SELECT r_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""


def q_coord_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 P1-P3: projection + dirty-string→double cast
    (reference ``src/extract_coordinates.py:17-18``). The dirty value is
    synthesized from integer keys so it is deterministic."""
    n = load_table(spark, sf_dir, "nation")
    lat_raw = F.concat(
        F.col("n_nationkey").cast("string"), F.lit("."), F.col("n_regionkey").cast("string"), F.lit("N")
    )
    lon_raw = F.concat(
        F.col("n_regionkey").cast("string"), F.lit("."), F.col("n_nationkey").cast("string"), F.lit("E")
    )
    return n.select(
        F.col("n_name"),
        lat_raw.alias("lat_raw"),
        lon_raw.alias("lon_raw"),
        strip_direction_suffix(lat_raw).alias("lat"),
        strip_direction_suffix(lon_raw).alias("lon"),
    )


ORACLE_COORD = """
SELECT n_name,
       n_nationkey::VARCHAR || '.' || n_regionkey::VARCHAR || 'N' AS lat_raw,
       n_regionkey::VARCHAR || '.' || n_nationkey::VARCHAR || 'E' AS lon_raw,
       CAST(regexp_replace(n_nationkey::VARCHAR || '.' || n_regionkey::VARCHAR || 'N', '[NSEWnsew]$', '') AS DOUBLE) AS lat,
       CAST(regexp_replace(n_regionkey::VARCHAR || '.' || n_nationkey::VARCHAR || 'E', '[NSEWnsew]$', '') AS DOUBLE) AS lon
FROM nation
"""


def q_dedup_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 J5: within-batch dedup + anti-join vs target keys
    (reference ``check_duplicates``,
    ``src/process_insert_places_data.py:30-49``). Target = the
    already-loaded subset (keys ≡ 0 mod 10)."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 10 == 0)
    return dedup_against_target(c, target, "c_custkey")


ORACLE_DEDUP_LOAD = """
SELECT * FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM customer t WHERE t.c_custkey % 10 = 0 AND t.c_custkey = c.c_custkey
)
"""


def q_duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 A1/A2: duplicate-key audit
    (``src/process_insert_places_data.py:36-48``)."""
    l = load_table(spark, sf_dir, "lineitem")
    return duplicate_audit(l, "l_orderkey")


ORACLE_DUP_AUDIT = """
SELECT l_orderkey, COUNT(*) AS occurrences
FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
"""


def q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 J1 as anti-join: keys in one set absent from another
    (the PK existence probe, set-oriented)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    new = o.join(l.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_anti")
    return new.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        epoch_us("o_orderdate").alias("o_orderdate_us"), "o_orderpriority",
    )


ORACLE_ORDERS_NO_LINEITEMS = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


def q_fk_semi_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 J2: FK semi-join (broadcast) then aggregate —
    lineitems of urgent orders (reference ``check_foreign_key``,
    set-oriented)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    valid = fk_filter(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), o, "o_orderkey"
    )
    return valid.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        _scaled_sum(F.col("l_quantity"), 100, "sum_qty"),
    )


ORACLE_FK_SEMI = """
SELECT l_returnflag, COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag
"""


def q_freshness_latest_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 P8/P9: freshness filter — keep only events in the
    newest hour bucket (reference ``src/ingest_weather_data.py:64-71,142``)."""
    e = load_table(spark, sf_dir, "events")
    fresh = freshness_filter(e, "ts")
    return fresh.select(
        "event_id", "user_id", "event_type", "value",
        epoch_us("ts").alias("ts_us"),
    )


ORACLE_FRESHNESS = """
SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
FROM events
WHERE date_trunc('hour', ts) = (SELECT date_trunc('hour', max(ts)) FROM events)
"""

FUZZY_QUERY_NAMES = [
    "Custoner#000000042",
    "customer#00000001",
    "Cstomer#000000777",
    "Customer#000000123",
    "CUSTOMER#000000999x",
]


def q_fuzzy_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 J4: fuzzy similarity join + per-query argmax
    (reference place-name matching ``src/ingest_places_data.py:50-67``),
    Levenshtein-ratio semantics."""
    c = load_table(spark, sf_dir, "customer")
    queries = spark.createDataFrame(
        [(q,) for q in FUZZY_QUERY_NAMES], ["query_name"]
    )
    best = fuzzy_best_match(queries, c, "query_name", "c_name")
    return best.select(
        "query_name",
        F.col("c_name").alias("best_match"),
        F.round(F.col("similarity"), 6).alias("similarity"),
    )


def _oracle_fuzzy() -> str:
    values = ", ".join(f"('{q}')" for q in FUZZY_QUERY_NAMES)
    return f"""
WITH queries(query_name) AS (VALUES {values}),
scored AS (
  SELECT q.query_name, c.c_name,
         1.0 - levenshtein(lower(q.query_name), lower(c.c_name))::DOUBLE
             / greatest(length(lower(q.query_name)), length(lower(c.c_name)))::DOUBLE AS sim
  FROM queries q CROSS JOIN customer c
)
SELECT query_name, c_name AS best_match, round(sim, 6) AS similarity
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_name ORDER BY sim DESC, c_name ASC) = 1
"""


def q_cdc_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.7 T2 (batch form): collapse an update stream to the
    newest version per key — the in-batch half of the CDC merge
    (reference processed updates serially,
    ``src/process_insert_update_weather_data.py:131-162``)."""
    e = load_table(spark, sf_dir, "events")
    latest = last_write_wins(e, "user_id", "ts", tiebreak="event_id")
    return latest.select(
        "user_id", "event_id", "event_type", "value",
        epoch_us("ts").alias("ts_us"),
    )


ORACLE_LWW = """
SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.7 T4 (batch form): 1-hour tumbling-window aggregation
    per event type."""
    e = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        e, "ts", "1 hour", ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            _scaled_sum(F.col("value"), 10000, "sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        ],
    )
    return out.select(
        epoch_us("window_start").alias("hour_us"),
        "event_type", "n_events", "sum_value", "n_users",
    )


ORACLE_HOURLY = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 JSON functions: extract a field from a JSON string
    column (``get_json_object``), then aggregate."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.withColumn("k_val", k)
        .groupBy("event_type")
        .agg(
            F.sum("k_val").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            (F.sum("k_val") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


ORACLE_JSON = """
SELECT event_type,
       CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n,
       CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT)
         / CAST(COUNT(*) AS BIGINT) AS avg_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------- registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "star_revenue": q_star_revenue,
    "coord_projection_cast": q_coord_projection_cast,
    "dedup_load": q_dedup_load,
    "duplicate_audit": q_duplicate_audit,
    "orders_without_lineitems": q_orders_without_lineitems,
    "fk_semi_urgent": q_fk_semi_urgent,
    "freshness_latest_hour": q_freshness_latest_hour,
    "fuzzy_best_match": q_fuzzy_best_match,
    "cdc_last_write_wins": q_cdc_last_write_wins,
    "hourly_event_stats": q_hourly_event_stats,
    "json_props_extract": q_json_props_extract,
}

ORACLES: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING,
    "star_revenue": ORACLE_STAR_REVENUE,
    "coord_projection_cast": ORACLE_COORD,
    "dedup_load": ORACLE_DEDUP_LOAD,
    "duplicate_audit": ORACLE_DUP_AUDIT,
    "orders_without_lineitems": ORACLE_ORDERS_NO_LINEITEMS,
    "fk_semi_urgent": ORACLE_FK_SEMI,
    "freshness_latest_hour": ORACLE_FRESHNESS,
    "fuzzy_best_match": _oracle_fuzzy(),
    "cdc_last_write_wins": ORACLE_LWW,
    "hourly_event_stats": ORACLE_HOURLY,
    "json_props_extract": ORACLE_JSON,
}
