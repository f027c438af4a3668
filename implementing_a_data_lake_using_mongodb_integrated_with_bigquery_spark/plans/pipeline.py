"""Pipeline assemblies — the reference's end-to-end dataflows as
single declarative Spark plans.

``weather_fact_load`` is the whole CDC insert path
(``src/process_insert_update_weather_data.py:97-127``) as ONE plan:
dedup → PK anti-join → FK semi-join → flatten → (append). The reference
spent 2-3 network round-trips *per record*; here the entire batch is
one broadcast-joined, codegen-fused job.

``star_revenue`` is the flagship verification query: the star-schema
join+aggregate the warehouse exists to serve (README.md:9 — hourly data
per place feeding analytics), phrased over the synthetic star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.flatten import (
    flatten_weather,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
)


def weather_fact_load(
    raw_batch: DataFrame, places_dim: DataFrame, fact_target: DataFrame
) -> DataFrame:
    """Raw nested docs → deduped, FK-validated, flattened fact rows
    ready to append. Idempotent w.r.t. ``fact_target``."""
    fresh = dedup_against_target(raw_batch, fact_target.selectExpr("id as _id"), "_id")
    valid = fk_filter(fresh, places_dim, "place_id")
    return flatten_weather(valid)


def star_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue per region/nation over a date window (TPC-H Q5 shape).

    Join strategy at scale: nation/region (and at real scale, any dim
    under the broadcast threshold) broadcast; lineitem⋈orders is the one
    big shuffle, on the join key both sides — AQE handles skew. Revenue
    is aggregated in integer basis points so the sum is exact and
    order-independent (float sums are not associative; a 1000-executor
    re-partitioning must not change the answer).
    """
    revenue_bp = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    joined = (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg((F.sum(revenue_bp) / 10000.0).alias("revenue"))
        .select("r_name", "n_name", "revenue")
    )
