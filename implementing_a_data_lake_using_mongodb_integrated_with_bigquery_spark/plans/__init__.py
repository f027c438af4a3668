from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.plans.pipeline import (
    star_revenue,
    weather_fact_load,
)

__all__ = ["star_revenue", "weather_fact_load"]
