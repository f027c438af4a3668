"""Custom Python DataSource (Spark 4 API) — the reference's REST API
scan as a first-class, PARTITIONED source.

The reference fetches weather observations with a driver-side
``requests`` loop (``src/ingest_weather_data.py:55-80``, one HTTP call
per place, sequential). The Spark-native shape is a custom data source:
``spark.read.format("weather_api")`` plans one input partition per
place shard, and EXECUTORS fetch their shards in parallel — the driver
never touches a payload. The HTTP call itself is stubbed with a
deterministic synthetic response (this container has no network and
the reference's API key is long dead); the partition planning, option
handling, schema contract, and executor-side iteration are the real
thing, and the determinism makes the source oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Deterministic stand-in for one observation payload: integer hash
# arithmetic both engines can replicate exactly (no floats until the
# final exact /10 scaling).
_KNUTH = 2654435761


def _observation(obs_id: int) -> tuple:
    x = (obs_id * _KNUTH) % 1000
    return (obs_id, x // 10 / 10.0, x % 100)


class WeatherApiReader(DataSourceReader):
    def __init__(self, options: dict):
        self.places = int(options.get("places", 30))
        self.hours = int(options.get("hours", 24))
        self.shards = int(options.get("shards", 8))

    def partitions(self):
        # one partition per place shard — the unit of executor-side
        # parallel "fetching"
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition):
        shard = partition.value
        for place in range(shard, self.places, self.shards):
            for hour in range(self.hours):
                obs_id = place * self.hours + hour
                _id, temp_c, humidity = _observation(obs_id)
                yield (_id, place, hour, temp_c, humidity)


class WeatherApiStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same synthetic API: each offset is
    the next unpolled HOUR (the reference polls its API hourly —
    ``README.md:13``). ``read(start)`` returns that hour's observations
    for every place plus the advanced offset; Spark handles replay
    bookkeeping through the checkpointed offset dict, so a crashed
    stream resumes at the exact hour it last committed."""

    def __init__(self, options: dict):
        self.places = int(options.get("places", 30))
        self.hours = int(options.get("hours", 24))

    def initialOffset(self) -> dict:
        return {"hour": 0}

    def read(self, start: dict):
        h = int(start["hour"])
        if h >= self.hours:
            return iter([]), {"hour": h}
        rows = []
        for place in range(self.places):
            obs_id = place * self.hours + h
            _id, temp_c, humidity = _observation(obs_id)
            rows.append((_id, place, h, temp_c, humidity))
        return iter(rows), {"hour": h + 1}


class WeatherApiDataSource(DataSource):
    """``spark.read.format("weather_api").option("places", N)...`` —
    and the same source streams: ``spark.readStream.format(
    "weather_api")`` polls one synthetic hour per micro-batch."""

    @classmethod
    def name(cls) -> str:
        return "weather_api"

    def schema(self) -> str:
        return (
            "obs_id bigint, place_key bigint, obs_hour bigint, "
            "temp_c double, humidity bigint"
        )

    def reader(self, schema) -> WeatherApiReader:
        return WeatherApiReader(self.options)

    def simpleStreamReader(self, schema) -> WeatherApiStreamReader:
        return WeatherApiStreamReader(self.options)


def register_weather_api(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(WeatherApiDataSource)


def weather_api_oracle_sql(places: int = 30, hours: int = 24) -> str:
    """DuckDB twin of the synthetic payload generator."""
    return f"""
WITH ids AS (
  SELECT p.range AS place_key, h.range AS obs_hour,
         p.range * {hours} + h.range AS obs_id
  FROM range({places}) p, range({hours}) h
)
SELECT obs_id, place_key, obs_hour,
       CAST(((obs_id * {_KNUTH}) % 1000) // 10 AS DOUBLE) / 10.0 AS temp_c,
       (obs_id * {_KNUTH}) % 1000 % 100 AS humidity
FROM ids
"""
