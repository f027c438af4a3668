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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


# --------------------------------------------------------------------------
# Custom Python DataSource WRITER (Spark 4 API) — the reference's
# warehouse-load leg (BigQuery insert loop,
# ``src/process_insert_places_data.py:30-49``) as a first-class sink
# with a real two-phase commit: executors write staged part files and
# return commit messages; the DRIVER's commit() publishes a manifest
# listing exactly the committed parts — readers trust the manifest, so
# a failed/speculative task's orphan file is never visible. Local-FS
# paths here; on a cluster the same protocol targets shared storage.


class JsonlPartCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlAuditWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # staged name: invisible to readers until commit() manifests it
        fn = os.path.join(
            self.path, f"_staged-{pid}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(fn, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonlPartCommit(fn, n)

    def commit(self, messages):
        import json
        import os
        import uuid

        if self.overwrite:
            # overwrite mode clears every previously committed part +
            # manifest, plus _staged-* orphans from a crashed prior save
            # (where abort never ran) — but NOT this run's own staged
            # parts (about to be renamed into place) and NOT fresh
            # staged parts younger than the reap age: those may belong
            # to a concurrent append-mode save whose commit() has not
            # run yet, and removing them mid-write would fail that
            # writer's os.replace. An orphan from a crash is by
            # definition old; a concurrent writer's parts are not.
            import time

            reap_age_s = 3600.0
            now = time.time()
            live = {
                os.path.basename(m.path) for m in messages if m is not None
            }
            for fn in os.listdir(self.path):
                full = os.path.join(self.path, fn)
                if fn.startswith(("part-", "_MANIFEST")):
                    os.remove(full)
                elif fn.startswith("_staged-") and fn not in live:
                    try:
                        stale = now - os.stat(full).st_mtime > reap_age_s
                    except FileNotFoundError:
                        continue  # a concurrent commit renamed it away
                    if stale:
                        os.remove(full)
        # commit-scoped names: a second append-mode save publishes its
        # own manifest + parts instead of clobbering the first commit's
        # (the reader aggregates every _MANIFEST*.json)
        commit_id = uuid.uuid4().hex[:8]
        files = []
        total = 0
        for i, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"part-{commit_id}-{i:05d}.jsonl")
            os.replace(m.path, final)
            files.append(os.path.basename(final))
            total += m.n_rows
        with open(
            os.path.join(self.path, f"_MANIFEST-{commit_id}.json"), "w"
        ) as f:
            json.dump({"files": sorted(files), "rows": total}, f)

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlAuditStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: each micro-batch commits its own part files
    plus a per-batch manifest — the exactly-once contract is
    (batchId, manifest) idempotence, same as the file sink's log."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]

    def write(self, iterator):
        return JsonlAuditWriter({"path": self.path}, False).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        files = []
        total = 0
        for i, m in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"batch-{batchId:05d}-{i:05d}.jsonl")
            os.replace(m.path, final)
            files.append(os.path.basename(final))
            total += m.n_rows
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId:05d}.json"), "w"
        ) as f:
            json.dump({"batch": batchId, "files": sorted(files), "rows": total}, f)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", dir).save()`` —
    and the same sink streams via ``writeStream.format("jsonl_audit")``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_audit"

    def writer(self, schema, overwrite: bool) -> JsonlAuditWriter:
        return JsonlAuditWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlAuditStreamWriter:
        return JsonlAuditStreamWriter(self.options, overwrite)


def register_jsonl_audit(spark) -> None:
    """Idempotent registration of the custom sink."""
    spark.dataSource.register(JsonlAuditDataSource)


def read_jsonl_audit(spark, path: str, schema: str):
    """Manifest-trusting reader for the sink's output: only files the
    committed manifest(s) list are read — staged orphans stay
    invisible, which is the point of the two-phase commit."""
    import json as _json
    import os as _os

    files: list[str] = []
    for fn in sorted(_os.listdir(path)):
        if fn.startswith("_MANIFEST") and fn.endswith(".json"):
            with open(_os.path.join(path, fn)) as f:
                files.extend(
                    _os.path.join(path, p) for p in _json.load(f)["files"]
                )
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
