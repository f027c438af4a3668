"""Driver-environment replica of tools/selfcheck.py.

The external driver imports ``__spark_entry__`` into a VANILLA
SparkSession (no tuned confs) in whatever timezone the host has.
This tool reruns the selfcheck comparison under exactly those
conditions — vanilla ``SparkSession.builder`` and a hostile non-UTC
process TZ — so a query that silently depends on `get_spark()`'s
session tuning (UTC, NTZ inference, arrow) fails HERE, not in the
driver's CORRECTNESS artifact. Session-critical confs must be
re-asserted inside ``sources/tables.py:load_table`` for this to pass.

Usage: python tools/driver_replay.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

os.environ["TZ"] = "Asia/Ho_Chi_Minh"
time.tzset()

sys.path.insert(0, "/root/repo")

import tools.selfcheck as selfcheck  # noqa: E402


def _vanilla_spark(*_a, **_k):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


selfcheck.get_spark = _vanilla_spark

if __name__ == "__main__":
    selfcheck.main()
