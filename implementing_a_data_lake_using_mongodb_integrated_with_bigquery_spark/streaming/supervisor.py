"""Restart-on-failure supervision for streaming queries (SURVEY §2.7 T8).

The reference runs its CDC daemon under ``src/monitor.sh:12-24``: launch
the process, trap termination, publish an SNS alert, and rely on an
operator (or a wrapping service) to bring it back. Spark-natively the
supervisor IS driver code: await the ``StreamingQuery``, and on a
failed termination alert + resubmit with bounded exponential backoff.

Restart safety is provided by the pipeline's own design, not the
supervisor: Structured Streaming checkpointing replays the in-flight
micro-batch on restart, and the CDC merge is idempotent under replay
(PK anti-join inserts, last-write-wins partition-scoped upserts — see
``streaming/cdc_merge.py``), so at-least-once delivery across a crash
still yields exactly-once target state. The e2e test kills a query
mid-batch AFTER its side effects and asserts the restarted run leaves
the target exactly as if no crash happened.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.errors import StreamingQueryException


def supervise(
    start_query: Callable,
    max_restarts: int = 3,
    backoff_s: float = 0.5,
    on_alert: Callable[[str], None] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> dict:
    """Run ``start_query`` (a zero-arg callable returning a started
    ``StreamingQuery``) to termination, restarting on failure.

    - clean termination → return ``{"attempts", "restarts",
      "succeeded": True}``.
    - failed termination → fire ``on_alert`` (the reference's SNS
      publish), sleep ``backoff_s * 2**restart`` (driver-side metadata
      wait, no executor held), resubmit. After ``max_restarts``
      consecutive failed restarts the final exception propagates —
      a poison pipeline must page a human, not flap forever.
    """
    attempt = 0
    while True:
        attempt += 1
        query = start_query()
        try:
            query.awaitTermination()
            return {
                "attempts": attempt,
                "restarts": attempt - 1,
                "succeeded": True,
            }
        except StreamingQueryException as exc:
            if on_alert is not None:
                on_alert(str(exc))
            if attempt > max_restarts:
                raise
            sleep(backoff_s * (2 ** (attempt - 1)))
