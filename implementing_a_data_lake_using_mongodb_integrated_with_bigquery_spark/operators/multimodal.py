"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (for image/audio/video corpora at 100 TB):

- The payload is an opaque ``binary`` column; typed metadata (mime,
  dims, duration) travels in ordinary columns so Catalyst can prune,
  filter, and partition WITHOUT touching bytes. Filters like
  ``mime = 'image/png' AND width > 64`` push down to the parquet scan;
  the heavy binary column is only read when a stage actually decodes.
- Decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages: Arrow-batched bytes in, declared schema out.
  Batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so executor memory is payload-size-aware.
- The actual codec calls (PIL/ffmpeg/torchaudio) are NOT available in
  this environment and are STUBBED behind ``try: import`` — the
  deterministic fallback derives pseudo-features from the payload
  bytes so the Spark-side plumbing (schema, batching, partitioning) is
  fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)


def _decode_real(payload: bytes) -> list[float]:  # pragma: no cover
    """Real decode path — requires an image codec, absent here."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; not available in this environment"
    )


def _decode_stub(payload: bytes) -> float:
    """Deterministic fake 'decoded feature': mean of the md5 digest
    bytes scaled to [0,1]. Stands in for a real decoder so the
    distributed plumbing is exercised end-to-end."""
    digest = hashlib.md5(payload).digest()
    return sum(digest) / (len(digest) * 255.0)


try:  # pragma: no cover - codec never present in this container
    import PIL.Image  # noqa: F401

    _HAVE_CODEC = True
except Exception:
    _HAVE_CODEC = False


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payloads → per-item features via mapInPandas (Arrow
    batches; one Python worker per partition, no driver involvement)."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feat_mean": payloads.map(lambda b: _decode_stub(bytes(b))),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)
