"""Document chunking: fixed-size overlapping windows over text.

The context-window preparation step of a training pipeline: every
document is cut into ``chunk_chars``-sized pieces starting every
``stride`` characters (overlap = chunk_chars - stride), each chunk
carrying a content fingerprint so downstream exact-dedup can drop
repeated chunks without re-reading the text.

Scale shape: a single map-only projection — ``sequence`` builds the
start offsets in-row, ``explode`` fans out to chunk rows, and
``substring``/``md5`` are whole-stage-codegen JVM expressions. No
shuffle, no Python, output size ≈ |corpus| · len/stride rows; at
100 TB this parallelizes embarrassingly with the input splits.

Determinism: chunk boundaries are a pure function of the text length
and the (chunk_chars, stride) parameters; fingerprints are md5 hex
prefixes — identical on any engine (the DuckDB oracle replays the
same arithmetic with ``generate_series``/``substr``/``md5``).

Reference analogue: the reference never re-windows text, but its
raw-zone jobs slice API payloads into per-hour objects the same
"derive addressable sub-units from one blob" way
(``src/ingest_weather_data.py:118-140``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 64,
    stride: int = 48,
    fp_chars: int = 16,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, chunk_chars, chunk_fp) — one row
    per chunk. Start offsets are 0, stride, 2·stride, … while the
    offset is inside the text; the final chunk may be short. An empty
    text still yields one (empty) chunk so every document survives
    the transform.
    """
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(stride),
    )
    chunk = F.substring(
        F.col(text_col), F.col("_s") + F.lit(1), F.lit(chunk_chars)
    )
    return (
        df.select(F.col(id_col), F.col(text_col), F.explode(starts).alias("_s"))
        .select(
            F.col(id_col),
            (F.col("_s") / stride).cast("long").alias("chunk_idx"),
            F.col("_s").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.substring(F.md5(chunk), 1, fp_chars).alias("chunk_fp"),
        )
    )


def duplicate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 64,
    stride: int = 48,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document chunk-level exact dedup: fingerprints of
    full-size chunks that appear in ≥ ``min_docs`` distinct documents
    — the paragraph/span-granularity companion to document-level
    exact dedup (shared spans survive document-level dedup because
    the *documents* differ; the chunks don't).

    Scale shape: the map-only chunker feeds ONE hash aggregate keyed
    by fingerprint (map-side combined; shuffle bounded by |distinct
    chunks|); short tail chunks are filtered before the aggregate so
    trivial sub-size windows never shuffle. No self-joins.
    """
    chunks = chunk_documents(
        df, id_col=id_col, text_col=text_col,
        chunk_chars=chunk_chars, stride=stride,
    )
    return (
        chunks.filter(F.col("chunk_chars") == chunk_chars)
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(F.col(id_col)).alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
