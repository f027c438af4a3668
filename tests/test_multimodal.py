"""Multimodal plumbing tests: binary payloads through mapInPandas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
    _decode_real,
    extract_features,
)


def test_extract_features_binary_roundtrip(spark):
    payloads = [b"\x00\x01\x02fake-image-bytes", b"", b"\xff" * 1024]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_features(df).collect()}
    for i, p in enumerate(payloads):
        assert rows[i].n_bytes == len(p)
        assert rows[i].payload_md5 == hashlib.md5(p).hexdigest()
        assert 0.0 <= rows[i].feat_mean <= 1.0


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_real(b"bytes")
