"""Content hashing: SimHash fingerprints (Arrow-vectorized pandas UDF).

SimHash is the one text-dedup primitive not expressible with Spark's
built-in column functions (it needs per-token bit unpacking and a
64-lane weighted vote), so it ships as a pandas UDF: Arrow batches in,
NumPy bit-twiddling inside, one int64 out per document — the sanctioned
slow path per SURVEY.md §2.9, ~vectorized instead of per-row Python.

Hash basis is md5 (stable everywhere) — NOT Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


_SHIFTS = np.arange(64, dtype=np.uint64)
_token_vote_cache: dict[str, np.ndarray] = {}


def _token_votes(tok: str) -> np.ndarray:
    """±1 bit-vote vector for one token, memoized — corpora repeat
    tokens heavily, and the worker process (hence the cache) lives
    across Arrow batches."""
    v = _token_vote_cache.get(tok)
    if v is None:
        h = np.frombuffer(hashlib.md5(tok.encode("utf-8")).digest()[:8], dtype=">u8")[0]
        bits = (h >> _SHIFTS) & np.uint64(1)
        v = np.where(bits == 1, 1, -1).astype(np.int64)
        if len(_token_vote_cache) < 1_000_000:
            _token_vote_cache[tok] = v
    return v


def _simhash64_one(text: str) -> int:
    if not text:
        return 0
    counts = np.zeros(64, dtype=np.int64)
    for tok in text.split(" "):
        counts += _token_votes(tok)
    fp = int(((counts > 0).astype(np.uint64) << _SHIFTS).sum())
    return fp - (1 << 64) if fp >= (1 << 63) else fp  # two's complement into int64


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _simhash64_one(t if t is not None else ""))


def band(col, band_idx: int, band_bits: int = 16):
    """Extract band ``band_idx`` (16-bit sub-key) of a simhash column —
    the LSH blocking key: near fingerprints (Hamming ≤ 3 over 64 bits
    with 4 bands) collide on at least one band."""
    c = F.col(col) if isinstance(col, str) else col
    return F.shiftrightunsigned(c, band_idx * band_bits).bitwiseAND((1 << band_bits) - 1)


def hamming64(a, b):
    """Hamming distance between two int64 fingerprints (bit_count of
    XOR — built-in, codegen'd)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))
