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
from functools import lru_cache as _lru_cache

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


# ---------------------------------------------------------------------------
# Real byte-level decode path (no external codec needed).
#
# PNG and WAV are public, fully-specified container formats whose
# headers parse with nothing but ``struct`` + ``zlib`` (both stdlib):
#   - PNG: 8-byte signature, then chunks [len|type|data|crc32]. IHDR
#     carries width/height/bit-depth/color-type; IDAT is
#     zlib-compressed scanlines, each prefixed with a filter byte.
#   - WAV: RIFF header, 'fmt ' chunk (PCM layout), 'data' chunk
#     (little-endian PCM samples).
# ``decode_media`` parses either format — including inflating IDAT and
# un-filtering scanlines to recover pixel values — so the decode stage
# is REAL byte-level work, not a stub; only exotic codecs (JPEG DCT,
# MP3) remain out of scope for this container. This mirrors the
# reference's raw-zone pattern (land what the source returned, extract
# structure downstream — ``src/process_insert_update_weather_data.py:83-93``).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_WAV_RATES = (8000, 16000, 22050, 44100)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def build_png(doc_id: int) -> bytes:
    """Deterministic valid grayscale PNG: width/height/pixel value are
    arithmetic in ``doc_id`` (so a SQL oracle can predict what the
    parser must recover). Every scanline uses filter type 0 (None)."""
    import struct
    import zlib

    width = 1 + doc_id % 64
    height = 1 + (doc_id // 64) % 64
    pixel = doc_id % 256
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([pixel]) * width) * height
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def build_wav(doc_id: int) -> bytes:
    """Deterministic canonical 44-byte-header mono PCM16 WAV; sample
    rate, sample count, and the (constant) sample value are arithmetic
    in ``doc_id``."""
    import struct

    rate = _WAV_RATES[doc_id % 4]
    n_samples = 100 + doc_id % 400
    value = (doc_id % 100) * 10
    data = struct.pack("<h", value) * n_samples
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        rate,
        rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def parse_media(payload: bytes) -> dict:
    """Parse PNG or WAV bytes into typed fields.

    Returns a dict with keys: kind, width, height, bit_depth,
    color_type, channels, sample_rate, n_samples, duration_us
    (integer microseconds — exact, engine-portable),
    mean_value, n_bytes. Inapplicable fields are None. PNG pixel data
    is actually inflated and un-filtered (filter 0/2 supported) to
    compute ``mean_value``; WAV PCM samples are actually read."""
    import struct
    import zlib

    out = {
        "kind": "unknown",
        "width": None,
        "height": None,
        "bit_depth": None,
        "color_type": None,
        "channels": None,
        "sample_rate": None,
        "n_samples": None,
        "duration_us": None,
        "mean_value": None,
        "n_bytes": len(payload),
    }
    if payload[:8] == _PNG_SIG:
        out["kind"] = "png"
        pos, idat = 8, b""
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"IHDR":
                w, h, depth, color = struct.unpack(">IIBB", data[:10])
                out.update(
                    width=w,
                    height=h,
                    bit_depth=depth,
                    color_type=color,
                    channels={0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color),
                )
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + clen
        if idat and out["bit_depth"] == 8 and out["color_type"] in (0, 2):
            import numpy as np

            raw = zlib.decompress(idat)
            w = out["width"] * out["channels"]
            # scanlines as a (h, 1+w) uint8 matrix: column 0 is the
            # filter byte, the rest are pixel bytes — vectorized
            # un-filtering (cumulative sum down rows inverts filter 2)
            mat = np.frombuffer(raw, dtype=np.uint8).reshape(
                out["height"], 1 + w
            )
            ftypes, body = mat[:, 0], mat[:, 1:].astype(np.int64)
            bad = set(np.unique(ftypes)) - {0, 2}
            if bad:  # pragma: no cover - encoder never emits
                raise NotImplementedError(f"PNG filter {bad}")
            if (ftypes == 2).any():
                # Up filter: each row adds the reconstructed row above.
                # Rows are segmented by filter-0 "restart" rows; within
                # a run of filter-2 rows the reconstruction is a
                # cumulative sum (mod 256) from the last filter-0 row.
                rec = np.zeros_like(body)
                prev = np.zeros(w, dtype=np.int64)
                for y in range(out["height"]):  # row loop only, O(h)
                    prev = (
                        body[y] if ftypes[y] == 0 else (body[y] + prev) % 256
                    )
                    rec[y] = prev
                body = rec
            out["mean_value"] = (
                float(body.sum()) / body.size if body.size else None
            )
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out["kind"] = "wav"
        pos = 12
        while pos + 8 <= len(payload):
            ctype = payload[pos : pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            data = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"fmt ":
                _fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", data[:16])
                out.update(channels=ch, sample_rate=rate, bit_depth=bits)
            elif ctype == b"data" and out["bit_depth"] == 16:
                import numpy as np

                samples = np.frombuffer(
                    data[: clen // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                per_frame = out["channels"] or 1
                out["n_samples"] = samples.size // per_frame
                out["mean_value"] = (
                    float(samples.sum()) / samples.size if samples.size else None
                )
            pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        if out["sample_rate"] and out["n_samples"] is not None:
            # integer microseconds: exact on every engine (float seconds
            # hit decimal-rounding ties across Spark/DuckDB)
            out["duration_us"] = (
                out["n_samples"] * 1_000_000 // out["sample_rate"]
            )
    return out


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id column → (doc_id, mime, payload) with REAL container bytes
    (even ids → PNG, odd ids → WAV), built per-partition via
    mapInPandas — the distributed stand-in for a binary-column lake
    table."""

    def gen(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mime": ids.map(
                        lambda i: "image/png" if i % 2 == 0 else "audio/wav"
                    ),
                    "payload": ids.map(
                        lambda i: build_png(int(i))
                        if i % 2 == 0
                        else build_wav(int(i))
                    ),
                }
            )

    return df.select(id_col).mapInPandas(gen, _PAYLOAD_SCHEMA)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payloads → typed header/content fields via mapInPandas.

    The real decode path: struct-parses PNG/WAV containers, inflates
    IDAT, un-filters scanlines, reads PCM frames. Arrow-batched; batch
    memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                rec = parse_media(bytes(b))
                rec["doc_id"] = int(i)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(batches, MEDIA_SCHEMA)


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


# ---------------------------------------------------------------------------
# Perceptual hash (aHash): the image near-dup primitive — 8×8
# grayscale, mean-threshold each pixel, pack 64 bits. Real byte path:
# the hash is computed from PIXELS RECOVERED FROM PNG CONTAINER BYTES
# (inflate + un-filter), never from the generating formula.
# ---------------------------------------------------------------------------

_AHASH_MOD = 1 << 48  # synthetic hashes keep the top 16 bits clear


@_lru_cache(maxsize=4096)
def build_hash_png(h: int) -> bytes:
    """8×8 grayscale PNG whose pixels encode the 64 bits of ``h``
    (pixel y*8+x = 255·bit, filter 0) — the deterministic fixture for
    the aHash path: with binary pixels, mean-thresholding recovers
    exactly the encoded bits, so a SQL oracle predicts the hash by
    arithmetic while the Spark side earns it through real container
    bytes."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00"
        + bytes(255 if (h >> (y * 8 + x)) & 1 else 0 for x in range(8))
        for y in range(8)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def ahash_from_png(payload: bytes) -> int:
    """Average hash of an 8×8 grayscale PNG: inflate IDAT, un-filter
    (filter 0 only — the builder's output), threshold each pixel
    against the image mean (strictly greater), pack row-major into a
    64-bit int. The standard aHash recipe minus the downsample step
    (inputs are already 8×8)."""
    import struct
    import zlib

    import numpy as np

    assert payload[:8] == _PNG_SIG, "not a PNG"
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + clen]
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    raw = zlib.decompress(idat)
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(8, 9)
    if (mat[:, 0] != 0).any():  # pragma: no cover - builder emits filter 0
        raise NotImplementedError("aHash expects filter-0 scanlines")
    px = mat[:, 1:].astype(np.int64)
    mean = px.mean()
    bits = (px > mean).astype(np.int64).reshape(-1)
    return int((bits << np.arange(64, dtype=np.int64)).sum())


def image_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id column → (doc_id, ahash): synthesize an 8×8 PNG per id in one
    mapInPandas stage (hash seed = (id div 8)·2654435761 mod 2^48, so
    every 8 consecutive ids share an identical image — the planted
    near-dup groups), ship the BYTES across the Arrow boundary, and
    compute the aHash from decoded pixels in a second stage. Map-only:
    payloads never shuffle."""

    def gen(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": ids.map(
                        lambda i: build_hash_png(
                            (int(i) // 8) * 2654435761 % _AHASH_MOD
                        )
                    ),
                }
            )

    def hashes(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ahash": pdf["payload"].map(
                        lambda b: ahash_from_png(bytes(b))
                    ).astype("int64"),
                }
            )

    payloads = df.select(id_col).mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    return payloads.mapInPandas(
        hashes,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("ahash", T.LongType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Audio content analysis: square-wave WAV fixtures whose PCM is
# arithmetic in doc_id, analyzed from the PARSED sample stream (zero
# crossings, RMS amplitude, DC numerator) — the audio sibling of the
# aHash path: the oracle predicts every feature by arithmetic, the
# Spark side earns it through real RIFF/PCM bytes.
# ---------------------------------------------------------------------------


def build_tone_wav(doc_id: int) -> bytes:
    """Mono PCM16 WAV square wave: half-period h = 1 + doc_id % 8
    samples, amplitude A = 100·(1 + doc_id % 50),
    n = 400 + doc_id % 100 samples at 16 kHz — every decoded feature
    is closed-form in doc_id."""
    import struct

    h = 1 + doc_id % 8
    amp = 100 * (1 + doc_id % 50)
    n = 400 + doc_id % 100
    data = b"".join(
        struct.pack("<h", amp if (i // h) % 2 == 0 else -amp)
        for i in range(n)
    )
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        16000, 32000, 2, 16, b"data", len(data),
    )
    return hdr + data


def wav_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id column → (doc_id, n_samples, zero_crossings, rms_amp,
    dc_numerator): synthesize the tone WAV per id in one mapInPandas
    stage, ship the container bytes across the Arrow boundary, parse
    the RIFF chunks + PCM frames for real in a second stage and
    compute signal features with numpy. All-integer outputs (RMS of a
    square wave is the amplitude; the DC numerator is Σ samples —
    exact), so the features hash-compare exactly."""
    import struct

    import numpy as np

    def gen(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": ids.map(lambda i: build_tone_wav(int(i))),
                }
            )

    def feats(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                b = bytes(b)
                assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
                pos, samples = 12, None
                while pos + 8 <= len(b):
                    ctype = b[pos : pos + 4]
                    (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                    if ctype == b"data":
                        samples = np.frombuffer(
                            b[pos + 8 : pos + 8 + clen], dtype="<i2"
                        ).astype(np.int64)
                    pos += 8 + clen + (clen & 1)
                assert samples is not None
                sq_mean = int((samples * samples).sum()) // samples.size
                rows.append(
                    {
                        "doc_id": int(i),
                        "n_samples": int(samples.size),
                        "zero_crossings": int(
                            (samples[1:] * samples[:-1] < 0).sum()
                        ),
                        "rms_amp": int(round(sq_mean**0.5)),
                        "dc_numerator": int(samples.sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "zero_crossings", "rms_amp",
                    "dc_numerator",
                ],
            )

    schema_payload = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    schema_out = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("zero_crossings", T.LongType()),
            T.StructField("rms_amp", T.LongType()),
            T.StructField("dc_numerator", T.LongType()),
        ]
    )
    return df.select(id_col).mapInPandas(gen, schema_payload).mapInPandas(
        feats, schema_out
    )


# ---------------------------------------------------------------------------
# Resize + frame-sample: the remaining two mapInPandas media stages,
# also real byte work (inflate → pixel ops → re-encode; container
# walk → per-frame decode). Together with decode_media this covers
# the full decode / feature-extract / resize / frame-sample pipeline
# on genuine container bytes.
# ---------------------------------------------------------------------------

_CLIP_MAGIC = b"FRMV"


def resize_png(payload: bytes, factor: int) -> bytes:
    """Nearest-neighbor downsample of a grayscale/truecolor PNG by an
    integer factor: inflate IDAT, un-filter, keep every factor-th
    pixel/row, re-encode (filter 0). Real pixel-level work with only
    struct+zlib."""
    import struct
    import zlib

    rec = parse_media(payload)
    if rec["kind"] != "png" or rec["color_type"] not in (0, 2):
        raise ValueError("resize_png supports grayscale/truecolor PNG")
    w, h, ch = rec["width"], rec["height"], rec["channels"]
    # re-inflate (parse_media doesn't return pixels)
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
    import numpy as np

    raw = zlib.decompress(idat)
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * ch)
    ftypes, body = mat[:, 0], mat[:, 1:].astype(np.int64)
    if (ftypes == 2).any():
        rec = np.zeros_like(body)
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):  # row loop only, O(h)
            prev = body[y] if ftypes[y] == 0 else (body[y] + prev) % 256
            rec[y] = prev
        body = rec
    elif (~np.isin(ftypes, (0, 2))).any():  # pragma: no cover
        raise NotImplementedError("unsupported PNG filter")
    pix = body.reshape(h, w, ch).astype(np.uint8)
    # nearest-neighbor: keep pixels at integer multiples of factor
    sampled = pix[::factor, ::factor, :]
    new_h, new_w = sampled.shape[0], sampled.shape[1]
    lines = np.zeros((new_h, 1 + new_w * ch), dtype=np.uint8)
    lines[:, 1:] = sampled.reshape(new_h, new_w * ch)
    out_raw = lines.tobytes()
    ihdr = struct.pack(">IIBBBBB", new_w, new_h, 8, rec["color_type"], 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(out_raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def build_clip(doc_id: int) -> bytes:
    """Deterministic multi-frame clip container: magic + frame count +
    length-prefixed PNG frames (frame i is ``build_png(doc_id*8+i)``,
    so every frame's fields stay arithmetic in (doc_id, i))."""
    import struct

    n_frames = 2 + doc_id % 6
    frames = [build_png(doc_id * 8 + i) for i in range(n_frames)]
    return (
        _CLIP_MAGIC
        + struct.pack("<I", n_frames)
        + b"".join(struct.pack("<I", len(f)) + f for f in frames)
    )


def iter_clip_frames(payload: bytes):
    """Yield (frame_idx, frame_bytes) from a clip container."""
    import struct

    if payload[:4] != _CLIP_MAGIC:
        raise ValueError("not a clip container")
    (n,) = struct.unpack("<I", payload[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack("<I", payload[pos : pos + 4])
        yield i, payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


def resize_media(
    df: DataFrame,
    factor: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """payload → resized payload (PNG nearest-neighbor, integer
    factor) via mapInPandas; map-only, bytes never leave the
    partition."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[payload_col].map(
                        lambda b: resize_png(bytes(b), factor)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, _PAYLOAD_FRAME_SCHEMA)


_PAYLOAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
    ]
)


def frame_sample(
    df: DataFrame,
    every: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Clip container → every ``every``-th frame decoded to features
    (one output row per sampled frame). The video-pipeline sampling
    stage: container walk + per-frame decode inside one mapInPandas,
    no shuffle, frames never reassembled."""

    def batches(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col].astype("int64"), pdf[payload_col]):
                for idx, frame in iter_clip_frames(bytes(b)):
                    if idx % every != 0:
                        continue
                    rec = parse_media(frame)
                    rows.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": idx,
                            "width": rec["width"],
                            "height": rec["height"],
                            "mean_value": rec["mean_value"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


def synthesize_clips(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id column → (doc_id, payload) clip containers via mapInPandas."""

    def gen(it: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": ids.map(lambda i: build_clip(int(i))),
                }
            )

    return df.select(id_col).mapInPandas(gen, _PAYLOAD_FRAME_SCHEMA)
