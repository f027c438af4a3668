"""Real byte-level media decode: PNG/WAV build→parse round trip.

The builders emit genuine container bytes (PNG signature + IHDR +
zlib IDAT + IEND with CRCs; RIFF/WAVE with canonical 44-byte header);
``parse_media`` must recover every field by actually parsing — and for
content stats, inflating IDAT / reading PCM frames. Pure-Python tests
plus a Spark mapInPandas e2e against the arithmetic expectations.
"""

import struct
import zlib

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
    build_png,
    build_wav,
    decode_media,
    parse_media,
    synthesize_media,
)


def test_png_roundtrip_fields():
    for doc_id in (0, 2, 64, 126, 4094, 123456):
        rec = parse_media(build_png(doc_id))
        assert rec["kind"] == "png"
        assert rec["width"] == 1 + doc_id % 64
        assert rec["height"] == 1 + (doc_id // 64) % 64
        assert rec["bit_depth"] == 8 and rec["color_type"] == 0
        assert rec["channels"] == 1
        # constant-pixel image: mean is exactly the pixel value, and it
        # only comes out right if IDAT was inflated and unfiltered
        assert rec["mean_value"] == float(doc_id % 256)
        assert rec["sample_rate"] is None and rec["n_samples"] is None


def test_wav_roundtrip_fields():
    for doc_id in (1, 3, 5, 399, 1001, 99999):
        rec = parse_media(build_wav(doc_id))
        rate = (8000, 16000, 22050, 44100)[doc_id % 4]
        n = 100 + doc_id % 400
        assert rec["kind"] == "wav"
        assert rec["channels"] == 1 and rec["bit_depth"] == 16
        assert rec["sample_rate"] == rate
        assert rec["n_samples"] == n
        assert rec["duration_us"] == n * 1_000_000 // rate
        assert rec["mean_value"] == float((doc_id % 100) * 10)
        assert rec["n_bytes"] == 44 + 2 * n
        assert rec["width"] is None


def test_png_crc_and_structure_are_valid():
    b = build_png(77)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    seen = []
    while pos < len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack(">I", b[pos + 8 + clen : pos + 12 + clen])
        assert crc == zlib.crc32(ctype + data) & 0xFFFFFFFF
        seen.append(ctype)
        pos += 12 + clen
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_png_up_filter_unfiltering():
    # hand-build a 2x2 grayscale PNG whose second row uses filter 2
    # (Up): row1 raw = [10, 20]; row2 stored deltas [5, 5] → unfiltered
    # [15, 25]; mean = 17.5
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
        _png_chunk,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00" + bytes([10, 20]) + b"\x02" + bytes([5, 5])
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    rec = parse_media(b)
    assert rec["mean_value"] == 17.5


def test_unknown_payload():
    rec = parse_media(b"\x00\x01\x02not-a-container")
    assert rec["kind"] == "unknown"
    assert rec["n_bytes"] == 18


def test_spark_e2e_decode(spark):
    df = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = decode_media(synthesize_media(df)).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[6]["kind"] == "png" and by_id[6]["width"] == 7
    assert by_id[6]["mean_value"] == 6.0
    assert by_id[7]["kind"] == "wav" and by_id[7]["sample_rate"] == 44100
    assert by_id[7]["n_samples"] == 107
    assert by_id[7]["duration_us"] == 107 * 1_000_000 // 44100


def test_resize_png_nearest_neighbor_exact():
    # 4x2 grayscale with distinct pixels: resize ×2 keeps pixels at
    # even (x, y) → [[10, 30]] from rows [[10,20,30,40],[50,60,70,80]]
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
        _png_chunk,
        parse_media,
        resize_png,
    )

    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
    raw = b"\x00" + bytes([10, 20, 30, 40]) + b"\x00" + bytes([50, 60, 70, 80])
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    rec = parse_media(resize_png(b, 2))
    assert rec["width"] == 2 and rec["height"] == 1
    assert rec["mean_value"] == (10 + 30) / 2


def test_resize_png_odd_dims_ceil():
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
        build_png,
        parse_media,
        resize_png,
    )

    # doc 4: width 5, height 1 → resized (3, 1); constant pixel 4
    rec = parse_media(resize_png(build_png(4), 2))
    assert (rec["width"], rec["height"]) == (3, 1)
    assert rec["mean_value"] == 4.0


def test_clip_frame_sampling(spark):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.multimodal import (
        frame_sample,
        synthesize_clips,
    )

    df = spark.range(3, 5).withColumnRenamed("id", "doc_id")
    out = frame_sample(synthesize_clips(df), every=2).collect()
    # doc 3: 5 frames → sampled 0,2,4; doc 4: 6 frames → 0,2,4
    got = {(r["doc_id"], r["frame_idx"]) for r in out}
    assert got == {(3, 0), (3, 2), (3, 4), (4, 0), (4, 2), (4, 4)}
    r30 = next(r for r in out if (r["doc_id"], r["frame_idx"]) == (3, 0))
    assert r30["width"] == 1 + 24 % 64 and r30["mean_value"] == 24.0
