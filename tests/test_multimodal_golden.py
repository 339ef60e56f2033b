"""Byte-exact golden tests for the multimodal stub codecs
(llm/multimodal.py). The codec bodies are documented stubs (no image/audio
libraries in this container), so these goldens pin the PLUMBING CONTRACT —
payload bytes in, exact feature rows out — that a real PIL/pyav swap-in must
preserve for schema, batching, and determinism (VERDICT r01 item 9)."""

from __future__ import annotations

import pandas as pd

from iceberg_insert_spark.llm.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    _encode_video,
    _fake_decode,
    _frame_sample,
    decode_frame_container,
    encode_frame_container,
)

# Known payloads with hand-computed features.
_ABC = b"abc"  # sum = 97+98+99 = 294
_LONG = bytes(range(200))  # sum(b[:64]) = sum(0..63) = 2016


def test_fake_decode_golden():
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [_ABC, _LONG, b""]})
    (out,) = list(_fake_decode(iter([pdf])))
    got = out.set_index("doc_id").to_dict("index")
    assert got[1] == {
        "byte_len": 3,
        "fake_width": 294 % 640 + 1,  # 295
        "fake_height": 3 % 480 + 1,  # 4
        "checksum_mod": 294 % 997,  # 294
    }
    assert got[2] == {
        "byte_len": 200,
        "fake_width": 2016 % 640 + 1,  # 97
        "fake_height": 200 % 480 + 1,  # 201
        "checksum_mod": 2016 % 997,  # 22
    }
    # empty payload must not crash and must checksum to 0
    assert got[3] == {
        "byte_len": 0,
        "fake_width": 1,
        "fake_height": 1,
        "checksum_mod": 0,
    }


def test_frame_container_roundtrip():
    frames = [b"frame-one", b"", bytes(range(70))]
    data = encode_frame_container(frames)
    assert decode_frame_container(data) == frames
    # malformed containers must raise, never mis-parse
    from iceberg_insert_spark.llm.png_codec import PngFormatError

    for bad in (b"JUNK" + data[4:], data[:-3], b""):
        try:
            decode_frame_container(bad)
            assert False, "should have raised"
        except PngFormatError:
            pass


def test_frame_sample_golden():
    """100-byte text -> 4 PNG frames of <=32 raw bytes each; stride 4 keeps
    frame 0 only, REALLY decoded: 32x1, checksum = sum of its raw bytes
    (zero padding adds nothing)."""
    text = bytes(range(100)).decode("latin-1")
    # latin-1 range(100) is ascii-safe for utf-8? bytes 0..99 are ascii — yes
    pdf = pd.DataFrame({"doc_id": [7], "text": [text]})
    (vid,) = list(_encode_video(iter([pdf])))
    (out,) = list(_frame_sample(iter([vid])))
    rows = list(out.itertuples(index=False))
    assert [(r.doc_id, r.frame_no, r.width, r.height, r.codec)
            for r in rows] == [(7, 0, 32, 1, "png")]
    assert rows[0].frame_checksum == sum(range(32)) % 997  # 496

    # 130 one-bytes -> 5 frames -> keeps frame 0 and frame 4 (2-byte tail)
    pdf2 = pd.DataFrame({"doc_id": [8], "text": ["\x01" * 130]})
    (vid2,) = list(_encode_video(iter([pdf2])))
    (out2,) = list(_frame_sample(iter([vid2])))
    rows2 = [(r.frame_no, r.width, r.height, r.frame_checksum)
             for r in out2.itertuples(index=False)]
    assert rows2 == [(0, 32, 1, FRAME_BYTES % 997), (4, 32, 1, 2)]
    assert FRAME_STRIDE == 4  # golden rows above assume the stride constant


def test_frame_sample_stub_branch():
    """Non-container payloads must take the labeled stub fallback."""
    pdf = pd.DataFrame({"doc_id": [9], "payload": [b"\x00\x01notvideo"]})
    (out,) = list(_frame_sample(iter([pdf])))
    rows = list(out.itertuples(index=False))
    assert len(rows) == 1 and rows[0].codec == "stub"


# ---- real PNG codec (r3): round-trip, filters, corruption, pipeline ----

import struct
import zlib

import pytest

from iceberg_insert_spark.llm.png_codec import (
    PNG_SIGNATURE,
    PngFormatError,
    _chunk,
    decode_png_gray8,
    encode_png_gray8,
    is_png,
)


def test_png_roundtrip_exact():
    pixels = bytes((x * 7 + y * 13) % 256 for y in range(5) for x in range(32))
    data = encode_png_gray8(32, 5, pixels)
    assert is_png(data)
    assert decode_png_gray8(data) == (32, 5, pixels)


def _png_with_filters(width, height, filtered_rows):
    """Hand-build a PNG whose scanlines use explicit per-row filter types,
    exercising the decoder's de-filter paths (the encoder only emits 0)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(row) for f, row in filtered_rows)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    # target pixels, 4 wide x 5 tall — one row per filter type
    rows = [
        [10, 20, 30, 40],  # f0 None: stored literally
        [5, 10, 15, 20],  # f1 Sub: store x - left
        [7, 22, 35, 41],  # f2 Up: store x - above
        [8, 16, 24, 32],  # f3 Average
        [9, 18, 27, 36],  # f4 Paeth
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = [(0, rows[0])]
    filtered.append(
        (1, [(rows[1][x] - (rows[1][x - 1] if x else 0)) % 256 for x in range(4)])
    )
    filtered.append((2, [(rows[2][x] - rows[1][x]) % 256 for x in range(4)]))
    filtered.append(
        (3, [(rows[3][x] - (((rows[3][x - 1] if x else 0) + rows[2][x]) // 2)) % 256
             for x in range(4)])
    )
    filtered.append(
        (4, [(rows[4][x] - paeth(rows[4][x - 1] if x else 0, rows[3][x],
                                 rows[3][x - 1] if x else 0)) % 256
             for x in range(4)])
    )
    data = _png_with_filters(4, 5, filtered)
    w, h, pixels = decode_png_gray8(data)
    assert (w, h) == (4, 5)
    assert list(pixels) == [p for row in rows for p in row]


def test_png_rejects_corruption():
    good = encode_png_gray8(2, 2, bytes([1, 2, 3, 4]))
    corrupt = bytearray(good)
    corrupt[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(PngFormatError):
        decode_png_gray8(bytes(corrupt))
    with pytest.raises(PngFormatError):
        decode_png_gray8(b"\x89PNG\r\n\x1a\nnot really")
    with pytest.raises(PngFormatError):
        decode_png_gray8(b"JFIF....")


def test_decode_features_real_vs_stub_branch():
    """PNG payloads take the real branch (exact pixel checksum = byte sum of
    the original text, since zero padding adds nothing); non-PNG payloads
    fall back to the stub branch and say so."""
    from iceberg_insert_spark.llm.multimodal import (
        _bytes_to_png,
        _decode_features,
    )

    text = b"hello multimodal world"
    png = _bytes_to_png(text)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [png, b"\xff\xd8\xffJPEGish"]}
    )
    (out,) = list(_decode_features(iter([pdf])))
    got = out.set_index("doc_id").to_dict("index")
    assert got[1]["codec"] == "png"
    assert got[1]["width"] == 32
    assert got[1]["height"] == 1
    assert got[1]["byte_len"] == len(png)
    assert got[1]["checksum_mod"] == sum(text) % 997
    assert got[2]["codec"] == "stub"


def test_mm_pipeline_decodes_real_bytes(spark):
    """Every documents row must round-trip text -> PNG -> decoded pixels on
    the real branch: codec='png' everywhere, width=IMG_WIDTH, and the pixel
    checksum equals the text's UTF-8 byte sum mod 997."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.registry import get_queries
    from iceberg_insert_spark.tables import load_table

    from .conftest import SF_DIR

    out = get_queries()["q_mm_pipeline"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("codec") == "png").cast("int")).alias("n_png"),
        F.sum((F.col("width") == IMG_WIDTH_EXPECTED).cast("int")).alias("n_w"),
    ).first()
    assert agg["n"] == n_docs
    assert agg["n_png"] == n_docs
    assert agg["n_w"] == n_docs
    # spot-check checksum math against the raw text, python-side
    sample = {r["doc_id"]: r["checksum_mod"] for r in out.limit(50).collect()}
    texts = {r["doc_id"]: r["text"]
             for r in docs.filter(F.col("doc_id").isin(*sample)).collect()}
    for doc_id, checksum in sample.items():
        assert checksum == sum(texts[doc_id].encode("utf-8")) % 997


IMG_WIDTH_EXPECTED = 32


def test_frame_sample_mid_container_corruption_is_atomic():
    """If a SAMPLED frame is corrupt, the payload's output must be exactly
    one stub row — never partial png rows plus a stub."""
    from iceberg_insert_spark.llm.multimodal import _bytes_to_png

    f0 = _bytes_to_png(bytes(range(32)))
    f4_corrupt = bytearray(_bytes_to_png(bytes(range(32, 64))))
    f4_corrupt[20] ^= 0xFF  # CRC mismatch inside IHDR
    frames = [f0, f0, f0, f0, bytes(f4_corrupt)]  # stride 4 samples 0 and 4
    payload = encode_frame_container(frames)
    pdf = pd.DataFrame({"doc_id": [3], "payload": [payload]})
    (out,) = list(_frame_sample(iter([pdf])))
    rows = list(out.itertuples(index=False))
    assert len(rows) == 1
    assert rows[0].codec == "stub"
    assert rows[0].frame_no == 0


def test_wav_roundtrip_golden():
    """Known bytes -> WAV -> parsed features, hand-checked: 4 bytes at
    8 kHz; samples are (b-128)*256 so RMS is computable exactly."""
    from iceberg_insert_spark.llm.multimodal import (
        AUDIO_RATE,
        _bytes_to_wav,
        _wav_features,
    )

    data = bytes([128, 129, 127, 228])  # samples 0, 256, -256, 25600
    wav = _bytes_to_wav(data)
    n, rate, dur, rms = _wav_features(wav)
    assert (n, rate) == (4, AUDIO_RATE)
    assert dur == 4 * 1000 // AUDIO_RATE
    expected_rms = int(((0 + 256**2 + 256**2 + 25600**2) / 4) ** 0.5 * 1000)
    assert rms == expected_rms
    # non-WAV payloads must take the labeled stub branch
    from iceberg_insert_spark.llm.multimodal import _audio_features

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [wav, b"ID3mp3ish"]})
    (out,) = list(_audio_features(iter([pdf])))
    got = out.set_index("doc_id").to_dict("index")
    assert got[1]["codec"] == "wav" and got[1]["rms_milli"] == expected_rms
    assert got[2]["codec"] == "stub"


def test_binary_ingest_matches_in_column_pipeline(spark):
    """binaryFile ingestion must reproduce the in-column pipeline's decoded
    features exactly for the same documents (same PNG bytes through the
    same codec — only the transport differs), prove the files are REAL
    PNGs (codec column), and prune non-matching objects via
    pathGlobFilter."""
    from iceberg_insert_spark.llm.multimodal import (
        BINARY_INGEST_FILES,
        q_mm_binary_ingest,
        q_mm_pipeline,
    )
    from .conftest import SF_DIR

    got = {r.doc_id: (r.byte_len, r.width, r.height, r.checksum_mod, r.codec)
           for r in q_mm_binary_ingest(spark, SF_DIR).collect()}
    assert len(got) == BINARY_INGEST_FILES  # manifest.txt pruned
    assert all(v[4] == "png" for v in got.values())
    ref = {r.doc_id: (r.byte_len, r.width, r.height, r.checksum_mod, r.codec)
           for r in q_mm_pipeline(spark, SF_DIR).collect()
           if r.doc_id in got}
    assert got == ref


def test_resize_nearest_math():
    """The nearest-neighbor resample must be exactly floor-index sampling:
    identity when dims match, and a hand-computed stride-2 pick on a 16x16
    gradient."""
    from iceberg_insert_spark.llm.multimodal import resize_nearest

    # identity: 8x8 -> 8x8
    px = bytes(range(64))
    assert resize_nearest(8, 8, px, 8, 8) == px
    # 16x16 gradient (pixel = (row*16+col) % 251) -> 8x8 picks even rows/cols
    src = bytes((r * 16 + c) % 251 for r in range(16) for c in range(16))
    got = resize_nearest(16, 16, src, 8, 8)
    want = bytes((2 * r * 16 + 2 * c) % 251 for r in range(8) for c in range(8))
    assert got == want


def test_resize_query_features(spark):
    """q_mm_resize must decode every generated PNG (codec='png'), emit
    fixed 8x8 thumbs whose checksum matches an independent python
    recomputation from the document text for a sample of docs."""
    from iceberg_insert_spark.llm.multimodal import (
        IMG_WIDTH,
        THUMB_H,
        THUMB_W,
        q_mm_resize,
        resize_nearest,
    )
    from iceberg_insert_spark.tables import load_table
    from .conftest import SF_DIR

    rows = {r.doc_id: r for r in q_mm_resize(spark, SF_DIR).collect()}
    assert all(r.codec == "png" for r in rows.values())
    assert all(
        r.thumb_w == THUMB_W and r.thumb_h == THUMB_H and r.thumb_len > 0
        for r in rows.values()
    )
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").limit(5).collect()
    }
    for doc_id, text in docs.items():
        data = text.encode("utf-8")
        h = max(1, -(-len(data) // IMG_WIDTH))
        pixels = data.ljust(IMG_WIDTH * h, b"\x00")
        thumb = resize_nearest(IMG_WIDTH, h, pixels, THUMB_W, THUMB_H)
        assert rows[doc_id].thumb_checksum_mod == sum(thumb) % 997
        assert rows[doc_id].src_w == IMG_WIDTH and rows[doc_id].src_h == h


def test_phash_golden_and_dedup(spark):
    """aHash64: identical images hash equal; a sub-threshold single-pixel
    perturbation (doesn't flip any 8x8 cell across the mean) hashes equal;
    the inverted image hashes to (~h with flat-tie cells differing) — at
    minimum, NOT equal; flat images hash 0. The Spark op groups equal
    hashes under the min-id representative."""
    from iceberg_insert_spark.llm.multimodal import (
        ahash64,
        q_mm_phash,
        _phash_features,
    )
    from iceberg_insert_spark.llm.png_codec import encode_png_gray8
    from .conftest import SF_DIR

    side = 16
    grad = bytes((x * 16) % 256 for y in range(side) for x in range(side))
    h_grad = ahash64(side, side, grad)
    assert h_grad == ahash64(side, side, grad)
    # sub-threshold perturbation: +1 on a pixel far above the mean
    pert = bytearray(grad)
    assert pert[15] == 240
    pert[15] = 241
    assert ahash64(side, side, bytes(pert)) == h_grad
    inv = bytes(255 - p for p in grad)
    assert ahash64(side, side, inv) != h_grad
    flat = bytes([128]) * side * side
    assert ahash64(side, side, flat) == 0
    # Spark dedup semantics on planted duplicate payloads
    png_a = encode_png_gray8(side, side, grad)
    png_b = encode_png_gray8(side, side, bytes(pert))  # same hash as a
    png_c = encode_png_gray8(side, side, inv)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [png_a, png_b, png_c]}
    )
    out = (
        spark.createDataFrame(pdf)
        .mapInPandas(_phash_features, "doc_id long, phash long, codec string")
        .collect()
    )
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].phash == by_id[2].phash == h_grad
    assert by_id[3].phash != h_grad
    assert all(r.codec == "png" for r in out)
    # mixed-codec collision (review catch): a flat PNG hashes to 0 and a
    # non-decodable payload whose 64-byte checksum is 0 mod 997 stubs to
    # 0 — same numeric hash, but they must NEVER share a dedup group
    from iceberg_insert_spark.llm.multimodal import phash_verdicts

    flat_png = encode_png_gray8(side, side, flat)
    zero_stub = b"\x00" * 10  # not a PNG; checksum 0
    mixed = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [flat_png, zero_stub]})
    )
    v = {r.doc_id: r for r in phash_verdicts(mixed).collect()}
    assert v[1].phash == 0 and v[2].phash == 0
    assert v[1].keep == 1 and v[2].keep == 1
    assert v[1].group_size == 1 and v[2].group_size == 1
    # end-to-end op: one verdict row per document, reps are group minima
    rows = q_mm_phash(spark, SF_DIR).collect()
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r.rep_id <= r.doc_id
        assert r.keep == (1 if r.rep_id == r.doc_id else 0)
        assert r.group_size >= 1


def test_phash_hamming_band_recall(spark):
    """Banded Hamming join on crafted hashes: distance <= 3 always found
    (pigeonhole over 4 x 16-bit bands), distance 4 found when any band
    holds >= 2 flips, the one-flip-per-band distance-4 case is the
    documented miss, distance > 4 and exact-equal pairs are excluded,
    and reported distances are exact popcounts."""
    from iceberg_insert_spark.llm.multimodal import phash_near_pairs

    base = 0x123456789ABCDEF0
    rows = [
        (1, base),
        (2, base ^ 0b111),                      # d=3, one band
        (3, base ^ (1 | (1 << 20) | (1 << 40) | (1 << 60))),  # d=4, all bands
        (4, base ^ (0xF << 8)),                 # d=4, one band
        (5, base ^ 0x1F),                       # d=5: excluded
        (6, base),                              # d=0 vs doc 1: excluded
    ]
    df = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in rows],
        "doc_id long, phash long",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_pairs(df).collect()
    }
    assert got[(1, 2)] == 3 and got[(1, 4)] == 4
    assert got[(2, 6)] == 3 and got[(4, 6)] == 4
    assert (1, 3) not in got  # the documented one-flip-per-band miss
    assert (1, 5) not in got and (1, 6) not in got
    # popcount re-score kills band-collision candidates past the cut:
    # docs 2 and 4 share band 3 (untouched in both) but sit at d=7
    assert (2, 4) not in got
