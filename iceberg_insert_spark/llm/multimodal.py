"""Multimodal column plumbing (SURVEY.md §2.5).

Images/audio/video are opaque BINARY payloads + a typed metadata struct; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so each
executor streams batches without materializing a partition.

The image path is REAL as of round 3: payloads are valid PNGs (built by the
pure-stdlib grayscale codec in ``llm/png_codec.py`` — chunk parse + zlib,
no external libraries) and the decode step parses chunks, verifies CRCs,
inflates IDAT, and de-filters scanlines to recover actual pixels. The
``_fake_*`` stub branch now runs ONLY for payloads that are not decodable
PNGs (foreign codecs — e.g. the video frame-sampler below, which would need
pyav/ffmpeg); each output row carries a ``codec`` column naming the branch
that produced it.

The test payloads are derived from documents.text bytes (the driver ships no
binary fixture): each document's UTF-8 bytes become the pixels of a
32-wide grayscale PNG, so decoded features are independently checkable
against the text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .png_codec import PngFormatError, decode_png_gray8, encode_png_gray8, is_png

DECODED_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, "
    "checksum_mod long, codec string"
)

IMG_WIDTH = 32


@query(
    "q_mm_bytes",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
           'application/octet-stream' AS mime
    FROM documents
    """,
)
def q_mm_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata: the storage model for multimodal data.

    BinaryType round-trips natively through parquet/Iceberg; metadata stays in
    plain columns so predicates on it prune without touching payload bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _bytes_to_png(data: bytes) -> bytes:
    """Pack arbitrary bytes into a 32-wide grayscale PNG (zero-padded to a
    full final row; empty input becomes one zero row)."""
    height = max(1, -(-len(data) // IMG_WIDTH))
    pixels = data.ljust(IMG_WIDTH * height, b"\x00")
    return encode_png_gray8(IMG_WIDTH, height, pixels)


def _encode_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image writer: text bytes -> real PNG payload column."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": [
                    _bytes_to_png(t.encode("utf-8")) for t in pdf["text"]
                ],
            }
        )


def _fake_features(payload: bytes) -> tuple[int, int, int]:
    """STUB feature triple (width, height, checksum) for non-decodable
    payloads — deterministic placeholder derived from the leading bytes."""
    checksum = sum(payload[:64]) if len(payload) else 0
    return (checksum % 640) + 1, (len(payload) % 480) + 1, checksum % 997


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode step: REAL PNG decode (chunk parse, CRC check, inflate,
    de-filter) for PNG payloads; the stub branch only for payloads the
    codec can't handle. checksum_mod over decoded pixels equals the sum of
    the original bytes mod 997 (zero padding adds nothing) — pinned in
    tests/test_multimodal_golden.py."""
    for pdf in batches:
        rows = {k: [] for k in
                ("doc_id", "byte_len", "width", "height",
                 "checksum_mod", "codec")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            try:
                if not is_png(payload):
                    raise PngFormatError("not a PNG")
                w, h, pixels = decode_png_gray8(payload)
                checksum, codec = sum(pixels) % 997, "png"
            except PngFormatError:
                w, h, checksum = _fake_features(payload)
                codec = "stub"
            rows["doc_id"].append(doc_id)
            rows["byte_len"].append(len(payload))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["checksum_mod"].append(checksum)
            rows["codec"].append(codec)
        yield pd.DataFrame(rows)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Legacy stub decode — the pre-r3 placeholder, kept as the golden
    contract for the fallback branch (tests/test_multimodal_golden.py)."""
    for pdf in batches:
        feats = [_fake_features(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len),
                "fake_width": [f[0] for f in feats],
                "fake_height": [f[1] for f in feats],
                "checksum_mod": [f[2] for f in feats],
            }
        )


@query("q_mm_pipeline")
def q_mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline: text bytes -> REAL PNG binary column
    (pure-stdlib encoder) -> mapInPandas decode (chunk parse + inflate +
    de-filter) -> typed pixel features. Rows-only driver check (PNG byte
    length is compression-dependent, not SQL-expressible); the codec
    round-trip and feature math are pytest-pinned."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", "text").mapInPandas(
        _encode_png, schema="doc_id long, payload binary"
    )
    # repartition on the key so decode parallelism is independent of source
    # file count — at 100 TB the payload column dominates and batches must
    # stay bounded per task.
    return payloads.repartition("doc_id").mapInPandas(
        _decode_features, schema=DECODED_SCHEMA
    )


FRAME_BYTES = 32
FRAME_STRIDE = 4  # keep every 4th frame


def _fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame-sampler: chunk the payload into FRAME_BYTES 'frames' and
    keep every FRAME_STRIDE-th one (a real implementation seeks keyframes
    with pyav/ffmpeg — video codecs are out of pure-stdlib reach, unlike
    the PNG path above). Emits one row per sampled frame — the
    row-explosion shape of video pipelines, where output >> input row count
    but payload bytes cross the Python boundary exactly once."""
    for pdf in batches:
        out_doc, out_no, out_len, out_sum = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = [
                payload[i : i + FRAME_BYTES]
                for i in range(0, len(payload), FRAME_BYTES)
            ]
            for no in range(0, len(frames), FRAME_STRIDE):
                out_doc.append(doc_id)
                out_no.append(no)
                out_len.append(len(frames[no]))
                out_sum.append(sum(frames[no]) % 997)
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "frame_no": out_no,
                "frame_len": out_len,
                "frame_checksum": out_sum,
            }
        )


@query("q_mm_frames")
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline shape: binary payload -> mapInPandas chunk +
    stride sample -> one row per kept frame. Rows-only check (sampler is a
    stub; see _fake_frame_sample)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return with_payload.repartition("doc_id").mapInPandas(
        _fake_frame_sample,
        schema="doc_id long, frame_no long, frame_len long, frame_checksum long",
    )
