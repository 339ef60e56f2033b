"""Multimodal column plumbing (SURVEY.md §2.5).

Images/audio/video are opaque BINARY payloads + a typed metadata struct; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so each
executor streams batches without materializing a partition. The actual codec
call is STUBBED (no image/audio libraries in this container): ``_fake_decode``
is a deterministic placeholder with the real batch shape, schema, and
partitioning, so swapping in PIL/librosa later touches one function.

The test payloads are derived from documents.text bytes (the driver ships no
binary fixture), which keeps the whole path oracle-able where it's pure SQL.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

DECODED_SCHEMA = (
    "doc_id long, byte_len long, fake_width long, fake_height long, "
    "checksum_mod long"
)


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


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode step — deterministic stand-in for a real codec.

    A real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    etc. per row; this container has no codec libraries, so we derive fake
    dimensions from the payload bytes. Batch shape / schema / Arrow transfer
    are the real production plumbing.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        byte_len = payloads.map(len)
        checksum = payloads.map(lambda b: sum(b[:64]) if len(b) else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len,
                "fake_width": (checksum % 640) + 1,
                "fake_height": (byte_len % 480) + 1,
                "checksum_mod": checksum % 997,
            }
        )


@query("q_mm_pipeline")
def q_mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal pipeline shape: binary column -> mapInPandas decode ->
    typed features. Rows-only check (decode is a stub; see _fake_decode)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    # repartition on the key so decode parallelism is independent of source
    # file count — at 100 TB the payload column dominates and batches must
    # stay bounded per task.
    return with_payload.repartition("doc_id").mapInPandas(
        _fake_decode, schema=DECODED_SCHEMA
    )


FRAME_BYTES = 32
FRAME_STRIDE = 4  # keep every 4th frame


def _fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame-sampler: chunk the payload into FRAME_BYTES 'frames' and
    keep every FRAME_STRIDE-th one (a real implementation seeks keyframes
    with pyav/ffmpeg). Emits one row per sampled frame — the row-explosion
    shape of video pipelines, where output >> input row count but payload
    bytes cross the Python boundary exactly once."""
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
