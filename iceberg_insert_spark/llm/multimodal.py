"""Multimodal column plumbing (SURVEY.md §2.5).

Images/audio/video are opaque BINARY payloads + a typed metadata struct; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so each
executor streams batches without materializing a partition.

The image path is REAL as of round 3: payloads are valid PNGs (built by the
pure-stdlib grayscale codec in ``llm/png_codec.py`` — chunk parse + zlib,
no external libraries) and the decode step parses chunks, verifies CRCs,
inflates IDAT, and de-filters scanlines to recover actual pixels. The
video path is real too (round-3 wave 2): a self-describing PNGS container
of length-prefixed PNG frames, parsed and per-frame decoded by the same
codec — only true inter-frame codecs (H.264 etc., needing pyav/ffmpeg)
remain out of reach. The ``_fake_*`` stub branch runs ONLY for payloads
neither codec can handle; each output row carries a ``codec`` column
naming the branch that produced it.

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

# "Video" container: a real, self-describing format the pure-stdlib codec
# can round-trip — magic + a sequence of length-prefixed PNG frames. True
# inter-frame codecs (H.264 etc.) need pyav/ffmpeg, absent here; this
# container keeps the *pipeline* real: parse, seek, per-frame decode.
CONTAINER_MAGIC = b"PNGS"


def encode_frame_container(frames: list[bytes]) -> bytes:
    """Pack PNG frames into the PNGS container (4-byte BE length prefix
    per frame)."""
    out = [CONTAINER_MAGIC]
    for f in frames:
        out.append(len(f).to_bytes(4, "big"))
        out.append(f)
    return b"".join(out)


def decode_frame_container(data: bytes) -> list[bytes]:
    """Split a PNGS container back into its frames; raises PngFormatError
    on anything malformed (wrong magic, truncated frame)."""
    if data[:4] != CONTAINER_MAGIC:
        raise PngFormatError("not a PNGS container")
    frames, off = [], 4
    while off < len(data):
        if off + 4 > len(data):
            raise PngFormatError("truncated frame length")
        n = int.from_bytes(data[off : off + 4], "big")
        off += 4
        if off + n > len(data):
            raise PngFormatError("truncated frame body")
        frames.append(data[off : off + n])
        off += n
    return frames


def _encode_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'video' writer: text bytes -> FRAME_BYTES slices ->
    one real PNG per slice -> PNGS container payload."""
    for pdf in batches:
        payloads = []
        for t in pdf["text"]:
            raw = t.encode("utf-8")
            frames = [
                _bytes_to_png(raw[i : i + FRAME_BYTES])
                for i in range(0, max(len(raw), 1), FRAME_BYTES)
            ]
            payloads.append(encode_frame_container(frames))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def _frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampler: parse the PNGS container, keep every FRAME_STRIDE-th
    frame, and REALLY decode each kept frame (chunk parse, CRC, inflate,
    de-filter) for its dimensions + pixel checksum. Non-container payloads
    fall back to a deterministic stub row (codec='stub') so the operator is
    total over arbitrary binary. Emits one row per sampled frame — the
    row-explosion shape of video pipelines, where output >> input row count
    but payload bytes cross the Python boundary exactly once."""
    for pdf in batches:
        rows = {
            k: []
            for k in (
                "doc_id",
                "frame_no",
                "width",
                "height",
                "frame_checksum",
                "codec",
            )
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            # per-payload buffer: a frame failing to decode mid-container
            # must not leave earlier frames' rows behind next to the stub
            # fallback row — the fallback REPLACES the payload's output
            buf: list[tuple[int, int, int, int, str]] = []
            try:
                frames = decode_frame_container(payload)
                for no in range(0, len(frames), FRAME_STRIDE):
                    w, h, pixels = decode_png_gray8(frames[no])
                    buf.append((no, w, h, sum(pixels) % 997, "png"))
            except PngFormatError:
                w, h, checksum = _fake_features(payload)
                buf = [(0, w, h, checksum, "stub")]
            for no, w, h, checksum, codec in buf:
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(no)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["frame_checksum"].append(checksum)
                rows["codec"].append(codec)
        yield pd.DataFrame(rows)


@query("q_mm_frames")
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline: text bytes -> PNGS container of real PNG
    frames (mapInPandas encode) -> stride sample + per-frame REAL decode
    (mapInPandas) -> one row per kept frame. Rows-only check; the container
    round-trip and checksum parity are pinned in
    tests/test_multimodal_golden.py."""
    d = load_table(spark, sf_dir, "documents")
    # repartition BEFORE the Python stages: decode parallelism must be
    # independent of source file count — payload bytes dominate at scale
    # (same rationale as q_mm_pipeline's repartition)
    video = d.select("doc_id", "text").repartition("doc_id").mapInPandas(
        _encode_video, schema="doc_id long, payload binary"
    )
    return video.mapInPandas(
        _frame_sample,
        schema=(
            "doc_id long, frame_no long, width long, height long, "
            "frame_checksum long, codec string"
        ),
    )


AUDIO_RATE = 8000  # Hz, synthetic fixture rate


def _bytes_to_wav(data: bytes) -> bytes:
    """Pack bytes as 16-bit PCM mono WAV (each byte -> one centered
    sample; empty input -> a valid 0-frame file), via the stdlib ``wave``
    writer — a REAL audio container, like the PNG path: parseable by any
    audio tool, no external libs."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(AUDIO_RATE)
        w.writeframes(
            b"".join(struct.pack("<h", (b - 128) * 256) for b in data)
        )
    return buf.getvalue()


def _wav_features(payload: bytes) -> tuple[int, int, int, int]:
    """(n_samples, sample_rate, duration_ms, rms_milli) from a real WAV
    parse; raises on anything the stdlib reader rejects."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n, rate = w.getnframes(), w.getframerate()
            if w.getsampwidth() != 2 or w.getnchannels() != 1 or rate <= 0:
                raise PngFormatError("unsupported WAV shape")
            raw = w.readframes(n)
        # a truncated data chunk opens fine but yields short frames —
        # that is a malformed payload, not a crash (stub fallback)
        samples = struct.unpack(f"<{n}h", raw)
    except (wave.Error, EOFError, struct.error) as e:
        raise PngFormatError(f"not a WAV: {e}") from e
    sq = sum(s * s for s in samples)
    rms_milli = int(((sq / n) ** 0.5) * 1000) if n else 0
    return n, rate, n * 1000 // rate, rms_milli


def _audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched audio feature extraction: REAL WAV parse (RIFF header,
    PCM frames) for WAV payloads; labeled stub fallback otherwise."""
    for pdf in batches:
        rows = {k: [] for k in
                ("doc_id", "n_samples", "sample_rate", "duration_ms",
                 "rms_milli", "codec")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            try:
                n, rate, dur, rms = _wav_features(payload)
                codec = "wav"
            except PngFormatError:
                w, h, checksum = _fake_features(payload)
                n, rate, dur, rms, codec = len(payload), 0, 0, checksum, "stub"
            rows["doc_id"].append(doc_id)
            rows["n_samples"].append(n)
            rows["sample_rate"].append(rate)
            rows["duration_ms"].append(dur)
            rows["rms_milli"].append(rms)
            rows["codec"].append(codec)
        yield pd.DataFrame(rows)


@query("q_mm_audio")
def q_mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline shape, REAL end-to-end: text bytes -> 16-bit PCM WAV
    (stdlib ``wave`` writer, mapInPandas) -> WAV parse + sample features
    (frame count, rate, duration, RMS loudness) — the audio member of the
    multimodal triad (image=PNG, video=PNGS container, audio=WAV), with
    the same contract: real container, real decode, labeled stub fallback
    for foreign codecs (MP3/AAC need external libs). Rows-only; byte-exact
    feature goldens in tests/test_multimodal_golden.py."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _bytes_to_wav(t.encode("utf-8")) for t in pdf["text"]
                    ],
                }
            )

    d = load_table(spark, sf_dir, "documents")
    audio = d.select("doc_id", "text").repartition("doc_id").mapInPandas(
        encode, schema="doc_id long, payload binary"
    )
    return audio.mapInPandas(
        _audio_features,
        schema=(
            "doc_id long, n_samples long, sample_rate long, "
            "duration_ms long, rms_milli long, codec string"
        ),
    )


BINARY_INGEST_FILES = 64


@query("q_mm_binary_ingest")
def q_mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based multimodal ingestion through Spark's ``binaryFile``
    source — the path a real image corpus arrives by (a bucket of .png/
    .jpg objects), closing the loop the in-column queries (q_mm_pipeline)
    start from: files -> (path, length, content) rows -> Arrow-batched
    decode -> typed features.

    Fixture: BINARY_INGEST_FILES real PNGs (stdlib codec) rendered from
    the first documents into an applicationId-keyed scratch dir — a
    BOUNDED driver write, documented as fixture setup only; at 100 TB the
    files already exist and the query IS the read path: the binaryFile
    source lists and splits like any file source, `pathGlobFilter` prunes
    non-image objects at listing time, metadata columns (length, path)
    filter without touching payload bytes, and decode parallelism comes
    from the same repartition-on-key discipline as q_mm_pipeline.
    Rows-only (paths/mtimes are environment-specific); feature parity
    with the in-column twin is pinned in tests/test_multimodal_golden.py.
    """
    import os

    from ..tables import require_local_master, scratch_dir

    # The fixture is written with driver-local open(): executors on a real
    # cluster would not see the driver's filesystem, so make that failure
    # mode explicit instead of letting binaryFile return 0 rows.
    require_local_master(spark, "q_mm_binary_ingest's PNG fixture")

    d = scratch_dir(spark, sf_dir, "binary_ingest")
    os.makedirs(d, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(BINARY_INGEST_FILES)
        .collect()  # bounded fixture write: BINARY_INGEST_FILES rows
    )
    for r in docs:
        with open(os.path.join(d, f"doc_{r.doc_id}.png"), "wb") as fh:
            fh.write(_bytes_to_png(r.text.encode("utf-8")))
    (  # a non-matching object proves pathGlobFilter prunes at listing
        open(os.path.join(d, "manifest.txt"), "w").close()
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(d)
    )
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.png$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    return payloads.repartition("doc_id").mapInPandas(
        _decode_features, schema=DECODED_SCHEMA
    )


THUMB_W = 8
THUMB_H = 8

RESIZED_SCHEMA = (
    "doc_id long, src_w long, src_h long, thumb_w long, thumb_h long, "
    "thumb_len long, thumb_checksum_mod long, codec string"
)


def resize_nearest(
    w: int, h: int, pixels: bytes, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major gray8 pixel buffer — the
    deterministic index formula src = floor(dst * src_dim / dst_dim), so
    the result is reproducible everywhere (no kernel, no rounding mode
    ambiguity, identity when dims match and dst divides src evenly)."""
    return b"".join(
        bytes(
            pixels[(oy * h // out_h) * w + (ox * w // out_w)]
            for ox in range(out_w)
        )
        for oy in range(out_h)
    )


def _resize_features(batches):
    """Arrow-batched resize step: decode PNG -> nearest-neighbor 8x8
    thumbnail -> re-encode PNG; emits source/thumb dims, the re-encoded
    thumbnail's byte length and a pixel checksum. Stub branch (codec
    column) for non-PNG payloads, like _decode_features."""
    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "src_w", "src_h", "thumb_w", "thumb_h",
            "thumb_len", "thumb_checksum_mod", "codec")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            try:
                if not is_png(payload):
                    raise PngFormatError("not a PNG")
                w, h, pixels = decode_png_gray8(payload)
                thumb = resize_nearest(w, h, pixels, THUMB_W, THUMB_H)
                reenc = encode_png_gray8(THUMB_W, THUMB_H, thumb)
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(w)
                rows["src_h"].append(h)
                rows["thumb_w"].append(THUMB_W)
                rows["thumb_h"].append(THUMB_H)
                rows["thumb_len"].append(len(reenc))
                rows["thumb_checksum_mod"].append(sum(thumb) % 997)
                rows["codec"].append("png")
            except PngFormatError:
                fw, fh, checksum = _fake_features(payload)
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(fw)
                rows["src_h"].append(fh)
                rows["thumb_w"].append(THUMB_W)
                rows["thumb_h"].append(THUMB_H)
                rows["thumb_len"].append(0)
                rows["thumb_checksum_mod"].append(checksum)
                rows["codec"].append("stub")
        yield pd.DataFrame(rows)


@query("q_mm_resize")
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE — the remaining multimodal primitive from the brief's
    decode / feature-extract / RESIZE / frame-sample list: real PNG decode
    -> deterministic nearest-neighbor 8x8 thumbnail -> real PNG re-encode,
    all inside one Arrow-batched mapInPandas (the thumbnailing pass every
    vision-training pipeline runs before feature extraction).

    Rows-only by nature (PNG byte lengths are compression-dependent), but
    the resample math is pytest-pinned: identity on already-8x8 inputs,
    hand-computed gradients, and checksum consistency with the decode
    path (tests/test_multimodal_golden.py). Scale shape identical to
    q_mm_pipeline: payloads repartitioned on the key, codec work streams
    per Arrow batch, no driver materialization.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", "text").mapInPandas(
        _encode_png, schema="doc_id long, payload binary"
    )
    return payloads.repartition("doc_id").mapInPandas(
        _resize_features, schema=RESIZED_SCHEMA
    )


# --- Perceptual hash (aHash) image dedup ----------------------------------

PHASH_SIDE = 8  # 8x8 thumbnail -> 64-bit hash


def ahash64(w: int, h: int, pixels: bytes) -> int:
    """Average-hash: nearest-neighbor the gray8 buffer to 8x8, threshold
    each cell against the integer-floor mean (strict >, so a flat image
    hashes to 0), pack row-major into a SIGNED 64-bit int (bit i = cell i;
    two's-complement wrap keeps it in Spark's LongType like simhash).
    All-integer, so the hash is bit-reproducible on any platform."""
    thumb = resize_nearest(w, h, pixels, PHASH_SIDE, PHASH_SIDE)
    mean = sum(thumb) // len(thumb)
    v = 0
    for i, p in enumerate(thumb):
        if p > mean:
            v |= 1 << i
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _phash_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched hash step: decode PNG -> aHash64; stub branch hashes
    the _fake_features checksum so non-decodable payloads still group
    deterministically. Stub values (0..996) share the real hashes'
    numeric domain — consumers must group on (codec, phash), as
    q_mm_phash does."""
    for pdf in batches:
        rows = {"doc_id": [], "phash": [], "codec": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            try:
                if not is_png(payload):
                    raise PngFormatError("not a PNG")
                w, h, pixels = decode_png_gray8(payload)
                ph, codec = ahash64(w, h, pixels), "png"
            except PngFormatError:
                ph, codec = _fake_features(payload)[2], "stub"
            rows["doc_id"].append(doc_id)
            rows["phash"].append(ph)
            rows["codec"].append(codec)
        yield pd.DataFrame(rows)


@query("q_mm_phash")
def q_mm_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: real PNG decode -> deterministic 8x8
    aHash -> exact-hash duplicate groups with a min-id representative —
    the image-side twin of q_dedup_exact, and the standard first pass of
    every vision-corpus dedup stack (aHash collisions ARE the
    near-identical images: resized/re-encoded copies hash equal because
    the thumbnail threshold pattern survives those edits).

    Scale shape: one Arrow-batched mapInPandas per payload (streamed, no
    driver materialization), then a groupBy(phash) whose group count is
    ~n distinct images — the dedup join is a plain hash join ON the hash.
    Banding the 64 bits (q_dedup_simhash's probe) is the documented
    extension for Hamming-distance near-dups. Rows-only (PNG decode is
    not SQL-expressible); the hash math and dedup semantics are
    pytest-pinned on golden images (tests/test_multimodal_golden.py).
    """
    return phash_verdicts(_corpus_payloads(spark, sf_dir))


def _corpus_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus as a (doc_id, payload) PNG frame — one
    builder shared by every image-hash query (review catch: two copies
    of the encode pipeline drifted a refactor away from diverging)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        _encode_png, schema="doc_id long, payload binary"
    )


def phash_verdicts(payloads: DataFrame) -> DataFrame:
    """Perceptual-hash dedup verdicts over a (doc_id, payload) frame —
    the core q_mm_phash wraps, callable on any binary-column source.

    Groups on (codec, phash), not the hash alone: stub checksums (0..996)
    live in the same numeric domain as real aHash values (a flat PNG
    hashes to 0), so a mixed corpus would otherwise merge a real image
    with an undecodable payload into one "duplicate" group (review
    catch — a silent false drop)."""
    hashed = payloads.repartition("doc_id").mapInPandas(
        _phash_features, schema="doc_id long, phash long, codec string"
    )
    groups = hashed.groupBy("codec", "phash").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return hashed.join(groups, ["codec", "phash"]).select(
        "doc_id",
        "phash",
        "rep_id",
        "group_size",
        (F.col("doc_id") == F.col("rep_id")).cast("bigint").alias("keep"),
    )


PHASH_BAND_BITS = 16  # 4 bands of 16 bits over the 64-bit hash
PHASH_HAMMING_MAX = 4


@query("q_mm_phash_hamming")
def q_mm_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate images: pairs of PNG payloads whose aHash64 differ
    in at most PHASH_HAMMING_MAX of 64 bits — the Hamming tier above
    q_mm_phash's exact-hash groups, catching re-encoded / lightly edited
    copies whose threshold pattern shifted in a few cells.

    The scale shape is q_dedup_simhash's band probe applied to the image
    hash: split the 64 bits into 4 disjoint 16-bit bands. By pigeonhole,
    a pair at Hamming distance <= 3 leaves at least one band UNTOUCHED
    and is always a candidate; at exactly 4 it is found unless each band
    absorbed exactly one flip (the one documented miss, pinned in the
    pytest). Candidates come from 4 equi-joins on (band, 16-bit key) —
    never an all-pairs compare — and each is re-scored with an EXACT
    popcount (row-local). Work scales with band-bucket collision mass.
    Rows-only (PNG decode is not SQL-expressible); the recall bound and
    pair semantics are pytest-pinned on crafted hashes.
    """
    hashed = (
        _corpus_payloads(spark, sf_dir)
        .repartition("doc_id")
        .mapInPandas(
            _phash_features,
            schema="doc_id long, phash long, codec string",
        )
        .filter(F.col("codec") == "png")
    )
    return phash_near_pairs(hashed)


def phash_near_pairs(hashed: DataFrame) -> DataFrame:
    """Banded Hamming join over a (doc_id, phash) frame: candidates from
    4 x 16-bit band equi-joins, exact popcount re-score, pairs kept at
    distance <= PHASH_HAMMING_MAX (exact-equal pairs excluded — those
    are q_mm_phash's groups)."""
    n_bands = 64 // PHASH_BAND_BITS
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(
                        F.col("phash"), i * PHASH_BAND_BITS
                    )
                    .bitwiseAND(F.lit((1 << PHASH_BAND_BITS) - 1))
                    .alias("key"),
                )
                for i in range(n_bands)
            ]
        )
    ).alias("b")
    sig = hashed.select("doc_id", "phash", bands).select(
        "doc_id", "phash", F.col("b.band").alias("band"),
        F.col("b.key").alias("key"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        # popcount filter BEFORE the dedup exchange (review catch):
        # exact-duplicate pairs collide in all 4 bands and dominate the
        # candidate volume; the distance is identical for every copy of
        # a pair, so filtering first is semantically identical and
        # strictly shrinks the shuffle
        .filter(
            (F.col("hamming") > 0)
            & (F.col("hamming") <= PHASH_HAMMING_MAX)
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand
