"""Typed CSV ingestion — the third landing-zone format next to JSON-lines
(json_ingest) and raw binary (multimodal's binaryFile), closing the
most-common-format gap in §2.1.

The fixture deliberately exercises the parts of CSV that break naive
splitters — quoted fields with embedded commas, embedded double-quotes
(RFC 4180 "" escaping), embedded NEWLINES inside quoted fields (forcing
``multiLine=true``: the file can no longer be line-split, which is the real
scale trade of quoted CSV — Spark falls back to one task per FILE, so at
100 TB you keep multiline CSV in many small-enough files or convert at the
edge), explicit NULL markers, and malformed rows (wrong arity) that
``DROPMALFORMED`` must drop.

The DuckDB oracle reads the SAME file via ``read_csv`` with the identical
column spec, null marker and ``ignore_errors`` — so quoting, null and
malformed-row semantics are verified cross-engine, not assumed.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query

CSV_FIXTURE_DIR = "/tmp/iceberg_insert_spark/items_csv"
NULL_MARKER = "\\N"  # explicit, so empty-vs-null is never ambiguous

CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("price", T.DecimalType(10, 2)),
        T.StructField("d", T.DateType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("note", T.StringType()),
    ]
)


def write_csv_fixture(base_dir: str = CSV_FIXTURE_DIR, n_rows: int = 200) -> str:
    """Deterministic CSV fixture: ~90% plain rows, plus quoted-comma,
    escaped-quote, embedded-newline, null-marker and malformed-arity rows
    on fixed residues."""
    if os.path.exists(base_dir):
        shutil.rmtree(base_dir)
    os.makedirs(base_dir, exist_ok=True)
    lines = ["id,name,qty,price,d,flag,note"]
    for i in range(n_rows):
        if i % 50 == 49:  # malformed: wrong column count -> dropped
            lines.append(f"{i},broken_row_only_three_cols,0")
            continue
        if i % 11 == 3:  # quoted field with embedded comma
            name = f'"widget, size {i % 9}"'
        elif i % 11 == 7:  # RFC 4180 escaped double-quote
            name = f'"the ""best"" part {i % 5}"'
        elif i % 17 == 5:  # embedded newline inside quotes -> multiLine
            name = f'"two\nline name {i % 4}"'
        else:
            name = f"part_{i % 25}"
        note = NULL_MARKER if i % 7 == 2 else f"note {i % 6}"
        price = f"{(i * 19) % 800}.{i % 100:02d}"
        lines.append(
            f"{i},{name},{i % 40},{price},"
            f"2024-03-{(i % 28) + 1:02d},{str(i % 2 == 0).lower()},{note}"
        )
    with open(f"{base_dir}/items.csv", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return base_dir


@query(
    "q_ingest_csv_typed",
    oracle=f"""
    SELECT id, name, qty, CAST(price AS VARCHAR) AS price_str,
           STRFTIME(d, '%Y-%m-%d') AS d, flag, note
    FROM read_csv('{CSV_FIXTURE_DIR}/items.csv',
         header=true, nullstr='{NULL_MARKER}', ignore_errors=true,
         columns={{id:'BIGINT', name:'VARCHAR', qty:'INTEGER',
                  price:'DECIMAL(10,2)', d:'DATE', flag:'BOOLEAN',
                  note:'VARCHAR'}})
    WHERE id IS NOT NULL
    """,
)
def q_ingest_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end typed CSV ingest, DuckDB-oracled: schema-projected read
    with header, explicit null marker, RFC 4180 quoting (embedded commas,
    ""-escaped quotes, embedded newlines via multiLine) and
    DROPMALFORMED for wrong-arity rows. The oracle's ``ignore_errors``
    keeps failed rows as all-NULL instead of dropping (same as
    read_json), hence its ``id IS NOT NULL`` filter — clean rows always
    carry an id.

    Hash-stability spellings follow q_ingest_json_typed: decimal as its
    canonical 2-dp string, date via date_format.
    """
    from ..tables import require_local_master

    require_local_master(spark, "q_ingest_csv_typed's CSV fixture")
    base = write_csv_fixture()
    df = (
        spark.read.schema(CSV_SCHEMA)
        .option("header", "true")
        .option("multiLine", "true")
        # RFC 4180 "" escaping: Spark's DEFAULT escape is backslash, which
        # leaves '"a ""b"" c"' quoted-raw; escape='"' restores the standard
        .option("escape", '"')
        .option("nullValue", NULL_MARKER)
        .option("mode", "DROPMALFORMED")
        .csv(f"{base}/items.csv")
    )
    return df.select(
        "id",
        "name",
        "qty",
        F.col("price").cast("string").alias("price_str"),
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "flag",
        "note",
    ).orderBy("id")
