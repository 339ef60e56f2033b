"""Schema-projected JSON ingestion — parity with the reference pipeline.

Reference behavior being reproduced (citations into /root/reference/icebergIngest):
  * schema-driven parse onto the table schema, App.java:211-239 — here
    ``spark.read.schema(...).json`` / ``from_json``;
  * fields in JSON but not in schema: ignored (App.java:219); schema fields
    missing from JSON: null (App.java:223) — Spark's native projection rule;
  * malformed record -> dropped (App.java:235-238) — ``mode=DROPMALFORMED``;
  * type matrix incl. nested struct/list/map — App.java:241-319, mapped per
    SURVEY.md §1.3 (TIME -> micros-of-day LONG convention; TIMESTAMP parsed
    properly, unlike the reference's double-parse bug at App.java:262-263).

Unlike the reference, nothing is materialized on the driver: the JSON
datasource streams line-splits on executors (the reference buffers whole blobs
in a ByteArrayOutputStream on one thread, App.java:190-193).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query

# Target table schema per FIXTURES.md §B (exercises every extractJsonValue
# branch, App.java:241-319).
EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("component_id", T.StringType()),
        T.StructField("event_date", T.DateType()),
        T.StructField("event_time", T.StringType()),  # parsed to micros below
        T.StructField("event_ts", T.TimestampNTZType()),
        T.StructField("amount", T.DecimalType(10, 2)),
        T.StructField("score", T.DoubleType()),
        T.StructField("ratio", T.FloatType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("active", T.BooleanType()),
        T.StructField(
            "geo",
            T.StructType(
                [
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)

FIXTURE_DIR = "/tmp/iceberg_insert_spark/events_json"


def write_fixture(base_dir: str = FIXTURE_DIR, n_rows: int = 200) -> str:
    """Deterministic JSON-lines fixture per FIXTURES.md §B row mix:
    ~90% clean, ~5% missing-field, ~3% extra-field, ~2% malformed lines.
    Layout events/<component_id>/part.json mirrors App.java:166."""
    if os.path.exists(base_dir):
        shutil.rmtree(base_dir)
    components = ["compA", "compB"]
    for comp in components:
        os.makedirs(f"{base_dir}/events/{comp}", exist_ok=True)
    lines: dict[str, list[str]] = {c: [] for c in components}
    for i in range(n_rows):
        comp = components[i % 2]
        if i % 50 == 49:  # ~2% malformed -> dropped (App.java:235-238)
            lines[comp].append('{"event_id": %d, "broken"' % i)
            continue
        row = {
            "event_id": i,
            "component_id": comp,
            "event_date": f"2024-02-{(i % 28) + 1:02d}",
            "event_time": f"{i % 24:02d}:{i % 60:02d}:{(i * 7) % 60:02d}",
            "event_ts": f"2024-02-{(i % 28) + 1:02d}T{i % 24:02d}:00:00",
            "amount": f"{(i * 13) % 1000}.{i % 100:02d}",
            "score": i * 0.5,
            "ratio": (i % 10) / 8.0,
            "count": i % 7,
            "active": i % 3 == 0,
            "geo": {"lat": 10.0 + i * 0.01, "lon": -20.0 + i * 0.02},
            "tags": [f"t{i % 3}", f"t{i % 5}"],
            "attrs": {"k1": f"v{i % 4}", "src": comp},
        }
        if i % 20 == 19:  # ~5% missing nullable field -> null (App.java:223)
            del row["score"], row["geo"]
        if i % 33 == 32:  # ~3% extra unknown field -> ignored (App.java:219)
            row["unknown_field"] = "ignored"
        lines[comp].append(json.dumps(row))
    for comp in components:
        with open(f"{base_dir}/events/{comp}/batch0.json", "w") as f:
            f.write("\n".join(lines[comp]) + "\n")
    return base_dir


def read_events_json(spark: SparkSession, base_dir: str) -> DataFrame:
    """Typed, schema-projected read of the landing zone (all components).

    TIME convention (SURVEY.md §1.3): no Spark TIME type, so event_time is
    parsed to micros-of-day as ``event_time_us`` LONG.
    """
    df = (
        spark.read.schema(EVENTS_JSON_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(f"{base_dir}/events/*/")
    )
    return df.withColumn(
        "event_time_us",
        (
            F.split("event_time", ":").getItem(0).cast("long") * 3600
            + F.split("event_time", ":").getItem(1).cast("long") * 60
            + F.split("event_time", ":").getItem(2).cast("long")
        )
        * 1_000_000,
    )


@query(
    "q_ingest_json_typed",
    oracle=f"""
    SELECT event_id, component_id,
           STRFTIME(event_date, '%Y-%m-%d') AS event_date,
           (CAST(split_part(event_time, ':', 1) AS BIGINT) * 3600
            + CAST(split_part(event_time, ':', 2) AS BIGINT) * 60
            + CAST(split_part(event_time, ':', 3) AS BIGINT)) * 1000000
               AS event_time_us,
           epoch_us(event_ts) AS event_ts_us,
           CAST(amount AS VARCHAR) AS amount_str,
           score, CAST(ratio AS DOUBLE) AS ratio_d, count, active,
           geo.lat AS lat, geo.lon AS lon,
           array_to_string(tags, ',') AS tags_csv,
           attrs['k1'][1] AS attr_k1
    FROM read_json('{FIXTURE_DIR}/events/*/batch0.json',
         format='newline_delimited', ignore_errors=true,
         columns={{event_id:'BIGINT', component_id:'VARCHAR',
                  event_date:'DATE', event_time:'VARCHAR',
                  event_ts:'TIMESTAMP', amount:'DECIMAL(10,2)',
                  score:'DOUBLE', ratio:'FLOAT', count:'INTEGER',
                  active:'BOOLEAN', geo:'STRUCT(lat DOUBLE, lon DOUBLE)',
                  tags:'VARCHAR[]', attrs:'MAP(VARCHAR,VARCHAR)'}})
    WHERE event_id IS NOT NULL
    """,
)
def q_ingest_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end typed JSON ingest, DuckDB-oracled (round-5 upgrade from
    rows-only): both engines read the SAME deterministic JSON-lines
    fixture — Spark via schema-projected DROPMALFORMED, DuckDB via
    ``read_json(ignore_errors)`` — exercising the full type matrix
    (decimal, float->double, date, timestamp, struct, array, map) plus the
    three dirty-row behaviors the reference defines (App.java:219,223,
    235-238): unknown fields ignored, missing fields null, malformed lines
    dropped. DuckDB keeps malformed lines as all-NULL rows instead of
    dropping them, hence the oracle's ``event_id IS NOT NULL`` (clean rows
    always carry an id; a failed parse nulls every column).

    Hash-stability spellings: dates/timestamps cross the driver hash as
    string/epoch-micros (repo convention, q_events_dau_mau); decimals as
    their canonical 2-dp string; floats are bit-identical because both
    engines correctly-round the same JSON decimal literal.
    """
    from ..tables import epoch_us, require_local_master

    require_local_master(spark, "q_ingest_json_typed's JSON fixture")
    base = write_fixture()
    df = read_events_json(spark, base)

    # flatten nested values so the returned schema is stable and hashable
    return df.select(
        "event_id",
        "component_id",
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        "event_time_us",
        epoch_us("event_ts").alias("event_ts_us"),
        F.col("amount").cast("string").alias("amount_str"),
        "score",
        F.col("ratio").cast("double").alias("ratio_d"),
        "count",
        "active",
        F.col("geo.lat").alias("lat"),
        F.col("geo.lon").alias("lon"),
        F.array_join("tags", ",").alias("tags_csv"),
        F.col("attrs")["k1"].alias("attr_k1"),
    ).orderBy("event_id")


def read_events_json_quarantine(
    spark: SparkSession, base_dir: str
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE-mode read: (clean rows, quarantined raw lines).

    The reference silently DROPS malformed records (catch -> null,
    App.java:235-238) and so does our DROPMALFORMED parity path (S5). This
    is the documented upgrade: unparseable lines land in ``_corrupt_record``
    and are returned as a quarantine DataFrame for replay/alerting instead
    of vanishing — at 100 TB, silent drops are how corpora rot. One scan
    serves both outputs (the corrupt column is just another projected field).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        EVENTS_JSON_SCHEMA.fields + [StructField("_corrupt_record", StringType())]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(f"{base_dir}/events/*/")
        .cache()  # one scan, two outputs; Spark requires caching before
        # referencing _corrupt_record in a filter
    )
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, quarantine
