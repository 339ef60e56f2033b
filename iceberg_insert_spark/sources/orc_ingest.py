"""ORC round-trip ingestion — the columnar-format sibling of parquet in
§2.1's landing-zone surface (json_ingest, csv_ingest, binaryFile cover the
row/raw formats).

DuckDB cannot read ORC, so the oracle verifies TRANSITIVELY: Spark reads
the parquet source, writes ORC, reads the ORC back and aggregates; the
oracle aggregates the same parquet directly. Equality proves the
write→read round trip is value-exact across every exercised type (long,
double, string, timestamp_ntz) — a lost row, a shifted timestamp zone, a
dropped null or a precision change all hash-mismatch.

Scale shape: ORC is a splittable columnar format like parquet — the
read-back plans one task per stripe-range split, the writer shuffles
nothing (one file per input partition), and the status filter is pushed
into the ORC reader (min/max stripe stats + optional bloom), verified by
the PushedFilters plan assertion in tests/test_ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import exact_sum, load_table


@query(
    "q_ingest_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS sum_price,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS first_ts,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_ts,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    WHERE o_custkey % 10 <> 0
    GROUP BY o_orderstatus
    """,
)
def q_ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC → read-back fidelity, DuckDB-oracled transitively
    (DuckDB has no ORC reader, so the oracle recomputes from the parquet
    source; equality proves the ORC hop lost nothing). The read-back
    path applies the filter AFTER the format hop so ORC's own
    predicate-pushdown machinery (stripe min/max) is the thing under
    test, and the aggregate touches every column type the table carries.
    """
    from ..tables import scratch_dir

    orc_path = scratch_dir(spark, sf_dir, "ingest_orc")
    load_table(spark, sf_dir, "orders").write.option(
        "compression", "zlib"
    ).orc(orc_path)
    back = spark.read.orc(orc_path).filter(F.col("o_custkey") % 10 != 0)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice"), 2).alias("sum_price"),
        F.sum("o_orderkey").alias("sum_keys"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "first_ts"
        ),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "last_ts"
        ),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
    )
