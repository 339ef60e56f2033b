"""Schema evolution for the partitioned parquet sink — Iceberg's ALTER TABLE
semantics in miniature, the first real-world ask beyond the reference's
fixed table-owned schema (App.java:87 projects every record onto one
immutable schema; App.java:219-232 drops anything that doesn't fit).

Mechanism (exactly Iceberg's, minus the catalog):

  * every write lands under a ``_v=N/`` version directory whose schema is
    recorded as a JSON sidecar in ``_schemas/vN.json`` (Iceberg: schema-id
    per data file in the manifest);
  * ``add_column`` / ``widen_column`` bump the version — old files are NEVER
    rewritten (Iceberg: metadata-only ALTER);
  * reads resolve per version: each version dir is scanned with ITS OWN
    schema, projected onto the current one (missing columns -> typed NULLs,
    widened columns -> upcast), then unioned. The casts are executor-side
    row expressions inside the scan stage — no extra shuffle, no driver
    work, so the read plan at 100 TB is the same N parallel parquet scans
    it would be without evolution (Iceberg: read-time schema resolution).

Only widening promotions are legal (int->bigint, float->double,
decimal scale-preserving precision growth) — the same whitelist Iceberg
enforces — because every old value must be exactly representable in the new
type; narrowing raises before any metadata changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_table

# Iceberg's legal type promotions (spec v2 "Schema Evolution"): value-exact
# widenings only.
_WIDENINGS: dict[str, set[str]] = {
    "integer": {"long"},
    "float": {"double"},
}


def _type_name(dt: T.DataType) -> str:
    return dt.typeName()


class EvolvingTable:
    """A parquet directory whose schema can evolve without file rewrites."""

    def __init__(self, path: str):
        self.path = path
        self._schema_dir = os.path.join(path, "_schemas")

    # ---- metadata ----------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._schema_dir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._schema_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def _load_schema(self, version: int) -> T.StructType:
        with open(os.path.join(self._schema_dir, f"v{version}.json")) as fh:
            return T.StructType.fromJson(json.load(fh))

    def _save_schema(self, version: int, schema: T.StructType) -> None:
        os.makedirs(self._schema_dir, exist_ok=True)
        with open(os.path.join(self._schema_dir, f"v{version}.json"), "w") as fh:
            json.dump(schema.jsonValue(), fh)

    @property
    def current_version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else 0

    def current_schema(self) -> T.StructType:
        return self._load_schema(self.current_version)

    # ---- DDL ---------------------------------------------------------

    def create(self, schema: T.StructType) -> None:
        if self._versions():
            raise ValueError(f"table already exists at {self.path}")
        self._save_schema(1, schema)

    def add_column(self, name: str, dtype: T.DataType) -> None:
        """Metadata-only ADD COLUMN: old files read as typed NULL."""
        schema = self.current_schema()
        if name in schema.fieldNames():
            raise ValueError(f"column {name} already exists")
        self._save_schema(
            self.current_version + 1,
            T.StructType(schema.fields + [T.StructField(name, dtype, True)]),
        )

    def widen_column(self, name: str, dtype: T.DataType) -> None:
        """Metadata-only type promotion; only value-exact widenings pass."""
        schema = self.current_schema()
        if name not in schema.fieldNames():
            raise ValueError(f"no such column: {name}")
        old = schema[name].dataType
        if _type_name(dtype) not in _WIDENINGS.get(_type_name(old), set()):
            raise ValueError(
                f"illegal promotion {_type_name(old)} -> {_type_name(dtype)}"
                " (Iceberg allows int->long, float->double only)"
            )
        fields = [
            T.StructField(f.name, dtype if f.name == name else f.dataType,
                          f.nullable)
            for f in schema.fields
        ]
        self._save_schema(self.current_version + 1, T.StructType(fields))

    # ---- data --------------------------------------------------------

    def append(self, df: DataFrame) -> None:
        """Append under the CURRENT schema version's directory. The frame is
        projected onto the current schema (same column order, exact types)
        so every file in ``_v=N`` is bit-compatible with ``vN.json``."""
        schema = self.current_schema()
        projected = df.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields]
        )
        projected.write.mode("append").parquet(
            os.path.join(self.path, f"_v={self.current_version}")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Union of every version dir, each resolved to the current schema.

        Missing columns become typed NULL literals, widened columns upcast —
        both are per-row executor-side expressions fused into the scan
        stage. unionByName keeps this a metadata concat (no shuffle)."""
        current = self.current_schema()
        out = None
        for v in self._versions():
            vdir = os.path.join(self.path, f"_v={v}")
            if not os.path.isdir(vdir):
                continue
            vschema = self._load_schema(v)
            df = spark.read.schema(vschema).parquet(vdir)
            cols = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in vschema.fieldNames()
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in current.fields
            ]
            df = df.select(*cols)
            out = df if out is None else out.unionByName(df)
        if out is None:
            raise ValueError(f"empty table at {self.path}")
        return out


@query(
    "q_schema_evolution",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    ), unioned AS (
        SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT COALESCE(o_orderpriority, '<pre-evolution>') AS priority,
           COUNT(*) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM unioned
    GROUP BY 1
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end schema evolution round-trip, DuckDB-oracled.

    v1 writes half of orders as (o_orderkey INT, o_totalprice FLOAT); the
    table then evolves — widen o_orderkey -> BIGINT, o_totalprice -> DOUBLE,
    add o_orderpriority STRING — and v2 writes the other half under the new
    schema. The read-back must surface v1 rows with exact upcasts (float's
    value survives the float->double promotion bit-for-bit, mirrored by the
    oracle's REAL round-trip) and NULL priority. The money sum is exact
    integer CENTS via floor(x*100): float-widened doubles land exactly on
    .xx5 half-steps (.625 is binary), where Spark's decimal cast rounds
    HALF_UP but DuckDB's rounds HALF_EVEN — floor of the identical IEEE
    product sidesteps the tie rule entirely and a BIGINT sum is
    partition-order-independent."""
    from ..tables import scratch_dir

    path = scratch_dir(spark, sf_dir, "evolve")

    o = load_table(spark, sf_dir, "orders")
    tbl = EvolvingTable(path)
    tbl.create(
        T.StructType(
            [
                T.StructField("o_orderkey", T.IntegerType()),
                T.StructField("o_totalprice", T.FloatType()),
            ]
        )
    )
    tbl.append(o.filter(F.col("o_orderkey") % 2 == 0))
    tbl.widen_column("o_orderkey", T.LongType())
    tbl.widen_column("o_totalprice", T.DoubleType())
    tbl.add_column("o_orderpriority", T.StringType())
    tbl.append(
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
    )
    return (
        tbl.read(spark)
        .groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias(
                "priority"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0).cast("bigint"))
            .cast("bigint")
            .alias("sum_price_cents"),
        )
    )
