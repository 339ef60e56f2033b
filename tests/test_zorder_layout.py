"""Z-order layout locality: prove the data-skipping claim on real parquet
footers, not by assertion.

Write orders twice — sorted by o_custkey alone vs sorted by the Morton
z-value of (custkey, orderdate) — and read back each file's min/max range
per dimension from the footers. The z-sorted layout must shrink the mean
per-file o_orderdate span by >= 2x vs the custkey-sorted layout (which
clusters custkey perfectly but leaves dates spanning the whole table), while
keeping custkey spans bounded. This is what makes predicates on EITHER
column skip files at 100 TB."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from iceberg_insert_spark.operators.partitions import zvalue
from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR

N_FILES = 8


def _mean_spans(path: str, col_a: str, col_b: str) -> tuple[float, float]:
    spans_a, spans_b = [], []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {col_a: [], col_b: []}
        maxs = {col_a: [], col_b: []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        if mins[col_a]:
            spans_a.append(float(max(maxs[col_a]) - min(mins[col_a])))
        if mins[col_b]:
            b_min, b_max = min(mins[col_b]), max(maxs[col_b])
            spans_b.append(float((b_max - b_min).days))
    return sum(spans_a) / len(spans_a), sum(spans_b) / len(spans_b)


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("o_date")
    )
    by_key = str(tmp_path / "by_custkey")
    by_z = str(tmp_path / "by_zvalue")
    o.repartitionByRange(N_FILES, "o_custkey").write.mode("overwrite").parquet(
        by_key
    )
    da = F.pmod(F.col("o_custkey"), F.lit(65536))
    db = F.pmod(
        F.datediff(F.col("o_date"), F.lit("1970-01-01").cast("date")),
        F.lit(65536),
    ).cast("long")
    z = o.withColumn("z", zvalue(da, db))
    z.repartitionByRange(N_FILES, "z").write.mode("overwrite").parquet(by_z)

    key_cust_span, key_date_span = _mean_spans(by_key, "o_custkey", "o_date")
    z_cust_span, z_date_span = _mean_spans(by_z, "o_custkey", "o_date")

    # custkey-sorted: perfect custkey locality, but every file spans ~the
    # whole date range. z-sorted: BOTH spans must be a fraction of the
    # table's extent — the date span at least 2x narrower than custkey-sort's.
    assert z_date_span * 2 <= key_date_span, (
        f"z-order gave no date locality: {z_date_span} vs {key_date_span}"
    )
    total_cust_span = 15000 * 10  # c_custkey range upper bound at any test SF
    assert z_cust_span < total_cust_span, "no custkey stats at all"


def test_normalized_zorder_balances_both_dimensions(spark, tmp_path):
    """Range-normalized interleave must narrow the NARROWER-domain dimension
    far more than raw-bit interleave does: raw interleaving lets the wider
    domain's high bits dominate and day locality collapses (measured: 23.5
    vs 13.9 of 32 files surviving a day-band predicate)."""
    from iceberg_insert_spark.operators.partitions import zorder_layout

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("o_day"),
    )
    raw = str(tmp_path / "raw_z")
    da = F.pmod(F.col("o_custkey"), F.lit(65536))
    db = F.pmod(F.col("o_day"), F.lit(65536))
    o.withColumn("z", zvalue(da, db)).repartitionByRange(
        N_FILES, "z"
    ).sortWithinPartitions("z").drop("z").write.mode("overwrite").parquet(raw)
    norm = str(tmp_path / "norm_z")
    zorder_layout(o, "o_custkey", "o_day", N_FILES).write.mode(
        "overwrite"
    ).parquet(norm)

    def span_fracs(path):
        spans = {"o_custkey": [], "o_day": []}
        extents = {}
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo, hi = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    n = c.path_in_schema
                    if n in spans and c.statistics:
                        lo[n] = min(lo.get(n, 1 << 62), c.statistics.min)
                        hi[n] = max(hi.get(n, -(1 << 62)), c.statistics.max)
            for n in spans:
                if n in lo:
                    spans[n].append(float(hi[n] - lo[n]))
                    e = extents.setdefault(n, [lo[n], hi[n]])
                    e[0], e[1] = min(e[0], lo[n]), max(e[1], hi[n])
        return {
            n: (sum(s) / len(s)) / max(extents[n][1] - extents[n][0], 1)
            for n, s in spans.items()
        }

    # Raw interleave lets whichever dimension has the wider RAW bit-domain
    # dominate the sort (which dimension that is flips with SF — exactly
    # the fragility), leaving the other near fraction 1.0. Normalized
    # z-order must (a) strictly improve the WORST dimension and (b) keep
    # both dimensions' mean per-file span under 70% of their extent.
    raw_f, norm_f = span_fracs(raw), span_fracs(norm)
    assert max(norm_f.values()) < max(raw_f.values()), (
        f"normalization didn't improve the worst dimension: {norm_f} vs {raw_f}"
    )
    assert max(norm_f.values()) < 0.7, f"unbalanced layout: {norm_f}"
