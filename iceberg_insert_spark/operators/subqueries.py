"""Subqueries: scalar / IN / EXISTS, uncorrelated and correlated (SURVEY.md §2.4).

The reference has no subquery surface (no SQL parser at all — SURVEY.md §0);
these rows are [EXT] engine surface. They are deliberately expressed through
``spark.sql`` over temp views: Catalyst's subquery machinery (ScalarSubquery
reuse, ``RewritePredicateSubquery`` into left-semi/anti joins, correlated
decorrelation) is the engine feature under test, and the same text runs on the
DuckDB oracle.

Temp view names are scoped by sf_dir (``lineitem__sf0_01`` etc.): a shared
SparkSession serves concurrent queries over different datasets, so a fixed
view name would be a cross-query race (tests/test_concurrency.py).

Scale notes: an uncorrelated scalar subquery executes once and broadcasts; IN
and EXISTS rewrite to semi joins that shuffle on the join key (broadcast when
the subquery side is small); the correlated Q17-shape aggregates per group
*before* joining, so the heavy table streams through one hash aggregate
instead of a per-row re-scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import load_table


def _scoped_sql(
    spark: SparkSession, sf_dir: str, sql_template: str, *tables: str
) -> DataFrame:
    """Register sf-scoped temp views and run the template against them."""
    tag = re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    names = {}
    for t in tables:
        scoped = f"{t}__{tag}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(scoped)
        names[t] = scoped
    return spark.sql(sql_template.format(**names))


_SCALAR_SQL = """
    SELECT l_returnflag, COUNT(*) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM {lineitem}
    WHERE l_quantity < (SELECT AVG(l_quantity) FROM {lineitem})
    GROUP BY l_returnflag
"""


@query("q_subq_scalar", oracle=_SCALAR_SQL.format(lineitem="lineitem"))
def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a literal.

    l_quantity is integral (verified in testdata) so the < AVG(...) boundary
    cannot sit on a float ulp between engines.
    """
    return _scoped_sql(spark, sf_dir, _SCALAR_SQL, "lineitem")


_IN_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM {orders}
    WHERE o_custkey IN (SELECT c_custkey FROM {customer}
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
"""


@query("q_subq_in", oracle=_IN_SQL.format(orders="orders", customer="customer"))
def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) -> Catalyst rewrites to a left-semi join on o_custkey."""
    return _scoped_sql(spark, sf_dir, _IN_SQL, "orders", "customer")


_EXISTS_SQL = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM {customer}
    WHERE EXISTS (SELECT 1 FROM {orders}
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
"""


@query(
    "q_subq_exists",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def q_subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -> decorrelated to a left-semi join."""
    return _scoped_sql(spark, sf_dir, _EXISTS_SQL, "customer", "orders")


_NOT_EXISTS_SQL = """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM {customer}
    WHERE NOT EXISTS (SELECT 1 FROM {orders}
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 450000)
    GROUP BY c_mktsegment
"""


@query(
    "q_subq_not_exists",
    oracle=_NOT_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def q_subq_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS -> left-anti join with a pushed filter."""
    return _scoped_sql(spark, sf_dir, _NOT_EXISTS_SQL, "customer", "orders")


_SCALAR_CORR_SQL = """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM {lineitem} l1
    JOIN {part} ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM {lineitem} l2
                        WHERE l2.l_partkey = l1.l_partkey)
"""


@query(
    "q_subq_scalar_corr",
    oracle=_SCALAR_CORR_SQL.format(lineitem="lineitem", part="part"),
)
def q_subq_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape).

    Catalyst decorrelates to aggregate-then-join: lineitem is hash-aggregated
    per partkey once, not re-scanned per outer row. Integral quantities make
    0.5*AVG an exact double, so the comparison is engine-stable.
    """
    return _scoped_sql(spark, sf_dir, _SCALAR_CORR_SQL, "lineitem", "part")


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM {customer} c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
    WHERE c.c_custkey % 10 = 7
"""


@query(
    "q_join_lateral",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join with per-row ORDER BY + LIMIT — the
    "top-N related rows for each outer row" shape SQL:2003 lateral
    derived tables exist for. The same text runs on DuckDB; ties break
    on o_orderkey so the top-2 set is deterministic.

    Scale shape (verified with .explain): Catalyst decorrelates the
    per-row LIMIT into WindowGroupLimit — a map-side PARTIAL top-2 per
    custkey before the shuffle, then a final top-2 after — so the
    orders table is never nested-loop re-scanned per customer (the
    naive lateral execution), and the outer %10 predicate is
    transitively pushed into the orders scan. The customer side
    broadcasts. At 100 TB this is the identical plan a hand-written
    rank-then-filter would get, with the partial group-limit cutting
    shuffle volume to <= 2 rows per key.
    """
    return _scoped_sql(spark, sf_dir, _LATERAL_SQL, "customer", "orders")
