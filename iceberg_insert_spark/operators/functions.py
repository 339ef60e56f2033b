"""Scalar-function surface: string / date / math / array / explode / JSON
(SURVEY.md §2.4). All JVM built-ins — zero Python in the hot path.

Cross-engine alignment rules baked into each oracle:
  * Spark length()/instr()/year()/ceil() return INT/LONG while DuckDB returns
    BIGINT/DOUBLE — both sides are cast to BIGINT explicitly.
  * transcendental results (ln/pow) are rounded to 6 decimals on both sides
    (libm implementations differ in the last ulp).
  * array elements are float32 in the data; both sides cast to DOUBLE before
    comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "q_str_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 3) AS name_pre,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           REPLACE(p_name, ' ', '_') AS name_snake,
           CONCAT_WS('-', p_brand, p_type) AS brand_type,
           STRING_SPLIT(p_name, ' ')[1] AS first_token,
           LPAD(p_brand, 10, '*') AS brand_pad,
           CAST(INSTR(p_name, 'red') AS BIGINT) AS red_pos,
           TRIM(CONCAT('  ', p_name, '  ')) AS name_trim
    FROM part
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part.p_name."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 3).alias("name_pre"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
        F.lpad("p_brand", 10, "*").alias("brand_pad"),
        F.instr("p_name", "red").cast("bigint").alias("red_pos"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
           CAST(o_orderdate AS DATE) AS o_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(DATEDIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
               AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function battery over orders.o_orderdate (TIMESTAMP_NTZ)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.col("o_orderdate").cast("date").alias("o_date"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
        )
        .cast("bigint")
        .alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000.0) AS abs_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_kilo_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           l_orderkey % 7 AS key_mod,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           CAST(SIGN(l_extendedprice - 30000.0) AS BIGINT) AS dev_sign
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem (sqrt is IEEE-exact; ln/pow rounded)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("bigint").alias(
            "price_kilo_ceil"
        ),
        F.floor(F.col("l_quantity")).cast("bigint").alias("qty_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("bigint").alias("dev_sign"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id, label,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[2] AS DOUBLE) AS head2,
           CAST(embedding[3] AS DOUBLE) AS head3,
           ROUND((SELECT SUM(CAST(x AS DOUBLE)) FROM UNNEST(embedding) AS t(x)), 4)
               AS vec_sum
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over embeddings.embedding (array<float>, dim 64).

    The slice stays internal and its elements surface as scalar doubles —
    the driver's canonicalizer cannot hash array-typed output columns
    (r01 q_agg_collect finding), so no oracle query returns an array."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice("embedding", 1, 3)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at(head, 2).cast("double").alias("head2"),
        F.element_at(head, 3).cast("double").alias("head3"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vec_sum"),
    )


@query(
    "q_explode",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
    FROM documents
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(array) -> rows (UDTF shape); DuckDB twin is UNNEST."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))


@query(
    "q_map_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(LENGTH(props) AS BIGINT) AS props_len,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def q_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props JSON-string column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.length("props").cast("bigint").alias("props_len"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token FROM (
        SELECT doc_id,
               UNNEST(list_transform(string_split(text, ' '),
                      (x, i) -> struct_pack(pos := i - 1, token := x))) AS u
        FROM documents)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: UDTF-shaped explode that also emits the element ordinal
    (0-based; DuckDB's list lambda index is 1-based, adjusted in the twin)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("bigint"))


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           REGEXP_EXTRACT(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(REGEXP_MATCHES(p_name, 'widget|bolt') AS BIGINT) AS is_hw
    FROM part
    """,
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match. Patterns stick to character classes
    and alternation — semantics shared by Java regex (Spark) and RE2 (DuckDB).
    Note DuckDB's REGEXP_REPLACE is first-match unless the 'g' flag is given;
    Spark's is always global."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("widget|bolt").cast("bigint").alias("is_hw"),
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_filled,
           CAST(l_discount IS NOT DISTINCT FROM l_tax AS BIGINT)
               AS disc_eq_tax_nullsafe,
           CAST(NULLIF(l_discount, 0.0) IS NULL AS BIGINT) AS disc_is_null
    FROM lineitem
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling operators: NULLIF to synthesize NULLs, COALESCE to fill,
    null-safe equality (<=> / IS NOT DISTINCT FROM), IS NULL predicates."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_nn = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_nn.alias("disc_or_null"),
        F.coalesce(disc_nn, F.lit(-1.0)).alias("disc_filled"),
        F.col("l_discount")
        .eqNullSafe(F.col("l_tax"))
        .cast("bigint")
        .alias("disc_eq_tax_nullsafe"),
        disc_nn.isNull().cast("bigint").alias("disc_is_null"),
    )


@query(
    "q_array_lambda",
    oracle="""
    SELECT vec_id,
           CAST(LEN(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
               AS sum_e,
           CAST(LEN(list_filter(embedding, x -> x > 0.5)) > 0 AS BIGINT)
               AS any_big
    FROM embeddings
    """,
)
def q_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (filter/transform/aggregate/exists) —
    all JVM-side lambda expressions, the no-UDF path for array columns.
    Both engines fold the sum left-to-right, so the float result is
    order-stable cross-engine."""
    e = load_table(spark, sf_dir, "embeddings")
    sum_e = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias(
            "n_pos"
        ),
        F.round(sum_e, 6).alias("sum_e"),
        F.exists("embedding", lambda x: x > 0.5).cast("bigint").alias("any_big"),
    )


@query(
    "q_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_name AS INTEGER) AS name_as_int,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
           TRY_CAST(SUBSTRING(p_name, 1, 3) AS DOUBLE) AS prefix_as_double
    FROM part
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST: malformed input -> NULL instead of error — the row-level
    analogue of the ingest tier's DROPMALFORMED (quarantine, don't crash,
    at any scale)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("TRY_CAST(p_name AS INTEGER)").alias("name_as_int"),
        F.expr("TRY_CAST(CAST(p_size AS STRING) AS INTEGER)").alias(
            "size_roundtrip"
        ),
        F.expr("TRY_CAST(SUBSTRING(p_name, 1, 3) AS DOUBLE)").alias(
            "prefix_as_double"
        ),
    )


@query(
    "q_map_type",
    oracle="""
    SELECT event_id,
           CAST(LEN(json_keys(props)) AS BIGINT) AS n_keys,
           ARRAY_TO_STRING(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(list_contains(json_keys(props), 'missing') AS BIGINT)
               AS has_missing
    FROM events
    """,
)
def q_map_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props column into a real
    map<string,bigint> and operate on it (size / sorted keys / element_at /
    contains). Key order out of a JSON parse is engine-specific, so any
    key listing MUST be sorted before leaving the operator — and surfaced
    as a CSV string, not an array (the driver canonicalizer cannot hash
    array cells, r01 q_agg_collect finding)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(m).cast("bigint").alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.map_contains_key(m, "missing").cast("bigint").alias("has_missing"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT) AS k_val,
           CAST(props ->> '$.missing' AS BIGINT) AS missing_val,
           CAST(json_valid(props) AS BIGINT) AS is_valid
    FROM events
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingest via Spark 4's VARIANT type: ``parse_json``
    once, then typed path extraction with ``variant_get`` /
    ``try_variant_get`` (missing path -> NULL, no error).

    VARIANT is the modern replacement for the reference's hand-rolled
    schema-projected JSON parse (App.java:211-239 / extractJsonValue
    :241-274): the binary-encoded variant keeps the full document while
    letting the scan prune to the accessed paths, so at 100 TB you pay the
    JSON string parse once at ingest, not per query. The DuckDB twin uses
    its JSON path operators over the raw string — same typed results.
    """
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json (not parse_json): an invalid-JSON props row must yield
    # NULL extractions — matching the oracle's NULL-on-invalid semantics —
    # instead of failing the whole query the is_valid flag exists to report.
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_val"),
        F.try_parse_json("props").isNotNull().cast("bigint").alias("is_valid"),
    )
