"""Physical-plan audit — assert the plans are the ones we'd want at 100 TB.

Correctness tests prove the right ROWS come back; these prove the right PLAN
produces them: filters reach the parquet scan, projections prune columns,
dimension joins broadcast, top-k avoids a global sort, aggregates do map-side
partials, and nothing falls into an accidental cartesian product. Each
assertion names the scale failure it guards against.

Nothing here executes a job: plans are compiled only (`explainString`), so the
whole module runs in seconds.
"""

from __future__ import annotations

import pytest

from iceberg_insert_spark.registry import get_oracles, get_queries

from .conftest import SF_DIR

QUERIES = get_queries()

# Queries whose *intent* is an all-pairs comparison over provably small or
# blocked inputs — a cartesian there is the algorithm, not an accident.
CARTESIAN_OK = {
    "q_join_cross",  # region x nation, both dimension-sized
    "q_join_theta_range",  # non-equi self-join on nation (25 rows)
    "q_sim_knn",  # brute-force baseline vs a handful of probe vectors
}


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_projection_pruned(spark):
    """A 5-column projection must scan 5 columns, not all 11 (at 100 TB the
    difference is the whole I/O bill)."""
    p = plan_of(QUERIES["q_scan_project"](spark, SF_DIR))
    read = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert "l_quantity" in read
    for dropped in ("l_tax", "l_returnflag", "l_shipdate", "l_suppkey"):
        assert dropped not in read, f"unpruned column {dropped}: {read}"


def test_filter_pushdown_reaches_scan(spark):
    """Range predicates must appear in PushedFilters — filtering after the
    scan reads every row off disk first."""
    p = plan_of(QUERIES["q_filter_pred"](spark, SF_DIR))
    pushed = next(line for line in p.splitlines() if "PushedFilters" in line)
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity" in pushed


def test_star_join_broadcasts_dimensions(spark):
    """The Q5-shaped star must broadcast every dimension: a sort-merge join
    against region/nation/supplier would shuffle the fact table once per
    dimension."""
    p = plan_of(QUERIES["q_join_star"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_sort_limit_is_topk(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then merge), never a global sort of the full table."""
    p = plan_of(QUERIES["q_sort_limit"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p


def test_topk_per_group_no_global_sort(spark):
    """Grouped top-k must shuffle by the group key only — a range partition
    (global sort) would serialize the whole table through one ordering."""
    p = plan_of(QUERIES["q_topk_per_group"](spark, SF_DIR))
    assert "rangepartitioning" not in p.lower()
    assert "Window" in p


def test_groupby_does_partial_aggregation(spark):
    """groupBy must plan partial (map-side) + final aggregates; shipping raw
    rows to the reducer multiplies shuffle volume by fan-in."""
    p = plan_of(QUERIES["q_agg_groupby"](spark, SF_DIR))
    assert "partial_" in p, "no map-side partial aggregation in plan"


def test_minhash_banding_joins_on_buckets(spark):
    """The LSH near-dup join must be an equi-join on (band, bucket); a
    cartesian here means the banding failed and every doc meets every doc."""
    p = plan_of(QUERIES["q_dedup_near"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bucketed_join_has_no_shuffle(spark):
    """Joining two tables bucketed on the join key must not plan an Exchange
    before the sort-merge join — the bucket layout IS the shuffle, paid once
    at write time. Auto-broadcast is disabled for the probe: at test SF the
    tables are broadcast-sized, but the property under test is the one that
    matters when neither side fits in memory."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["q_join_bucketed"](spark, SF_DIR)
        jvm = df.sparkSession._jvm
        p = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in p
    assert p.count("Bucketed: true") == 2, "scans not reading bucket layout"
    # exactly ONE shuffle in the whole plan: the groupBy above the join
    assert p.count("Exchange") == 1, "join inputs re-shuffled despite buckets:\n" + p


@pytest.mark.parametrize(
    "name", sorted(set(get_oracles()) - CARTESIAN_OK)
)
def test_no_accidental_cartesian(name, spark):
    """Sweep every oracle query: no plan may contain a cartesian product
    unless the algorithm is explicitly all-pairs (whitelist above)."""
    p = plan_of(QUERIES[name](spark, SF_DIR))
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product"


def test_q18_semi_join_broadcasts_filter_list(spark):
    """Q18's big-order list must reach lineitem as a BROADCAST semi-join:
    the HAVING aggregate shrinks it to dimension size, and shuffling the
    full fact table against it instead would be the 100 TB mistake."""
    p = plan_of(QUERIES["q_tpch_q18"](spark, SF_DIR))
    assert "LeftSemi" in p
    semi_section = p[p.index("LeftSemi") :][:400]
    assert "Broadcast" in semi_section or "BroadcastExchange" in p


def test_q13_filter_stays_in_left_join(spark):
    """Q13's priority filter must act on the orders INPUT of the left join
    (join-time predicate). If it leaked above the join as a post-filter it
    would silently drop the zero-order customers the query exists to
    count."""
    p = plan_of(QUERIES["q_tpch_q13"](spark, SF_DIR))
    # the left outer join is present and no Filter node sits above it
    assert "LeftOuter" in p
    join_pos = p.index("LeftOuter")
    above = p[:join_pos]
    assert "1-URGENT" not in above.split("Filter")[0], (
        "priority predicate must not filter the join OUTPUT"
    )


def test_docs_pack_single_window_exchange(spark):
    """Sequence packing must be ONE hash exchange (the per-source window);
    a second exchange would mean the running sum re-shuffles what the
    window already partitioned. Count detail-section nodes, not raw
    substrings — formatted explain prints every node twice (tree +
    details)."""
    import re

    p = plan_of(QUERIES["q_docs_pack"](spark, SF_DIR))
    exchanges = re.findall(r"^\(\d+\) Exchange", p, re.M)
    assert len(exchanges) == 1, exchanges


def test_schema_evolution_read_adds_no_shuffle(spark):
    """The evolved-table read must stay a union of parallel scans with
    per-row casts — schema resolution is free at read time; any Exchange
    below the final aggregate would mean evolution added a shuffle."""
    import shutil

    from iceberg_insert_spark.sources.schema_evolution import EvolvingTable
    from pyspark.sql import types as T

    path = "/tmp/iceberg_insert_spark/evolve_plan_test"
    shutil.rmtree(path, ignore_errors=True)
    tbl = EvolvingTable(path)
    tbl.create(T.StructType([T.StructField("id", T.IntegerType())]))
    tbl.append(spark.range(10).select(F_col_int()))
    tbl.widen_column("id", T.LongType())
    tbl.append(spark.range(10, 20).select(F_col_long()))
    import re

    p = plan_of(tbl.read(spark))
    assert "Exchange" not in p
    scans = re.findall(r"^\(\d+\) Scan parquet", p, re.M)
    assert len(scans) == 2, scans  # one per schema version, parallel union


def F_col_int():
    from pyspark.sql import functions as F

    return F.col("id").cast("int").alias("id")


def F_col_long():
    from pyspark.sql import functions as F

    return F.col("id").alias("id")


def test_topk_ngrams_take_ordered(spark):
    """Corpus heavy-hitters must plan as partial+final HashAggregate feeding
    TakeOrderedAndProject — a global Sort of the gram table would
    materialize billions of rows to keep 25."""
    import re

    p = plan_of(QUERIES["q_text_topk_ngrams"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert len(re.findall(r"^\(\d+\) HashAggregate", p, re.M)) >= 2
    assert not re.search(r"^\(\d+\) Sort\b", p, re.M)


def test_boilerplate_membership_broadcasts(spark):
    """The boilerplate-gram membership probe must be a broadcast join (the
    heavy set is small by construction); a SortMergeJoin would shuffle the
    full gram stream a third time."""
    import re

    p = plan_of(QUERIES["q_text_boilerplate"](spark, SF_DIR))
    assert re.search(r"^\(\d+\) BroadcastHashJoin", p, re.M)
    assert not re.search(r"^\(\d+\) SortMergeJoin", p, re.M)


def test_split_hash_zero_shuffle(spark):
    """Hash-split assignment is a row-local projection: any Exchange in the
    plan means the engine is moving 100 TB to compute md5 prefixes."""
    import re

    p = plan_of(QUERIES["q_docs_split_hash"](spark, SF_DIR))
    assert not re.search(r"^\(\d+\) Exchange", p, re.M)


def test_tpch_q3_top10_and_pushdown(spark):
    """Q3's top-10 must plan as TakeOrderedAndProject and BOTH date
    predicates must reach their parquet scans — at 100 TB the date filters
    are most of the I/O savings and a global sort of per-order revenue
    would materialize every order to keep 10."""
    p = plan_of(QUERIES["q_tpch_q3"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("LessThan(o_orderdate" in ln for ln in pushed)
    assert any("GreaterThan(l_shipdate" in ln for ln in pushed)


def test_emb_centroids_single_tiny_exchange(spark):
    """The centroid mean must partial-aggregate BEFORE its one exchange:
    the explode multiplies rows x dim, and shuffling that stream raw
    instead of the O(labels x dim) partials would move the whole corpus
    x64."""
    import re

    p = plan_of(QUERIES["q_emb_centroids"](spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) HashAggregate", p, re.M)) >= 2
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1


def test_tpch_q10_pushdown_and_broadcast(spark):
    """Q10's selective predicates (quarter, returnflag) must reach their
    scans before the orderkey shuffle, nation must broadcast, and the top-20
    must be TakeOrderedAndProject."""
    import re

    p = plan_of(QUERIES["q_tpch_q10"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("EqualTo(l_returnflag,R)" in ln for ln in pushed)
    assert any("GreaterThanOrEqual(o_orderdate" in ln for ln in pushed)
    assert re.search(r"^\(\d+\) BroadcastHashJoin", p, re.M)


def test_pipeline_e2e_broadcasts_corpus_aggregates(spark):
    """The pipeline's three corpus-level small sets (doc count, boilerplate
    grams, eval grams) must broadcast — and the whole 6-stage chain must
    not plan a cartesian or more than one sort-merge join."""
    import re

    p = plan_of(QUERIES["q_pipeline_e2e"](spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", p, re.M)) >= 3
    assert len(re.findall(r"^\(\d+\) SortMergeJoin", p, re.M)) <= 1
    assert "CartesianProduct" not in p


def test_pipeline_e2e_no_global_sort(spark):
    """Every Sort in the pipeline must be partition-local (window/SMJ
    prep): a global sort at this point would range-shuffle the full
    surviving corpus. The pack/split windows partition by (source, split),
    so even they sort only within partitions. The single
    BroadcastNestedLoopJoin allowed is the 1-row corpus-count scalar
    attach; anything more means a small-set join fell off the broadcast
    path."""
    import re

    p = plan_of(QUERIES["q_pipeline_e2e"](spark, SF_DIR))
    # formatted-explain Sort arguments end with "<global>, 0" where
    # <global> is true/false
    globals_ = [
        m.group(1)
        for m in re.finditer(r"Arguments: \[[^\]]*\], (true|false), 0", p)
    ]
    assert globals_, "no Sort nodes parsed — plan shape changed?"
    assert "true" not in globals_, f"global sort appeared: {globals_}"
    assert len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, re.M)) <= 1


def test_tpch_q19_extracts_equi_key_from_disjunction(spark):
    """Q19's OR-of-ANDs must NOT degrade to a nested-loop join: the shared
    p_partkey = l_partkey conjunct is extractable from every disjunct, so
    the plan must be a hash join on partkey with the OR as a residual
    filter — at 100 TB a BroadcastNestedLoopJoin over lineitem x part is
    the difference between minutes and days."""
    p = plan_of(QUERIES["q_tpch_q19"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p


def test_tpch_q4_exists_becomes_semi_join(spark):
    """Q4's correlated EXISTS with the interval predicate must decorrelate
    to ONE semi join (no subquery re-execution per row) and the quarter
    range must reach the orders scan."""
    p = plan_of(QUERIES["q_tpch_q4"](spark, SF_DIR))
    assert "LeftSemi" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed)


def test_pca_gram_partial_aggregates_before_exchange(spark):
    """The PCA Gram pass must collapse to O(d^2) cells per partition
    BEFORE its exchange (map-side partials) — shuffling the exploded
    (i, j, xi*xj) stream raw would move corpus x d^2 rows. Asserted on the
    STATS frames (exposed by _pca_stat_frames; inside the query they are
    eagerly collected, so the returned projection plan cannot show them)."""
    import re

    from iceberg_insert_spark.llm.similarity import (
        _pca_stat_frames,
        q_emb_pca_project,
    )
    from iceberg_insert_spark.tables import load_table

    pairs, means = _pca_stat_frames(load_table(spark, SF_DIR, "embeddings"))
    for df in (pairs, means):
        p = plan_of(df)
        # partial HashAggregate below the one Exchange, final above it
        assert len(re.findall(r"^\(\d+\) HashAggregate", p, re.M)) >= 2, p
        assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1, p
    # the per-row projection plan is shuffle-free: one scan, no Exchange
    p = plan_of(q_emb_pca_project(spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 0


def test_tpch_q21_decorrelates_to_semi_and_anti(spark):
    """Q21's EXISTS/NOT-EXISTS pair must decorrelate to hash semi/anti
    joins on orderkey — a correlated per-row rewrite would be two O(n)
    probes per lineitem; the region-filtered supplier set must broadcast."""
    p = plan_of(QUERIES["q_tpch_q21"](spark, SF_DIR))
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_pareto_cumsum_has_no_global_window(spark):
    """The Pareto cumulative sum must run as per-partition windows over the
    range split plus an offset join — never a single-partition global
    window (the whole aggregate through one task at 100 TB)."""
    p = plan_of(QUERIES["q_lineitem_pareto"](spark, SF_DIR))
    assert "Window" in p
    assert "Exchange SinglePartition" not in p, (
        "global-sort window leaked into the Pareto cumsum:\n" + p
    )


def test_emb_outliers_broadcasts_centroids(spark):
    """Outlier scoring must broadcast the |labels|-row centroid arrays onto
    the corpus — re-shuffling the embedding table against a 10-row side
    would be the 100 TB mistake; the per-label rank window partitions by
    label (no single-partition exchange)."""
    p = plan_of(QUERIES["q_emb_outliers"](spark, SF_DIR))
    assert "BroadcastExchange" in p
    assert "Exchange SinglePartition" not in p


def test_events_transitions_single_event_scan(spark):
    """The transition matrix must scan events ONCE: the normalizer is a
    window over the |types|^2-row aggregate, never a join against a
    marginal that re-plans the scan+window subtree a second time."""
    p = plan_of(QUERIES["q_events_transitions"](spark, SF_DIR))
    # formatted mode mentions each physical node twice (tree + detail)
    assert p.count("Scan parquet") == 2, (
        "events scanned more than once:\n" + p
    )
    assert "Exchange SinglePartition" not in p


def test_tpch_q7_broadcasts_nation_filtered_supplier(spark):
    """Q7 must prefilter both nation copies to the two-nation set and
    broadcast the supplier side into the date-pruned lineitem scan before
    any shuffle; the date range must push to the scan."""
    p = plan_of(QUERIES["q_tpch_q7"](spark, SF_DIR))
    assert "BroadcastExchange" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), (
        "ship-date range did not reach the lineitem scan"
    )


def test_tpch_q9_broadcasts_dims_one_fact_scan(spark):
    """Q9's snowflake must broadcast every dimension side (name-filtered
    part keys, supplier, nation) and scan lineitem ONCE — a shuffled dim
    join or a second fact scan is the 100 TB regression. partsupp is a
    derived view of part (4 rows per key), never a shuffle source bigger
    than the fact."""
    p = plan_of(QUERIES["q_tpch_q9"](spark, SF_DIR))
    assert "BroadcastExchange" in p
    assert p.count("lineitem.parquet") <= 1
    assert "CartesianProduct" not in p


def test_tpch_q2_no_cartesian(spark):
    """Q2's correlated-MIN decorrelation must stay equi-keyed: the
    min-cost self-join runs on (p_partkey, cost), never as a cartesian
    re-scan per part. Since the cand materialization (the dim broadcasts
    now live inside the checkpointed subtree), the final plan is cand
    SMJ/SHJ mn — mn is per-part-sized, so a forced broadcast would be
    the 100 TB regression, not the fix."""
    p = plan_of(QUERIES["q_tpch_q2"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert any(
        j in p
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_tpch_q20_single_lineitem_scan(spark):
    """Q20's trap is re-scanning lineitem per supplier (the correlated
    spelling); the decorrelated plan aggregates the date-pruned fact once
    and joins partsupp against the 1-aggregate result."""
    p = plan_of(QUERIES["q_tpch_q20"](spark, SF_DIR))
    assert p.count("lineitem.parquet") <= 1
    assert "CartesianProduct" not in p


def test_iceberg_deletes_plan(spark):
    """The MoR read must apply equality deletes as a BROADCAST anti-join
    (delete keys are MBs at 100 TB, the fact is TBs) and reconstruct
    positions with a window PARTITIONED by file — a global row_number
    (single-partition exchange) would serialize the whole fact through
    one task."""
    p = plan_of(QUERIES["q_iceberg_deletes"](spark, SF_DIR))
    assert "BroadcastExchange" in p
    assert "LeftAnti" in p
    assert "Exchange SinglePartition" not in p


def test_multi_consumer_views_materialize_once(spark):
    """Subtrees feeding multiple consumers (Q15's revenue view, Q2's cand,
    incremental dedup's fingerprint store, basket rules' item set) must
    not recompile per consumer — AQE plans them independently (no
    ReusedExchange), so without materialization the fact gets scanned
    2-4x (round-5 scan audit). After the eager checkpoint the compiled
    plan references the fact at most once."""
    for name, fact, cap in [
        ("q_tpch_q15", "lineitem.parquet", 1),
        ("q_tpch_q2", "part.parquet", 1),
        ("q_tpch_q11", "supplier.parquet", 1),
        ("q_dedup_incremental", "documents.parquet", 1),
        ("q_basket_rules", "lineitem.parquet", 1),
        ("q_dedup_ngram", "documents.parquet", 1),
        ("q_text_bm25", "documents.parquet", 1),
        # tfidf keeps a second column-pruned count-only scan for N
        ("q_text_tfidf", "documents.parquet", 2),
        ("q_events_dau_mau", "events.parquet", 1),
        ("q_events_wau", "events.parquet", 1),
    ]:
        p = plan_of(QUERIES[name](spark, SF_DIR))
        assert p.count(fact) <= cap, f"{name} re-scans {fact}:\n{p}"


def test_threshold_sweep_parallel_bounded_pairs(spark):
    """The calibration sweep's B^2 frame must be a broadcast NLJ over
    the bounded sample with the STREAMED side spread across partitions
    (a single-file read otherwise runs the whole frame in one task),
    and the threshold explode joined as a broadcast — no shuffle of the
    pair frame."""
    p = plan_of(QUERIES["q_dedup_threshold_sweep"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    # streamed-side spread: the round-robin repartition exchange
    assert "RoundRobinPartitioning" in p


def test_quality_constraints_broadcast_fk_check(spark):
    """The FK membership check must be a BROADCAST anti-join (the
    customer key set is dimension-sized) — a shuffled anti-join would
    exchange the full batch per constraint — and the dirty batch must
    not recompile per check (it is checkpointed once)."""
    p = plan_of(QUERIES["q_quality_constraints"](spark, SF_DIR))
    assert "LeftAnti" in p
    anti = p[p.index("LeftAnti"):][:400]
    assert "Broadcast" in anti or "BroadcastExchange" in p
    assert p.count("orders.parquet") == 0  # all consumers read the checkpoint


def test_snapshot_mor_read_broadcasts_delete_keys(spark, tmp_path):
    """The merge-on-read scan must be ONE broadcast hash anti-join of
    the (dimension-sized) delete keys against the data — never a
    sort-merge join or a cartesian: at 100 TB the delete keys are MBs
    while the fact is TBs, and this plan touches the fact once with
    zero added fact shuffles."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "morplan"))
    tbl.append(spark.range(100).selectExpr("id AS k"))
    chg = spark.createDataFrame([(int(i), "D") for i in range(0, 100, 7)],
                                "k long, _op string")
    tbl.merge(spark, chg, key="k")
    p = plan_of(tbl.read(spark))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_partition_pruned_read_plans_fewer_files(spark, tmp_path):
    """Manifest partition pruning is DRIVER-side metadata: the scan the
    cluster sees contains only the matching partition's files (no data
    IO decides this), and the residual filter stays in the scan
    stage."""
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "ppplan"), partition_by=["cat"])
    tbl.append(spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)],
        "k long, cat string"))
    kept, total = tbl.plan_files(partitions={"cat": "a"})
    assert 0 < len(kept) < total
    p = plan_of(tbl.read(spark, partitions={"cat": "a"}))
    # exactly one scan over the pruned file list; no join/shuffle at all
    assert "Exchange" not in p
    assert "Scan parquet" in p


def test_view_read_pushes_filters_into_table_scans(spark, tmp_path):
    """A catalog view is metadata: a filter written OVER the view must
    reach the underlying parquet scan's PushedFilters, and the
    projection must prune ReadSchema — exactly as if the SQL were
    inlined (at 100 TB the view abstraction may cost zero I/O)."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.orders")
    t.append(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        )
    )
    cat.create_view(
        "db.v",
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM {{db.orders}}",
    )
    df = (
        cat.read_view(spark, "db.v")
        .filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_totalprice")
    )
    p = plan_of(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "LessThan(o_orderkey,100)" in pushed[0]
    read = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "o_totalprice" in read
    assert "o_orderpriority" not in read and "o_orderstatus" not in read


def test_catalog_sql_pushes_filters_through_nested_views(spark, tmp_path):
    """cat.sql(): a WHERE written in the outer statement must reach the
    parquet scan through TWO inlined view layers, and the projection
    must prune ReadSchema — the whole statement is one Catalyst tree
    (at 100 TB the SQL front-end costs nothing over inline plans)."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path))
    cat.create_namespace("db")
    t = cat.create_table("db.orders")
    t.append(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        )
    )
    cat.create_view(
        "db.base",
        "SELECT o_orderkey, o_orderstatus, o_totalprice "
        "FROM {{db.orders}}",
    )
    cat.create_view(
        "db.pair",
        "SELECT o_orderkey, o_totalprice FROM {{db.base}}",
    )
    df = cat.sql(
        spark,
        "SELECT o_orderkey, o_totalprice FROM {{db.pair}} "
        "WHERE o_orderkey < 100",
    )
    p = plan_of(df)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and "LessThan(o_orderkey,100)" in pushed[0]
    read = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "o_totalprice" in read
    assert "o_orderpriority" not in read and "o_orderstatus" not in read


def test_era_resolution_keeps_single_stage_scans(spark, tmp_path):
    """Rename resolution is row expressions fused into each era's scan:
    the read plan of a 2-era table must contain NO Exchange (shuffle) —
    the union of projected scans is a metadata concat."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "era"))
    t.append(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
    )
    t.rename_column("o_totalprice", "price")
    t.append(
        spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", F.col("o_totalprice").alias("price")
        )
    )
    p = plan_of(t.read(spark))
    assert "Exchange" not in p
    assert "Union" in p


def test_events_pattern_single_window_exchange(spark):
    """The lead-chain pattern match is ONE user_id shuffle for the window
    plus the final partial-aggregated groupBy on the SAME key — Catalyst
    must reuse the window's partitioning, so exactly one Exchange."""
    import re

    p = plan_of(QUERIES["q_events_pattern"](spark, SF_DIR))
    exchanges = re.findall(r"^\(\d+\) Exchange", p, re.M)
    assert len(exchanges) == 1, exchanges


def test_events_ohlc_partial_aggregation(spark):
    """OHLC bars: partial hash aggregate before the single group-key
    exchange (map-side combine turns the raw stream into bars before
    any shuffle bytes move)."""
    import re

    p = plan_of(QUERIES["q_events_ohlc"](spark, SF_DIR))
    exchanges = re.findall(r"^\(\d+\) Exchange", p, re.M)
    assert len(exchanges) == 1, exchanges
    assert "partial" in p.lower()


def test_ts_cusum_single_sort_two_windows(spark):
    """CUSUM = running sum + running min over the SAME (event_type, d)
    sort: Catalyst must fuse both window functions into one partitioning
    — one Exchange for the window stage plus the two tiny aggregates'
    exchanges, and exactly one Sort."""
    import re

    p = plan_of(QUERIES["q_ts_cusum"](spark, SF_DIR))
    sorts = re.findall(r"^\(\d+\) Sort", p, re.M)
    assert len(sorts) == 1, sorts


def test_orders_gini_single_exchange(spark):
    """The Gini rank formula is one window + a groupBy on the SAME key:
    Catalyst must reuse the window's hash partitioning — exactly one
    Exchange in the plan."""
    import re

    p = plan_of(QUERIES["q_orders_gini"](spark, SF_DIR))
    exchanges = re.findall(r"^\(\d+\) Exchange", p, re.M)
    assert len(exchanges) == 1, exchanges


def test_join_advisor_broadcast_pin_and_salt_advice(spark, tmp_path):
    """advise_join's decisions, pinned against real plans and inputs:
    (a) a small dimension is advised broadcast and the executed plan
    contains BroadcastHashJoin with NO shuffle of the fact side's join
    key; (b) two above-threshold sides advise shuffle, and a low-NDV
    key on the big side (rows/NDV > 1000) raises the salt flag while a
    high-NDV key does not; every cost input resolves from metadata on
    maintained tables."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.operators.cost import (
        advise_join,
        apply_advice,
    )
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    fact = SnapshotTable(
        str(tmp_path / "fact"),
        stats_cols=["k"],
        ndv_cols=["k", "hot"],
    )
    dim = SnapshotTable(
        str(tmp_path / "dim"), stats_cols=["k"], ndv_cols=["k"]
    )
    n = 200_000
    fact.append(
        spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("hot"),  # 3 distinct: skew proxy
            F.lit("x" * 32).alias("pad"),
        )
    )
    dim.append(
        spark.range(500).select(
            F.col("id").alias("k"), F.lit("d").alias("attr")
        )
    )
    adv = advise_join(spark, fact, dim, "k", full=True)
    assert adv["strategy"] == "broadcast_right"
    assert adv["left"]["rows_meta"] and adv["right"]["rows_meta"]
    assert adv["left"]["ndv_meta"] and adv["right"]["ndv_meta"]
    assert abs(adv["left"]["ndv"] - n) <= 0.05 * n
    joined = apply_advice(
        fact.read(spark),
        dim.read(spark).withColumnRenamed("k", "dk"),
        F.col("k") == F.col("dk"),
        adv,
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # (b) force the shuffle regime with a tiny threshold: high-NDV key
    # -> no salt; low-NDV key -> salt advised
    adv2 = advise_join(spark, fact, fact, "k", broadcast_bytes=1)
    assert adv2["strategy"] == "shuffle" and adv2["salt_advice"] is False
    adv3 = advise_join(
        spark, fact, fact, "hot", broadcast_bytes=1
    )
    assert adv3["strategy"] == "shuffle" and adv3["salt_advice"] is True


def test_policy_filter_reaches_parquet_scan(spark, tmp_path):
    """The governance claim 'a policy filter on a stats column still
    pushes to the scan': the catalog-applied row filter must appear in
    the parquet scan's PushedFilters exactly like an inline WHERE — a
    policy that materialized-then-filtered would read every byte of a
    100 TB table to hide half of it."""
    from iceberg_insert_spark.sources.catalog import LocalCatalog

    cat = LocalCatalog(str(tmp_path / "cat"))
    cat.create_namespace("gov")
    cat.create_table("gov.t", stats_cols=["k"]).append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, v double"
        ).coalesce(1)
    )
    cat.set_row_filter("gov.t", "k > 90")
    p = plan_of(cat.sql(spark, "SELECT v FROM {{gov.t}}"))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and any(
        "GreaterThan(k,90" in ln for ln in pushed
    ), p
    # column masks keep pruning intact: selecting one unmasked column
    # must not widen the scan to the masked ones it doesn't reference
    cat.set_column_mask("gov.t", "v", "v * 0.0")
    p = plan_of(cat.sql(spark, "SELECT k FROM {{gov.t}}"))
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert rs and all("v:double" not in ln for ln in rs), p


def test_cdc_index_read_prunes_cells_and_broadcasts_delete_keys(
    spark, tmp_path
):
    """The r10 CDC-refresh read-path claim, pinned mechanically (the
    PLANS.md snapshot's assertions): after a CDC refresh the probed-
    cell read must (a) push the cell IN-list to the parquet scan,
    (b) resolve the equality-delete debt as a BROADCAST LeftAnti —
    churn-sized keys, never a shuffle of the code table."""
    from pyspark.sql import functions as F

    from iceberg_insert_spark.llm import vecindex as V
    from iceberg_insert_spark.sources.snapshots import SnapshotTable

    import numpy as np

    rng = np.random.RandomState(5)
    src = SnapshotTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [
                (i, 0, [float(x) for x in rng.randn(16)])
                for i in range(200)
            ],
            "vec_id long, label int, embedding array<double>",
        )
    )
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    src.merge(
        spark,
        src.read(spark)
        .filter(F.col("vec_id") < 20)
        .select(
            "vec_id", "label", "embedding", F.lit("D").alias("_op")
        ),
        key="vec_id",
    )
    V.refresh_vector_index_cdc(spark, src, path)
    idx = V._index_handle(path)
    p = plan_of(idx.read(spark, isin=("cell", [0, 1, 2, 3])))
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("In(cell" in ln for ln in pushed), p
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "SortMergeJoin" not in p, p
