"""Corpus-quality operators for LLM training-data pipelines (SURVEY.md §2.5).

Quality filtering is the first stage of every production training-data
pipeline; the reference has no analogue (its 686 LoC are ingest-only,
App.java:51-158) — these are BASELINE.json:6 [EXT] mandate rows.

Design rules shared by this module:

* **Fixed-point integer math everywhere an oracle exists.** Ratios are
  emitted as ``*_ppm`` (parts-per-million) / ``*_milli`` BIGINTs computed
  with integer division, never doubles — the result is bit-identical across
  engines and partition orders (same rationale as ``tables.exact_sum``).
  All numerators here are non-negative, so Spark's truncating ``div`` and
  DuckDB's flooring ``//`` agree (the advisor's floor-vs-trunc divergence
  only exists for negative operands).
* **Pure JVM column expressions** (split / higher-order array functions) —
  zero Python row UDFs, so the per-doc signals stay inside whole-stage
  codegen and scale linearly. The one exception is the compression-ratio
  signal, which genuinely needs zlib: it is the repo's canonical
  "Python-unavoidable → Arrow-batched pandas_udf" case and is rows-only.

100 TB posture: every per-doc query here is embarrassingly parallel (no
shuffle at all); the corpus-level ones shuffle once on a low-cardinality
key (token / source) with map-side partial aggregation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .text import STOPWORDS

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# Gopher-style rule thresholds (Rae et al. 2021 §A1.1 shape, re-parameterized
# for the fixture corpus: token-soup docs are 20..120 words, all-lowercase).
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN_MILLI = 3_000   # mean word length >= 3.0 chars
GOPHER_MAX_MEAN_WLEN_MILLI = 10_000  # mean word length <= 10.0 chars
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_PPM = 800_000       # >= 80% of words purely [a-z]


@query(
    "q_text_gopher_rules",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), sig AS (
        SELECT doc_id,
               LEN(w) AS n_words,
               CAST(LIST_SUM(LIST_TRANSFORM(w, x -> STRLEN(x))) AS BIGINT)
                   AS sum_wlen,
               LEN(LIST_FILTER(w, x -> x IN {_SW_SQL})) AS n_stop,
               LEN(LIST_FILTER(w, x -> REGEXP_MATCHES(x, '^[a-z]+$')))
                   AS n_alpha
        FROM t
    )
    SELECT doc_id, n_words,
           CAST(sum_wlen * 1000 // n_words AS BIGINT) AS mean_wlen_milli,
           n_stop,
           CAST(n_alpha * 1000000 // n_words AS BIGINT) AS alpha_ppm,
           CAST(CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS}
                                      AND {GOPHER_MAX_WORDS}
                      AND sum_wlen * 1000 // n_words
                          BETWEEN {GOPHER_MIN_MEAN_WLEN_MILLI}
                              AND {GOPHER_MAX_MEAN_WLEN_MILLI}
                      AND n_stop >= {GOPHER_MIN_STOPWORDS}
                      AND n_alpha * 1000000 // n_words
                          >= {GOPHER_MIN_ALPHA_PPM}
                THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM sig
    """,
)
def q_text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery: word count, mean word length,
    stopword presence, alphabetic-word fraction, and the combined pass flag.

    One narrow projection per document — no shuffle, no UDF; the rule
    signals are higher-order array expressions inside codegen. The fixture
    corpus has no symbols/uppercase, so the alpha rule is exercised but
    near-saturated; thresholds are module constants so a deployment can
    re-tune without touching the plan shape.
    """
    d = load_table(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("w"),
    ).select(
        "doc_id",
        F.expr("size(w)").cast("long").alias("n_words"),
        F.expr(
            "aggregate(transform(w, x -> length(x)), 0L, (a, x) -> a + x)"
        ).alias("sum_wlen"),
        F.expr(
            f"size(filter(w, x -> x in {_SW_SQL}))"
        ).cast("long").alias("n_stop"),
        F.expr(
            "size(filter(w, x -> x rlike '^[a-z]+$'))"
        ).cast("long").alias("n_alpha"),
    )
    mean_milli = F.expr("sum_wlen * 1000 div n_words")
    alpha_ppm = F.expr("n_alpha * 1000000 div n_words")
    passes = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_milli.between(
            GOPHER_MIN_MEAN_WLEN_MILLI, GOPHER_MAX_MEAN_WLEN_MILLI
        )
        & (F.col("n_stop") >= GOPHER_MIN_STOPWORDS)
        & (alpha_ppm >= GOPHER_MIN_ALPHA_PPM)
    )
    return sig.select(
        "doc_id",
        "n_words",
        mean_milli.alias("mean_wlen_milli"),
        "n_stop",
        alpha_ppm.alias("alpha_ppm"),
        passes.cast("long").alias("passes"),
    )


@query(
    "q_text_vocab_growth",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    first AS (
        SELECT token, MIN(doc_id) AS first_doc
        FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
              FROM documents)
        GROUP BY token
    ), dec AS (
        SELECT CAST(first_doc * 10 // n_docs AS BIGINT) AS decile,
               COUNT(*) AS new_tokens
        FROM first, n
        GROUP BY 1
    )
    SELECT decile, new_tokens,
           CAST(SUM(new_tokens) OVER (ORDER BY decile) AS BIGINT)
               AS cum_vocab
    FROM dec
    """,
)
def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: new and cumulative distinct tokens
    per corpus decile (doc_id order — the fixture ids are 0..N-1).

    One token shuffle (min-groupBy with map-side partials); the cumulative
    window runs over the ≤10-row decile aggregate, not the corpus, so the
    unpartitioned window is O(1) regardless of scale. A flattening curve is
    the standard "corpus is saturating / new data is redundant" signal when
    deciding whether more crawl is worth ingesting.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    first = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    dec = (
        first.crossJoin(F.broadcast(n_docs))
        .select(F.expr("first_doc * 10 div n_docs").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dec.select(
        "decile",
        "new_tokens",
        F.sum("new_tokens").over(w).alias("cum_vocab"),
    )


@query(
    "q_docs_mixture_weights",
    oracle="""
    WITH s AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
                   AS src_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
               COUNT(*) AS n_sources
        FROM s
    )
    SELECT source, n_docs, src_tokens,
           CAST(CAST(src_tokens AS HUGEINT) * 1000000 // total_tokens
                AS BIGINT) AS share_ppm,
           CAST(CAST(total_tokens AS HUGEINT) * 1000000
                // (n_sources * src_tokens) AS BIGINT) AS weight_ppm
    FROM s, tot
    """,
)
def q_docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: per-source token share and the sampling weight
    that rebalances the corpus to a uniform target mixture
    (weight = target_share / actual_share, in ppm fixed point).

    This is the "data mixing" step of training-set assembly (e.g. The Pile /
    Dolma recipes): the pipeline samples source s with relative weight
    weight_ppm to hit the target blend. One shuffle on source with map-side
    partials; the share/weight arithmetic runs over the |sources|-row
    aggregate via an unpartitioned window — O(|sources|), not O(corpus).
    A non-uniform target is a broadcast-map swap, same plan shape.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    s = (
        d.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("src_tokens"),
        )
    )
    w = Window.partitionBy()
    s = s.select(
        "source",
        "n_docs",
        "src_tokens",
        F.sum("src_tokens").over(w).alias("total_tokens"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    )
    # ppm numerators widen to DECIMAL(38,0) BEFORE the x1e6 multiply: a
    # ~2e13-token corpus (the 100 TB posture) would overflow BIGINT at
    # token_count * 1_000_000 (> 2^63) — same widening rule as exact_sum's
    # scale>=4 path; `div` on decimals is still exact integral division.
    # The DuckDB twin widens via HUGEINT (an intermediate only — the final
    # CAST keeps the output BIGINT, clear of the pandas-fetch type trap).
    return s.select(
        "source",
        "n_docs",
        "src_tokens",
        F.expr(
            "CAST(src_tokens AS DECIMAL(38,0)) * 1000000"
            " div total_tokens"
        ).alias("share_ppm"),
        F.expr(
            "CAST(total_tokens AS DECIMAL(38,0)) * 1000000"
            " div (n_sources * src_tokens)"
        ).alias("weight_ppm"),
    )


@query("q_text_compression")
def q_text_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: deflate(text) size / raw size, in
    ppm. Highly repetitive (low-information) documents compress far below
    the corpus norm; the flag marks docs under 40% of raw size.

    zlib has no JVM-expression equivalent, so this is the repo's canonical
    Arrow-batched ``pandas_udf`` — one Python round-trip per ~10k-row batch,
    never per row. No shuffle; rows-only (no SQL engine can mirror zlib).
    Determinism: zlib level is pinned (6) and the output is an integer ppm,
    so repeated runs are bit-identical (property-tested).
    """
    @F.pandas_udf("long")
    def comp_ppm(texts: pd.Series) -> pd.Series:
        import zlib

        def ratio(t: str) -> int:
            raw = t.encode("utf-8")
            if not raw:
                return 1_000_000
            return len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)

        return texts.map(ratio)

    d = load_table(spark, sf_dir, "documents")
    out = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        comp_ppm("text").alias("comp_ppm"),
    )
    return out.withColumn(
        "low_info", (F.col("comp_ppm") < 400_000).cast("long")
    )


def _curation_oracle() -> str:
    # compose the three stage oracles verbatim — the composed query must be
    # exactly the composition of the already-verified parts
    from ..registry import _ORACLES

    return f"""
    WITH g AS ({_ORACLES["q_text_gopher_rules"]}),
         s AS ({_ORACLES["q_text_span_dedup"]}),
         m AS ({_ORACLES["q_docs_mixture_weights"]})
    SELECT d.doc_id,
           CAST(CASE WHEN g.passes = 1 AND s.retained_ppm >= 600000
                THEN 1 ELSE 0 END AS BIGINT) AS keep,
           g.passes, s.retained_ppm, m.weight_ppm
    FROM documents d
    JOIN g ON d.doc_id = g.doc_id
    JOIN s ON d.doc_id = s.doc_id
    JOIN m ON d.source = m.source
    """


@query("q_pipeline_curation", oracle=_curation_oracle())
def q_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 composed pipeline: the per-doc curation decision that joins
    this module's stages in ONE Catalyst plan — Gopher rule gate x
    span-dedup retention x source mixture weight -> (keep, weight).

    keep = passes_gopher AND retained_span_fraction >= 60% (a doc that is
    mostly cross-corpus duplicate spans is dropped even if well-formed);
    weight_ppm is the source's uniform-target resampling weight. The
    oracle is built by textual composition of the three stage oracles, so
    the composed result is verified against exactly the parts already
    proven — same methodology as q_pipeline_e2e.

    Plan shape: the gopher signals are shuffle-free projections, span
    retention adds its one span shuffle, the mixture weight is a
    |sources|-row broadcast join — composing the stages adds joins on
    doc_id (co-partitioned by the shuffle the span stage already did) and
    nothing else.
    """
    d = load_table(spark, sf_dir, "documents")
    from .text import q_text_span_dedup

    gopher = q_text_gopher_rules(spark, sf_dir).select("doc_id", "passes")
    spans = q_text_span_dedup(spark, sf_dir).select("doc_id", "retained_ppm")
    mix = q_docs_mixture_weights(spark, sf_dir).select("source", "weight_ppm")
    keep = (
        (F.col("passes") == 1) & (F.col("retained_ppm") >= 600_000)
    ).cast("bigint")
    return (
        d.select("doc_id", "source")
        .join(gopher, "doc_id")
        .join(spans, "doc_id")
        .join(F.broadcast(mix), "source")
        .select(
            "doc_id",
            keep.alias("keep"),
            "passes",
            "retained_ppm",
            "weight_ppm",
        )
    )


# Repetition-gate thresholds (Rae et al. 2021 §A1.1's repetition
# signals, re-parameterized for the fixture's short token-soup docs:
# Gopher gates top-2gram char share at 20% and duplicate-5gram at 15%
# over web documents; at 20-120 words the equivalent discrimination
# lands at 12% top-bigram / 5% duplicate-trigram occurrence share).
REP_MAX_TOP_BIGRAM_PPM = 120_000
REP_MAX_DUP_TRIGRAM_PPM = 50_000


@query(
    "q_text_repetition_gates",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), sig AS (
        SELECT doc_id,
               LEN(w) AS n_words,
               LEN(LIST_DISTINCT(w)) AS nd_words,
               LIST_TRANSFORM(LIST_ZIP(w[:-2], w[2:]),
                              s -> s[1] || ' ' || s[2]) AS bg,
               LIST_TRANSFORM(LIST_ZIP(w[:-3], w[2:-2], w[3:]),
                              s -> s[1] || ' ' || s[2] || ' ' || s[3])
                   AS tg
        FROM t
    ), agg AS (
        SELECT doc_id,
               CAST((n_words - nd_words) * 1000000 // n_words
                    AS BIGINT) AS dup_word_ppm,
               CAST((SELECT MAX(c) FROM (
                        SELECT COUNT(*) AS c
                        FROM UNNEST(sig.bg) AS u(g) GROUP BY g))
                    * 1000000 // LEN(bg) AS BIGINT) AS top_bigram_ppm,
               CAST((LEN(tg) - LEN(LIST_DISTINCT(tg))) * 1000000
                    // LEN(tg) AS BIGINT) AS dup_trigram_ppm
        FROM sig
    )
    SELECT doc_id, dup_word_ppm, top_bigram_ppm, dup_trigram_ppm,
           CAST(CASE WHEN top_bigram_ppm > {REP_MAX_TOP_BIGRAM_PPM}
                       OR dup_trigram_ppm > {REP_MAX_DUP_TRIGRAM_PPM}
                     THEN 1 ELSE 0 END AS BIGINT) AS repetitive
    FROM agg
    """,
)
def q_text_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's REPETITION gates (Rae et al. 2021 §A1.1 — the signals
    beside the length/stopword rules of q_text_gopher_rules, and the
    MODE-count complement to q_text_repetition's duplicate-bigram
    ratio):
    per doc, the duplicate-word share, the occurrence share of the MOST
    FREQUENT word bigram, and the duplicate-trigram share, each an
    exact ppm BIGINT, plus the gate verdict. Catches the
    machine-generated/boilerplate failure mode quality scores built on
    length and vocabulary miss: a document can look healthy on every
    Gopher rule while being one sentence repeated forty times. The
    top-bigram gate composes AFTER the length floor (gopher_rules'
    30-word minimum), exactly as in Gopher — a very short document
    trivially concentrates its bigram mass.
    (Gopher's line/paragraph variants don't apply — the fixture is
    single-line; the n-gram forms are the corpus-agnostic core.)

    Exactness: counts are integers, shares are one integer
    cross-multiplication with ``div``/``//`` (non-negative, so
    truncation and flooring agree) — hash-identical cross-engine.

    Scale shape: ZERO shuffle. The top-bigram count — the one signal
    that usually drags in an explode + groupBy + max (two exchanges on
    a blown-up gram table) — is computed ROW-LOCALLY as the longest
    run in the SORTED bigram array via one ``aggregate`` fold, all
    inside whole-stage codegen; at 100 TB every signal is a projection
    over the documents scan. The oracle computes the same number the
    readable way (unnest + group + max) — semantics, not plan, are
    what's compared."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("w"))
    sig = t.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("nd_words"),
        F.expr(
            "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w)-1),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i+1)))"
            " ELSE array() END"
        ).alias("bg"),
        F.expr(
            "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w)-2),"
            " i -> concat(element_at(w, i), ' ', element_at(w, i+1), ' ',"
            " element_at(w, i+2))) ELSE array() END"
        ).alias("tg"),
    )
    # longest run in the sorted array == max occurrence count of any
    # bigram — the row-local spelling of the mode count (no explode)
    top_bg = F.expr(
        "aggregate(array_sort(bg),"
        " named_struct('prev', CAST(NULL AS STRING), 'run', 0L,"
        "              'best', 0L),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(x <=> acc.prev, acc.run + 1L, 1L),"
        "   'best', GREATEST(acc.best,"
        "                    IF(x <=> acc.prev, acc.run + 1L, 1L))),"
        " acc -> acc.best)"
    )
    out = sig.select(
        "doc_id",
        F.expr("(n_words - nd_words) * 1000000 div n_words").alias(
            "dup_word_ppm"
        ),
        top_bg.alias("_top"),
        F.size("bg").alias("_nbg"),
        F.expr(
            "(size(tg) - size(array_distinct(tg))) * 1000000"
            " div size(tg)"
        ).alias("dup_trigram_ppm"),
    ).select(
        "doc_id",
        "dup_word_ppm",
        F.expr("_top * 1000000 div _nbg").alias("top_bigram_ppm"),
        "dup_trigram_ppm",
    )
    return out.select(
        "doc_id",
        "dup_word_ppm",
        "top_bigram_ppm",
        "dup_trigram_ppm",
        # coalesce: a <2-word doc has NULL shares (0 bigrams) on both
        # engines, but the 0/1 gate must be 0 like the oracle's CASE,
        # not NULL (review catch — latent until a short doc appears)
        F.coalesce(
            (
                (F.col("top_bigram_ppm") > REP_MAX_TOP_BIGRAM_PPM)
                | (F.col("dup_trigram_ppm") > REP_MAX_DUP_TRIGRAM_PPM)
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("repetitive"),
    )
