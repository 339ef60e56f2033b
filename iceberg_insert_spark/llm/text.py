"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §2.5).

All pure JVM column expressions (split/explode/regexp/md5) — no Python UDFs —
so they stay inside whole-stage codegen and scale linearly with data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# Stopword set used by quality scoring and the language-ID heuristic. The
# fixture corpus is a token soup over a shared vocabulary; any real deployment
# would swap in per-language lists.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")

_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@query(
    "q_text_tokens",
    oracle="""
    SELECT token, COUNT(*) AS tf
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global term frequency: tokenize + explode + count (shuffle on token)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "q_text_lang_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def q_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id, n_tokens, avg_tok_len, stop_ratio,
           -- weighted sum of 4dp/2dp-rounded terms => exact <=6-decimal result,
           -- so HALF_UP (Spark) and scaled-multiply (DuckDB) rounding agree
           ROUND(0.5 * ROUND(stop_ratio, 4) + 0.3 * LEAST(avg_tok_len / 10.0, 1.0)
                 + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
    FROM (
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               ROUND(CAST(LENGTH(text) - LEN(toks) + 1 AS DOUBLE)
                     / LEN(toks), 4) AS avg_tok_len,
               ROUND(CAST(LEN(LIST_FILTER(toks, t -> t IN {_SW_SQL})) AS DOUBLE)
                     / LEN(toks), 6) AS stop_ratio
        FROM (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS toks FROM documents)
    )
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: token count, mean token length, stopword
    ratio, combined score — the standard cheap pre-filter before expensive
    model-based quality classifiers."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    # filter() (not array_intersect, which dedups) so every occurrence counts
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    base = d.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(
            (F.length("text") - n_tokens + 1).cast("double") / n_tokens, 4
        ).alias("avg_tok_len"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stop_ratio"),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "avg_tok_len",
        "stop_ratio",
        F.round(
            0.5 * F.round(F.col("stop_ratio"), 4)
            + 0.3 * F.least(F.col("avg_tok_len") / 10.0, F.lit(1.0))
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
            6,
        ).alias("quality_score"),
    )


@query(
    "q_text_langid",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'other' END AS lang_pred,
           stop_ratio
    FROM (
        SELECT doc_id, lang,
               ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                          t -> t IN {_SW_SQL})) AS DOUBLE)
                     / LEN(STRING_SPLIT(text, ' ')), 6) AS stop_ratio
        FROM documents
    )
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit ratio thresholding. (A real n-gram
    profile model drops in behind the same shape: per-doc score -> argmax.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ratio = F.round(
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / F.size(toks),
        6,
    )
    return d.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, "en").otherwise("other").alias("lang_pred"),
        ratio.alias("stop_ratio"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))),
                               ' ')) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set — the cheap canonical-form fingerprint used for shuffle-free
    exact-ish dedup across snapshots."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("fingerprint"),
    )


@query(
    "q_text_tokencount",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens
    FROM documents
    """,
)
def q_text_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex pass."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).cast(
            "bigint"
        ).alias("re_tokens"),
    )


@query(
    "q_text_editdist",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(LEVENSHTEIN(SUBSTRING(a.text, 1, 60),
                            SUBSTRING(b.text, 1, 60)) AS BIGINT) AS edit_dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def q_text_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between adjacent docs' 60-char prefixes.

    Edit distance is O(len^2) per pair — at scale it is strictly a RE-SCORING
    primitive applied to candidate pairs from the cheap tiers (fingerprint /
    MinHash / SimHash), never to a raw cross product; the adjacent-id pairing
    here stands in for that pruned candidate set."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 60).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 60).alias("tb"),
    )
    return (
        a.join(b, b.doc_b == a.doc_a + 1)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "q_text_pii",
    oracle=r"""
    SELECT doc_id,
           REGEXP_REPLACE(
             REGEXP_REPLACE(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                            '<EMAIL>', 'g'),
             '\+?[0-9][0-9-]{4,}', '<PHONE>', 'g') AS masked
    FROM (
        SELECT doc_id,
               text || ' contact: user' || doc_id ||
               '@example.com +1-555-01' || doc_id AS raw
        FROM documents
    )
    """,
)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex masking of emails and phone numbers — the
    standard redaction pass before training-set export. Pure JVM regex
    (single scan, no shuffle); the fixture text carries no PII, so the
    patterns are synthesized per doc and must all be caught."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id"),
        F.lit("@example.com +1-555-01"),
        F.col("doc_id"),
    )
    masked = F.regexp_replace(
        F.regexp_replace(raw, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
        r"\+?[0-9][0-9-]{4,}",
        "<PHONE>",
    )
    return d.select("doc_id", masked.alias("masked"))


TRAINSET_MIN_SCORE = 0.3
TRAINSET_MIN_TOKENS = 10
TRAINSET_MAX_TOKENS = 1000


@query(
    "q_docs_trainset",
    oracle=f"""
    WITH survivors AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ), q AS (
        SELECT doc_id, n_tokens,
               ROUND(0.5 * ROUND(stop_ratio, 4)
                     + 0.3 * LEAST(avg_tok_len / 10.0, 1.0)
                     + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
        FROM (
            SELECT doc_id,
                   CAST(LEN(toks) AS BIGINT) AS n_tokens,
                   ROUND(CAST(LENGTH(text) - LEN(toks) + 1 AS DOUBLE)
                         / LEN(toks), 4) AS avg_tok_len,
                   ROUND(CAST(LEN(LIST_FILTER(toks, t -> t IN {_SW_SQL}))
                              AS DOUBLE) / LEN(toks), 6) AS stop_ratio
            FROM (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS toks
                  FROM documents)
        )
    )
    SELECT d.doc_id, d.lang, q.n_tokens, q.quality_score
    FROM documents d
    JOIN survivors s ON s.doc_id = d.doc_id
    JOIN q ON q.doc_id = d.doc_id
    WHERE q.quality_score >= {TRAINSET_MIN_SCORE}
      AND q.n_tokens BETWEEN {TRAINSET_MIN_TOKENS} AND {TRAINSET_MAX_TOKENS}
    """,
)
def q_docs_trainset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set selection: exact-dedup survivors that pass the
    quality score and token-length gates — the composition a real pipeline
    exports. Each stage is one of the already-verified operators; the join
    keys are doc_id (broadcast-sized after dedup at validation scale,
    shuffle-on-key at 100 TB)."""
    d = load_table(spark, sf_dir, "documents")
    survivors = d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    q = q_text_quality(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    return (
        d.join(survivors, "doc_id")
        .join(q, "doc_id")
        .filter(
            (F.col("quality_score") >= TRAINSET_MIN_SCORE)
            & F.col("n_tokens").between(
                TRAINSET_MIN_TOKENS, TRAINSET_MAX_TOKENS
            )
        )
        .select("doc_id", "lang", "n_tokens", "quality_score")
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@query(
    "q_text_chunks",
    oracle=f"""
    SELECT doc_id,
           CAST(c - 1 AS BIGINT) AS chunk_no,
           ARRAY_TO_STRING(t[(c - 1) * {CHUNK_STRIDE} + 1 :
                             (c - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
               AS chunk_text,
           CAST(LEAST({CHUNK_TOKENS},
                      LEN(t) - (c - 1) * {CHUNK_STRIDE}) AS BIGINT)
               AS n_tokens
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
         UNNEST(RANGE(1, GREATEST(CAST(CEIL((LEN(t) - {CHUNK_TOKENS})
                                            / CAST({CHUNK_STRIDE} AS DOUBLE))
                                       AS BIGINT) + 1, 1) + 1)) AS u(c)
    """,
)
def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-prep chunking: overlapping fixed-size token windows
    (32 tokens, stride 24). Chunk count per doc =
    ceil((len - chunk)/stride) + 1 (>= 1), so the tail is always covered and
    consecutive chunks share an 8-token overlap. Pure JVM sequence/slice
    expressions — a narrow map, no shuffle, the highest-volume transform in
    a 100 TB pipeline."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = F.greatest(
        F.ceil(
            (F.size("t") - F.lit(CHUNK_TOKENS))
            / F.lit(float(CHUNK_STRIDE))
        ).cast("long")
        + 1,
        F.lit(1).cast("long"),
    )
    return (
        toks.select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_no"
            ),
        )
        .select(
            "doc_id",
            "chunk_no",
            F.concat_ws(
                " ",
                F.slice(
                    "t",
                    (F.col("chunk_no") * CHUNK_STRIDE + 1).cast("int"),
                    CHUNK_TOKENS,
                ),
            ).alias("chunk_text"),
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.size("t") - F.col("chunk_no") * CHUNK_STRIDE,
            ).alias("n_tokens"),
        )
    )


DECONTAM_NGRAM = 4


@query(
    "q_text_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               UNNEST([ARRAY_TO_STRING(t[i : i + {DECONTAM_NGRAM} - 1], ' ')
                       FOR i IN RANGE(1, GREATEST(LEN(t) - {DECONTAM_NGRAM}
                                                  + 2, 1))]) AS gram
        FROM toks
    ), eval_sh AS (
        SELECT gram FROM sh WHERE doc_id % 50 = 0
    ), train_sh AS (
        SELECT doc_id, gram FROM sh WHERE doc_id % 50 != 0
    )
    SELECT doc_id AS train_doc_id,
           COUNT(DISTINCT gram) AS n_shared_grams
    FROM train_sh
    WHERE gram IN (SELECT gram FROM eval_sh)
    GROUP BY doc_id
    """,
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 5-gram with the
    held-out set (doc_id % 50 == 0 stands in for the benchmark corpus).

    The scale shape: eval n-grams are a SMALL broadcast-able set (benchmarks
    are MBs, corpora are TBs), so the contamination check is a broadcast
    semi-join against the training shingle stream — no shuffle of the
    corpus. Flagged docs are then dropped or audited before export."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    # Explicit short-doc branch: sequence(0, -1) is DESCENDING in Spark, and
    # under ANSI mode slice(t, 0, n) then throws (SQL array indices are
    # 1-based) — docs with < DECONTAM_NGRAM tokens must yield no grams, like
    # the oracle's empty RANGE.
    gram = F.expr(
        f"CASE WHEN size(t) >= {DECONTAM_NGRAM} THEN"
        f" transform(sequence(0, size(t) - {DECONTAM_NGRAM}),"
        f" i -> concat_ws(' ', slice(t, i + 1, {DECONTAM_NGRAM})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    sh = toks.select("doc_id", F.explode(gram).alias("gram")).distinct()
    eval_sh = sh.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    train_sh = sh.filter(F.col("doc_id") % 50 != 0)
    return (
        train_sh.join(F.broadcast(eval_sh), "gram", "left_semi")
        .groupBy(F.col("doc_id").alias("train_doc_id"))
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )


FUZZY_DECONTAM_NGRAM = 13
FUZZY_DECONTAM_THRESHOLD_PPM = 200_000


@query(
    "q_text_decontaminate_fuzzy",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), g AS (
        SELECT doc_id,
               [ARRAY_TO_STRING(t[i : i + {FUZZY_DECONTAM_NGRAM} - 1], ' ')
                FOR i IN RANGE(1, GREATEST(LEN(t) - {FUZZY_DECONTAM_NGRAM}
                                           + 2, 1))] AS grams
        FROM toks
    ), eval_g AS (
        SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 50 = 0
    ), tr AS (
        SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 50 != 0
    ), agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN gram IN (SELECT gram FROM eval_g)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        FROM tr GROUP BY doc_id
    )
    SELECT doc_id AS train_doc_id, n_grams, n_hits,
           CAST(n_hits * 1000000 // n_grams AS BIGINT) AS overlap_ppm,
           CAST(CASE WHEN n_hits * 1000000 // n_grams
                          >= {FUZZY_DECONTAM_THRESHOLD_PPM}
                     THEN 1 ELSE 0 END AS BIGINT) AS contaminated
    FROM agg
    """,
)
def q_text_decontaminate_fuzzy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FUZZY benchmark decontamination (the GPT-3 appendix-C / PaLM
    tier above q_text_decontaminate's exact any-collision membership):
    per training document, the FRACTION of its positional 13-gram
    windows that collide with the benchmark set — contaminated when
    the overlap reaches a threshold (here 20%; GPT-3 flagged any
    13-gram collision, PaLM used 70% of 8-grams — the fraction is the
    knob, exact integer ppm so the DuckDB oracle hash-matches
    bit-stably). Positional windows (not distinct grams) make the
    fraction a share of the DOCUMENT, so a long doc quoting one
    benchmark line scores low while a near-copy scores high.

    Scale shape identical to the exact tier: benchmark grams are a
    small DISTINCT broadcast set (benchmarks are MBs); the corpus-side
    stream is exploded windows counted per doc with map-side partial
    aggregation — no corpus shuffle, no driver materialization. Docs
    shorter than the window yield no rows (no denominator), exactly
    the oracle's empty RANGE."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n = FUZZY_DECONTAM_NGRAM
    gram = F.expr(
        f"CASE WHEN size(t) >= {n} THEN"
        f" transform(sequence(0, size(t) - {n}),"
        f" i -> concat_ws(' ', slice(t, i + 1, {n})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    grams = toks.select("doc_id", F.explode(gram).alias("gram"))
    eval_g = (
        grams.filter(F.col("doc_id") % 50 == 0)
        .select("gram")
        .distinct()
    )
    tr = grams.filter(F.col("doc_id") % 50 != 0)
    # one pass: every window counts toward the denominator; hit windows
    # (broadcast membership against the benchmark set) toward the
    # numerator — left_semi would need a second scan for totals
    hit = tr.join(
        F.broadcast(eval_g.withColumn("__hit", F.lit(1))),
        "gram",
        "left_outer",
    )
    agg = hit.groupBy(F.col("doc_id").alias("train_doc_id")).agg(
        F.count("*").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
    )
    # integer `div`, never float `/`+floor: an exactly-integral
    # quotient can round to x.999... in double and floor off-by-one
    # against DuckDB's exact `//` (house exactness recipe)
    ppm = F.expr("n_hits * CAST(1000000 AS BIGINT) div n_grams")
    return agg.select(
        "train_doc_id",
        "n_grams",
        "n_hits",
        ppm.alias("overlap_ppm"),
        F.when(
            ppm >= FUZZY_DECONTAM_THRESHOLD_PPM, F.lit(1)
        ).otherwise(F.lit(0)).cast("long").alias("contaminated"),
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), g AS (
        SELECT doc_id,
               [t[i] || ' ' || t[i+1] FOR i IN RANGE(1, GREATEST(LEN(t), 1))]
                   AS grams
        FROM t
    )
    SELECT doc_id,
           CAST(LEN(grams) AS BIGINT) AS n_bigrams,
           CAST(LEN(list_distinct(grams)) AS BIGINT) AS n_distinct,
           ROUND(CASE WHEN LEN(grams) = 0 THEN 0.0
                      ELSE 1.0 - CAST(LEN(list_distinct(grams)) AS DOUBLE)
                                 / LEN(grams) END, 6) AS repetition_ratio
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signal: fraction of duplicate word bigrams
    per document (1 - distinct/total) — the standard cheap filter for
    looping/boilerplate text in LLM training pipelines (high ratio = drop).

    Zero-shuffle JVM lambda expressions per row; the bigram list never
    leaves the executor. Short docs (<2 tokens) score 0.0 via the same
    guarded CASE branch as the shingle operators (sequence(0,-1) is
    descending and ANSI indexing throws)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    grams = F.expr(
        "CASE WHEN size(t) >= 2 THEN"
        " transform(sequence(0, size(t) - 2),"
        " i -> concat_ws(' ', t[i], t[i+1]))"
        " ELSE CAST(array() AS array<string>) END"
    )
    g = toks.select("doc_id", grams.alias("grams"))
    n = F.size("grams").cast("bigint")
    nd = F.size(F.array_distinct("grams")).cast("bigint")
    return g.select(
        "doc_id",
        n.alias("n_bigrams"),
        nd.alias("n_distinct"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(
                1.0 - nd.cast("double") / n
            ),
            6,
        ).alias("repetition_ratio"),
    )


PACK_TOKEN_BUDGET = 256


@query(
    "q_docs_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens AS DOUBLE) / {PACK_TOKEN_BUDGET}) AS BIGINT)
               AS pack_id
    FROM t
    """,
)
def q_docs_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: assign documents to fixed token-budget
    packs by streaming cumulative token count per source (docs concatenate
    into a pack until the budget spills, then a new pack starts) — the
    standard pre-tokenization packing pass that turns ragged documents into
    dense context windows.

    One window pass partitioned by source (the packing unit), integral token
    counts so the running sum is exact. At 100 TB each source partition
    packs independently — the window shuffle is the only exchange, and the
    greedy-by-id order is reproducible across runs, which training-data
    lineage requires."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select("doc_id", "source", n_tokens.alias("n_tokens"))
    prefix_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(prefix_excl.cast("double") / PACK_TOKEN_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
    )


SHUFFLE_SEED = 20260813


SHUFFLE_PARTITIONS = 32


@query(
    "q_docs_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
                    ORDER BY MD5(CAST(doc_id AS VARCHAR) || '#{SHUFFLE_SEED}'),
                             doc_id)
                AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def q_docs_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: order the corpus by a seeded hash of the
    document key — reproducible epoch shuffling for training-data export
    (same seed -> same permutation on any cluster size; new seed -> new
    permutation). The key is md5(doc_id # seed) — engine-portable (identical
    hex in Spark and DuckDB, unlike xxhash64, the r1-r3 key), which upgrades
    this from a rows-only check to a full permutation hash check; the
    permutation/determinism properties stay pinned in tests/test_properties.py.

    Scale shape: a range-partitioned sort on the hash key (balanced output
    partitions regardless of input skew — hash values are uniform), then
    positions via the scalable zipWithIndex pattern: row_number WITHIN each
    sorted partition (parallel window, no cross-partition data movement)
    plus per-partition offsets from a #partitions-row count aggregate — the
    ONE global window a naive row_number() over the full order would have
    collapsed into a single task. Driver handles only the
    SHUFFLE_PARTITIONS-row offset table."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from ..tables import ranged_offsets

    key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(f"#{SHUFFLE_SEED}")
        )
    )
    ordered, _ = ranged_offsets(
        d.select("doc_id", key.alias("shuffle_key")),
        SHUFFLE_PARTITIONS,
        [F.col("shuffle_key"), F.col("doc_id")],
    )
    w = Window.partitionBy("_pid").orderBy("shuffle_key", "doc_id")
    return ordered.select(
        "doc_id",
        (F.row_number().over(w) + F.col("_off")).cast("bigint").alias(
            "shuffle_pos"
        ),
    )


BP_NGRAM = 3


def _gram_expr(n: int) -> F.Column:
    """Guarded word n-gram list over a pre-split token array column `t`.

    Docs with < n tokens yield an EMPTY list: sequence(0, -1) is descending
    in Spark and ANSI slice/index then throws, so the short-doc branch is
    explicit (same contract as the oracle's empty RANGE)."""
    return F.expr(
        f"CASE WHEN size(t) >= {n} THEN"
        f" transform(sequence(0, size(t) - {n}),"
        f" i -> concat_ws(' ', slice(t, i + 1, {n})))"
        f" ELSE CAST(array() AS array<string>) END"
    )


@query(
    "q_text_boilerplate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), g AS (
        SELECT doc_id,
               UNNEST([ARRAY_TO_STRING(t[i : i + {BP_NGRAM} - 1], ' ')
                       FOR i IN RANGE(1, GREATEST(LEN(t) - {BP_NGRAM}
                                                  + 2, 1))]) AS gram
        FROM toks
    ), bp AS (
        SELECT gram
        FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram)
        WHERE df >= GREATEST(2, CEIL(0.01 * (SELECT COUNT(*) FROM documents)))
    ), per AS (
        SELECT doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN gram IN (SELECT gram FROM bp)
                        THEN 1 ELSE 0 END) AS n_bp
        FROM g GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_bp AS BIGINT) AS n_bp,
           ROUND(CAST(n_bp AS DOUBLE) / n_grams, 6) AS bp_ratio
    FROM per
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: word {BP_NGRAM}-grams whose
    document frequency reaches >= max(2, 1% of the corpus) are "boilerplate"
    (headers, license blurbs, nav chrome in real corpora); each doc then
    scores the fraction of its gram stream that is boilerplate — the
    corpus-level complement to q_text_repetition's within-doc signal, and
    the standard filter before near-dedup (boilerplate inflates MinHash
    similarity between unrelated pages).

    Scale shape: gram doc-frequency is one (gram)-keyed agg with map-side
    partial aggregation; the surviving heavy set is SMALL BY CONSTRUCTION
    (df >= 1% of docs caps it at 100/pct grams), so the per-doc re-score is
    a broadcast left-join over the gram stream — the corpus shuffles once
    for the DF count and once for the per-doc re-agg, never for the
    membership probe. The 1% threshold is a fraction, not an absolute, so
    the operator's selectivity is SF-invariant from the sf0.001 fixtures to
    100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    g = toks.select("doc_id", F.explode(_gram_expr(BP_NGRAM)).alias("gram"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_n"))
    df_gram = (
        g.distinct().groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    )
    bp = (
        df_gram.crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("df")
            >= F.greatest(F.lit(2).cast("bigint"), F.ceil(0.01 * F.col("_n")))
        )
        .select("gram")
    )
    per = (
        g.join(F.broadcast(bp.withColumn("_bp", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_bp"), F.lit(0)).cast("bigint").alias("n_bp"),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_bp",
        F.round(F.col("n_bp").cast("double") / F.col("n_grams"), 6).alias(
            "bp_ratio"
        ),
    )


TOPK_NGRAMS = 25


@query(
    "q_text_topk_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), g AS (
        SELECT UNNEST([ARRAY_TO_STRING(t[i : i + {BP_NGRAM} - 1], ' ')
                       FOR i IN RANGE(1, GREATEST(LEN(t) - {BP_NGRAM}
                                                  + 2, 1))]) AS gram
        FROM toks
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM g GROUP BY gram
    ORDER BY cnt DESC, gram
    LIMIT {TOPK_NGRAMS}
    """,
)
def q_text_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: the {TOPK_NGRAMS} most frequent word
    {BP_NGRAM}-grams — the exact counterpart of sketch-based frequent-items
    mining, used to surface candidate boilerplate/common-phrase lists for
    q_text_boilerplate-style filtering.

    Scale shape: explode -> hash agg with map-side partial aggregation (the
    per-partition combine collapses the gram stream before the one shuffle),
    then orderBy+limit plans as TakeOrderedAndProject — each partition keeps
    its local top-{TOPK_NGRAMS} and the driver merges K-sized heaps; the
    full sorted gram table never materializes. (cnt DESC, gram ASC) is a
    total order, so the LIMIT boundary is deterministic in both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    g = toks.select(F.explode(_gram_expr(BP_NGRAM)).alias("gram"))
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(TOPK_NGRAMS)
    )


SPLIT_TRAIN_LT = "d000"  # md5-prefix < this -> train  (~81.25%)
SPLIT_VAL_LT = "e800"  # else < this -> val (~9.4%); remainder test


@query(
    "q_docs_split_hash",
    oracle=f"""
    SELECT doc_id,
           SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4) AS hash_bucket,
           CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                     < '{SPLIT_TRAIN_LT}' THEN 'train'
                WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                     < '{SPLIT_VAL_LT}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_docs_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent key
    hash: the first 4 hex chars of md5(doc_id) partition [0, 0xffff] into
    ~81/9/10% bands. The property that matters for training pipelines:
    membership is a pure function of the key — stable across runs, cluster
    sizes, and engines (md5 is the oracle-reproducible choice; xxhash64
    is Spark-private), so adding documents never reshuffles existing
    assignments the way random() or modulo-on-row-number splits do.

    Zero shuffles — a row-local projection that stays in whole-stage
    codegen; fixed-length lowercase-hex prefixes compare lexicographically
    exactly like their numeric values, so the band predicate is a plain
    string comparison in both engines."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return d.select(
        "doc_id",
        bucket.alias("hash_bucket"),
        F.when(bucket < SPLIT_TRAIN_LT, "train")
        .when(bucket < SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )


TOPK_SKETCH_CAPACITY = 100_000


@query("q_text_topk_approx")
def q_text_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus heavy hitters: approx_top_k over the token stream
    — the constant-state, single-pass alternative to q_text_topk_ngrams'
    exact groupBy when the vocabulary itself is too large to shuffle (URL
    tokens, raw byte n-grams). The sketch buffer is map-side combinable and
    O(capacity) regardless of corpus size, so at 100 TB this is one scan +
    one constant-size merge tree, no token shuffle at all.

    Rows-only: sketch tie-breaking at the k-th boundary is engine-specific.
    The binding property (every reported count exact while the vocabulary
    fits the sketch capacity, and never below the exact k-th count) is
    pinned against the exact query in tests/test_properties.py."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    sk = tok.agg(
        F.expr(
            f"approx_top_k(token, {TOPK_NGRAMS}, {TOPK_SKETCH_CAPACITY})"
        ).alias("tk")
    )
    return sk.select(F.inline("tk")).select(
        F.col("item").alias("token"), F.col("count").alias("cnt")
    )


PIPE_MIN_TOKENS = 15
PIPE_MAX_REP = 0.06
PIPE_MAX_BP = 0.06


@query(
    "q_pipeline_e2e",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, text, source, STRING_SPLIT(text, ' ') AS t FROM documents
    ), feat AS (
        SELECT doc_id, text, source,
               CAST(LEN(t) AS BIGINT) AS n_tokens,
               CASE WHEN LEN(t) >= 2 THEN
                 ROUND(1.0 - CAST(LEN(list_distinct([t[i] || ' ' || t[i+1]
                                FOR i IN RANGE(1, LEN(t))])) AS DOUBLE)
                       / (LEN(t) - 1), 6)
               ELSE 0.0 END AS rep_ratio
        FROM toks
    ), g AS (
        SELECT doc_id, UNNEST([ARRAY_TO_STRING(t[i : i + 2], ' ')
                               FOR i IN RANGE(1, GREATEST(LEN(t) - 1, 1))]) AS gram
        FROM toks
    ), bp AS (
        SELECT gram
        FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram)
        WHERE df >= GREATEST(2, CEIL(0.01 * (SELECT COUNT(*) FROM documents)))
    ), bpr AS (
        SELECT doc_id, COUNT(*) AS n_grams,
               SUM(CASE WHEN gram IN (SELECT gram FROM bp)
                        THEN 1 ELSE 0 END) AS n_bp
        FROM g GROUP BY doc_id
    ), quality AS (
        SELECT f.doc_id, f.text, f.source, f.n_tokens
        FROM feat f LEFT JOIN bpr ON f.doc_id = bpr.doc_id
        WHERE f.n_tokens >= {PIPE_MIN_TOKENS}
          AND f.rep_ratio <= {PIPE_MAX_REP}
          AND ROUND(COALESCE(CAST(bpr.n_bp AS DOUBLE) / bpr.n_grams, 0.0), 6)
              <= {PIPE_MAX_BP}
    ), dedup AS (
        SELECT doc_id, text, source, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ), sh AS (
        SELECT DISTINCT doc_id,
               UNNEST([ARRAY_TO_STRING(t[i : i + {DECONTAM_NGRAM} - 1], ' ')
                       FOR i IN RANGE(1, GREATEST(LEN(t) - {DECONTAM_NGRAM}
                                                  + 2, 1))]) AS gram
        FROM toks
    ), eval_sh AS (
        SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0
    ), contaminated AS (
        SELECT DISTINCT doc_id FROM sh
        WHERE doc_id % 50 != 0 AND gram IN (SELECT gram FROM eval_sh)
    ), clean AS (
        SELECT * FROM dedup
        WHERE doc_id % 50 != 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), final AS (
        SELECT doc_id, source, n_tokens,
               CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                         < '{SPLIT_TRAIN_LT}' THEN 'train'
                    WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 4)
                         < '{SPLIT_VAL_LT}' THEN 'val'
                    ELSE 'test' END AS split
        FROM clean
    )
    SELECT doc_id, source, n_tokens, split,
           CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                    PARTITION BY source, split ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens AS DOUBLE) / {PACK_TOKEN_BUDGET}) AS BIGINT)
               AS pack_id
    FROM final
    """,
)
def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end training-data pipeline, one declarative plan:

        quality gates (token floor, within-doc repetition, cross-doc
        boilerplate fraction) -> exact dedup (min-id per text) ->
        benchmark decontamination (shared 4-grams vs the eval slice) ->
        deterministic hash split -> per-(source, split) sequence packing.

    Every stage is an already-oracled operator (q_text_repetition,
    q_text_boilerplate, q_dedup_exact, q_text_decontaminate,
    q_docs_split_hash, q_docs_pack); this query proves they COMPOSE into
    the real production shape — one Catalyst plan, no materialization
    between stages, oracled end-to-end against the equivalent CTE chain.

    Scale shape: the corpus-wide aggregates (gram DF, eval-gram set) are
    small by construction and broadcast into row-local probes; the heavy
    streams shuffle only where the semantics force it (gram DF count,
    per-doc re-agg, dedup window on text, pack window on (source, split)).
    Filters run BEFORE the dedup/pack windows, so the expensive stages see
    only surviving rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "text", "source", F.split("text", " ").alias("t")
    )
    n_tok = F.size("t").cast("bigint")
    rep = F.when(
        F.size("t") >= 2,
        F.round(
            1.0
            - F.size(F.array_distinct(_gram_expr(2))).cast("double")
            / (F.size("t") - 1),
            6,
        ),
    ).otherwise(F.lit(0.0))
    feat = toks.select(
        "doc_id",
        "text",
        "source",
        n_tok.alias("n_tokens"),
        rep.alias("rep_ratio"),
    )
    g = toks.select("doc_id", F.explode(_gram_expr(BP_NGRAM)).alias("gram"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_n"))
    bpset = (
        g.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            F.col("df")
            >= F.greatest(F.lit(2).cast("bigint"), F.ceil(0.01 * F.col("_n")))
        )
        .select("gram")
    )
    bpr = (
        g.join(F.broadcast(bpset.withColumn("_bp", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_bp"), F.lit(0)).alias("n_bp"),
        )
    )
    quality = (
        feat.join(bpr, "doc_id", "left")
        .filter(
            (F.col("n_tokens") >= PIPE_MIN_TOKENS)
            & (F.col("rep_ratio") <= PIPE_MAX_REP)
            & (
                F.round(
                    F.coalesce(
                        F.col("n_bp").cast("double") / F.col("n_grams"),
                        F.lit(0.0),
                    ),
                    6,
                )
                <= PIPE_MAX_BP
            )
        )
        .select("doc_id", "text", "source", "n_tokens")
    )
    from pyspark.sql import Window

    w_dedup = Window.partitionBy("text").orderBy("doc_id")
    dedup = (
        quality.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    sh = toks.select(
        "doc_id", F.explode(_gram_expr(DECONTAM_NGRAM)).alias("gram")
    ).distinct()
    eval_sh = sh.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_sh), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = dedup.filter(F.col("doc_id") % 50 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    final = clean.select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(bucket < SPLIT_TRAIN_LT, "train")
        .when(bucket < SPLIT_VAL_LT, "val")
        .otherwise("test")
        .alias("split"),
    )
    w_pack = (
        Window.partitionBy("source", "split")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_excl = F.sum("n_tokens").over(w_pack) - F.col("n_tokens")
    return final.select(
        "doc_id",
        "source",
        "n_tokens",
        "split",
        F.floor(prefix_excl.cast("double") / PACK_TOKEN_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
    )


TFIDF_TOP_TERMS = 3


@query(
    "q_text_tfidf",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * LN(CAST((SELECT COUNT(*) FROM documents)
                                     AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token
    )
    SELECT doc_id, token, tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        FROM scored
    )
    WHERE rn <= {TFIDF_TOP_TERMS}
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_TERMS} TF-IDF terms per document — the classic
    keyword/topic signal (and the sparse-retrieval scoring primitive BM25
    refines).

    Exactness across engines: tf, df, and N are integers, so
    tf * ln(N/df) is the same IEEE double in both (one product, one log,
    one division of identical operands — only SUM merge order ever
    diverges, and there is none here). (tfidf DESC, token ASC) totally
    orders the per-doc top-k.

    Scale shape: tf aggregates (doc_id, token)-keyed with map-side
    partials; df is a second token-keyed agg whose result is
    vocabulary-sized -> joined back token-keyed (co-clustered with the tf
    stream, no extra corpus pass); N broadcasts as a 1-row agg; the
    per-doc top-k is a window over the already-aggregated tf rows, never
    the raw token stream."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # tf materialized once (the inverted index), df derived FROM it (one
    # tf row per (doc, token) == one doc per row) — the round-5 scan audit
    # showed AQE compiling the corpus explode once per consumer otherwise.
    # N stays a separate column-pruned count-only scan.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * F.log(F.col("_n").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_TERMS)
        .drop("rn")
    )


BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "q_text_bm25",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(CAST(dl AS DOUBLE)) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), scored AS (
        SELECT tf.doc_id, tf.token,
               ROUND(
                 LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * ({BM25_K1} + 1.0))
                 / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                    + {BM25_B} * dl.dl / stats.avgdl)), 6) AS bm25
        FROM tf
        JOIN df ON tf.token = df.token
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id, token, bm25
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY bm25 DESC, token) AS rn
        FROM scored
    )
    WHERE rn <= {TFIDF_TOP_TERMS}
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOP_TERMS} BM25 terms per document — TF-IDF with
    saturation (k1) and document-length normalization (b), the standard
    sparse-retrieval ranking function.

    Determinism: every input to the formula is integer-derived (tf, df, N,
    dl) or an exact constant; AVG over bigints sums exactly in both
    engines before one double division — so the scores are identical IEEE
    doubles, no sum-order exposure. Scale shape mirrors q_text_tfidf with
    one extra doc-keyed join (dl, co-clustered with tf) and a broadcast
    2-value stats row."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # ONE corpus explode: tf is materialized (it is literally the inverted
    # index a sparse-retrieval engine persists), and dl / df / stats all
    # derive from it — sum(tf) per doc IS the doc length, one tf row per
    # (doc, token) IS one doc per token. The previous spelling compiled
    # the token stream once per consumer (3 corpus passes, round-5 audit).
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(df, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "token", F.round(idf * tf_part, 6).alias("bm25")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_TERMS)
        .drop("rn")
    )


@query(
    "q_pack_manifest",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), p AS (
        SELECT doc_id, source, n_tokens,
               CAST(FLOOR(CAST(SUM(n_tokens) OVER (
                        PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS DOUBLE) / {PACK_TOKEN_BUDGET}) AS BIGINT)
                   AS pack_id
        FROM t
    )
    SELECT source, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MD5(STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS content_hash
    FROM p GROUP BY source, pack_id
    """,
)
def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data lineage manifest: one row per (source, pack) with doc
    count, token count, and an order-canonical md5 over the member doc ids
    — the reproducibility receipt a training run stores so ANY engine can
    re-derive and verify exactly which documents fed which context window
    (md5(ordered id list) is engine-reproducible, unlike file checksums).

    Composes on q_docs_pack's window; the manifest agg reuses the same
    (source)-clustering, and the member list is sorted INSIDE each pack
    group (collect_list is unordered by contract — sort_array makes the
    hash deterministic) before hashing. Output is all-scalar: the id list
    itself never surfaces (driver canonicalizer cannot hash arrays)."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = d.select("doc_id", "source", n_tokens.alias("n_tokens"))
    prefix_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packed = base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(prefix_excl.cast("double") / PACK_TOKEN_BUDGET)
        .cast("bigint")
        .alias("pack_id"),
    )
    ids_csv = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.md5(ids_csv).alias("content_hash"),
    )


# Bigram-LM scoring CTEs, shared by BOTH oracles that need the score
# (q_text_bigram_lm, q_text_ppl_buckets) so a scoring change can never
# update one and silently diverge the other (review catch).
_BIGRAM_SCORE_CTES = """
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
    ), g AS (
        SELECT doc_id,
               UNNEST(t[1 : LEN(t) - 1]) AS w1,
               UNNEST(t[2 : LEN(t)]) AS w2
        FROM toks WHERE LEN(t) >= 2
    ), c2 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM g GROUP BY w1, w2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM g GROUP BY w1
    ), scored AS (
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(CAST(SUM(CAST(ROUND(LN(CAST(c2.c12 AS DOUBLE) / c1.c1)
                                         * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / COUNT(*), 6) AS avg_logprob
        FROM g
        JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2
        JOIN c1 ON g.w1 = c1.w1
        GROUP BY g.doc_id
    )
"""


@query(
    "q_text_bigram_lm",
    oracle=_BIGRAM_SCORE_CTES
    + """
    SELECT doc_id, n_bigrams, avg_logprob FROM scored
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM quality score: each document's mean log P(w2|w1)
    under the corpus MLE bigram model — the cheap statistical stand-in for
    model-based (perplexity) quality filtering: documents far below the
    corpus-typical log-prob are noise, far above are boilerplate.

    Determinism is the hard part: a sum of raw double logs is
    partition-order-dependent, so each log term is rounded to micro-units
    and ACCUMULATED AS LONG (the exact_sum pattern applied to
    transcendentals) — both engines compute the identical IEEE ln on
    integer-ratio inputs, the identical per-term rounding, and an exact
    integer sum, then one double division each.

    Scale shape: the model (c2 bigram counts, c1 prefix counts) is two
    map-side-combined aggs over the bigram stream; scoring joins the stream
    back on the bigram key (vocabulary-clustered, co-partitioned with c2);
    the per-doc mean re-aggregates on doc_id. No broadcast pin on c2 — a
    real vocabulary can exceed the broadcast threshold; AQE may still
    choose one when it fits."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    n = F.size("t")
    g = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 1).alias("w1"),
                F.slice("t", 2, n - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = g.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = g.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    term = F.round(
        F.log(F.col("c12").cast("double") / F.col("c1")) * 1000000
    ).cast("bigint")
    return (
        g.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double") / 1000000.0 / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


STRATIFIED_QUOTA = 20


@query(
    "q_docs_stratified",
    oracle=f"""
    SELECT doc_id, source, pick_rank FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS pick_rank
        FROM documents
    )
    WHERE pick_rank <= {STRATIFIED_QUOTA}
    """,
)
def q_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified subsample: the first {STRATIFIED_QUOTA}
    documents per source in md5(doc_id) order — balanced source mixing for
    eval sets and ablations. Hash order is an unbiased, engine-reproducible
    stand-in for random order (same property as q_docs_split_hash:
    membership is a pure function of the key, so reruns and engine swaps
    pick the identical sample; `TABLESAMPLE` cannot promise that).

    Scale shape: one window partitioned by source; rank never looks past
    the quota, so at 100 TB the right plan caps per-partition work — and
    the md5 sort key is computed once in the window's own exchange, not in
    a separate pass."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= STRATIFIED_QUOTA)
    )


SPAN_TOKENS = 12


@query(
    "q_text_span_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    spans AS (
        SELECT doc_id, CAST(s - 1 AS BIGINT) AS span_no,
               ARRAY_TO_STRING(t[(s - 1) * {SPAN_TOKENS} + 1 :
                                 s * {SPAN_TOKENS}], ' ') AS span
        FROM t, UNNEST(RANGE(1, CAST(CEIL(LEN(t) / CAST({SPAN_TOKENS}
                                          AS DOUBLE)) AS BIGINT) + 1)) u(s)
    ), ranked AS (
        SELECT doc_id, span_no,
               ROW_NUMBER() OVER (PARTITION BY span
                                  ORDER BY doc_id, span_no) AS rn
        FROM spans
    )
    SELECT doc_id, COUNT(*) AS n_spans,
           COUNT(CASE WHEN rn = 1 THEN 1 END) AS kept_spans,
           CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) * 1000000 // COUNT(*)
                AS BIGINT) AS retained_ppm
    FROM ranked GROUP BY doc_id
    """,
)
def q_text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (the line/paragraph-dedup of RefinedWeb/CCNet
    pipelines, over disjoint {SPAN_TOKENS}-token spans since the fixture
    has no newlines): a span kept by its FIRST occurrence in (doc_id,
    span_no) order, every later copy dropped; per doc, the retained-span
    fraction in ppm.

    This is the granularity between document dedup (q_dedup_exact) and
    n-gram near-dup: repeated boilerplate inside otherwise-unique documents
    is removed span-by-span. One shuffle, keyed on span text (at 100 TB,
    key on xxhash64(span) — 8-byte keys, same first-occurrence semantics);
    the window is rank-1-per-span, which Spark evaluates without
    materializing the full rank. Counts use COUNT(CASE) — BIGINT in both
    engines, never HUGEINT.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n_spans = F.ceil(F.size("t") / F.lit(float(SPAN_TOKENS))).cast("long")
    spans = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), n_spans - 1)).alias(
            "span_no"
        ),
        "t",
    ).select(
        "doc_id",
        "span_no",
        F.concat_ws(
            " ",
            F.slice(
                "t",
                (F.col("span_no") * SPAN_TOKENS + 1).cast("int"),
                SPAN_TOKENS,
            ),
        ).alias("span"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("span").orderBy("doc_id", "span_no")
    ranked = spans.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("kept_spans"),
        F.expr(
            "count(CASE WHEN rn = 1 THEN 1 END) * 1000000"
            " div count(1)"
        ).alias("retained_ppm"),
    )


ZIPF_TOP_K = 50


@query(
    "q_text_zipf",
    oracle=f"""
    WITH w AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ), f AS (
        SELECT word, COUNT(*) AS freq FROM w WHERE word <> ''
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT {ZIPF_TOP_K}
    )
    SELECT word, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS BIGINT)
               AS rank,
           CAST(freq * ROW_NUMBER() OVER (ORDER BY freq DESC, word)
                AS BIGINT) AS zipf_product
    FROM f
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: the ZIPF_TOP_K most frequent words
    with their rank and the rank x frequency product — the corpus-
    statistics sanity check (natural text keeps the product roughly
    constant; a flat or collapsed profile flags boilerplate floods,
    deduplication failures, or synthetic-text contamination upstream of
    tokenizer training).

    Scale shape: one word-count shuffle with map-side partials (the same
    aggregate BPE trains from), then orderBy+limit plans as
    TakeOrderedAndProject — per-partition top-k heaps, no global sort —
    and the rank window runs over the ZIPF_TOP_K-row result. Ties order
    (freq DESC, word), a total order in both engines.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    f = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(ZIPF_TOP_K)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    rank = F.row_number().over(w).cast("bigint")
    return f.select(
        "word",
        "freq",
        rank.alias("rank"),
        (F.col("freq") * rank).alias("zipf_product"),
    )


# PII scrubbing (round 5) — a standard curation stage every LLM training
# pipeline runs before tokenization. The fixture corpus contains no PII
# (verified: zero digits anywhere), so the query INJECTS deterministic
# synthetic PII first (an email + a phone derived from doc_id) and then
# scrubs it — the injection is fixture setup, the scrub is the operator.
PII_EMAIL_RE = "[a-z0-9.]+@[a-z]+\\.[a-z]+"
PII_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "q_docs_pii_scrub",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or call 555-'
                    || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(raw, '{PII_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(LEN(regexp_extract_all(raw, '{PII_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           MD5(regexp_replace(regexp_replace(raw, '{PII_EMAIL_RE}',
                                             '<EMAIL>', 'g'),
                              '{PII_PHONE_RE}', '<PHONE>', 'g'))
               AS scrubbed_md5
    FROM injected
    """,
)
def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: find-and-mask emails and phone numbers, reporting
    per-doc redaction counts and the md5 of the scrubbed text (the hash
    proves BOTH engines produced byte-identical redacted output, not just
    equal counts).

    All JVM-side regexp expressions (regexp_count / regexp_replace) — the
    patterns are chosen inside the common Java-regex/RE2 dialect subset so
    the DuckDB twin matches byte-for-byte. Scale shape: a pure per-row map
    over one scan, no shuffle, no Python; at 100 TB this pipelines inside
    whole-stage codegen like any projection. Real deployments extend the
    pattern set (SSNs, credit cards, addresses) and chain an NER model for
    names — the regex tier here is the deterministic, oracle-checkable
    core every pipeline runs first.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    injected = d.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("raw", PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        F.regexp_count("raw", F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("raw", F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# Weighted (Poisson) sampling: inclusion probability proportional to doc
# length, capped at 1. W_CAP is the weight at which a document is always
# kept; the u16 hash grid gives pi a 1/65536 resolution. Chosen so the
# keep rule and pi are EXACT integer arithmetic in both engines
# (W_CAP must divide 10^6 so pi_ppm is an integer).
WSAMPLE_CAP = 400
WSAMPLE_PPM_MULT = 10**6 // WSAMPLE_CAP
assert WSAMPLE_PPM_MULT * WSAMPLE_CAP == 10**6


@query(
    "q_docs_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           LEAST(1000000, n_chars * {WSAMPLE_PPM_MULT}) AS pi_ppm
    FROM documents
    WHERE CAST(CONCAT('0x',
               SUBSTR(md5(CAST(doc_id AS VARCHAR) || '#wsample'), 1, 4))
               AS BIGINT) * {WSAMPLE_CAP}
          < n_chars * 65536
    """,
)
def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling (Poisson/Bernoulli with inclusion
    probability pi_i = min(1, n_chars / WSAMPLE_CAP)) — the
    quality/length-weighted subsampling step of training-data curation,
    completing the repo's sampling family (uniform q_sample, stratified
    q_docs_stratified, split q_docs_split_hash) with the
    unequal-probability flavor.

    The keep decision is exact integer math on a keyed md5 uniform:
    u16 in [0, 65535] from the first 4 hex chars, kept iff
    u16 * W_CAP < w_i * 65536  (one cross-multiplication, no float ever
    enters), so both engines select the IDENTICAL rows and reruns are
    stable across cluster sizes. The shipped pi_ppm column is what a
    Horvitz-Thompson estimator downstream divides by (sum over the sample
    of x_i/pi_i unbiasedly estimates the corpus total) — also exact
    integer ppm, since WSAMPLE_CAP divides 10^6 * n_chars evenly.

    Scale shape: a row-local filter + projection inside the scan's
    whole-stage codegen — zero shuffles, zero driver state; at 100 TB the
    sample streams out at scan speed, and membership never reshuffles
    when new documents arrive (hash of the key, not of the rowset).
    """
    d = load_table(spark, sf_dir, "documents")
    u16 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#wsample"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    return d.filter(u16 * WSAMPLE_CAP < F.col("n_chars") * 65536).select(
        "doc_id",
        "lang",
        "n_chars",
        F.least(
            F.lit(1000000).cast("long"),
            F.col("n_chars") * WSAMPLE_PPM_MULT,
        ).alias("pi_ppm"),
    )


def symdelete_keys(col: str) -> F.Column:
    """Symmetric-delete (SymSpell) blocking keys for edit distance <= 2:
    the token itself plus every 1- and 2-character-deletion variant,
    deduped with array_union — all inside whole-stage codegen. The
    guarantee (property-tested): lev(a, b) <= 2 implies the key sets of
    a and b intersect, so blocked-then-verify equals exhaustive."""
    n = F.length(col)
    del1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            F.substr(F.col(col), F.lit(1), i - 1),
            F.substr(F.col(col), i + 1, n),
        ),
    )
    # 2-deletions: delete positions i < j of the original token;
    # generating both from the original keeps the expression flat.
    del2 = F.flatten(
        F.transform(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
            lambda j: F.transform(
                F.sequence(F.lit(1), j - 1),
                lambda i: F.concat(
                    F.substr(F.col(col), F.lit(1), i - 1),
                    F.substr(F.col(col), i + 1, j - i - 1),
                    F.substr(F.col(col), j + 1, n),
                ),
            ),
        )
    )
    return F.array_union(
        F.array(F.col(col)),
        F.array_union(del1, F.when(n >= 2, del2).otherwise(F.array())),
    )


@query(
    "q_text_fuzzy_join",
    oracle="""
    WITH tok AS (
        SELECT token, COUNT(*) AS tf
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
        GROUP BY token
    )
    SELECT a.token AS token_a, b.token AS token_b,
           a.tf AS tf_a, b.tf AS tf_b,
           levenshtein(a.token, b.token) AS dist
    FROM tok a JOIN tok b
      ON a.token < b.token
     AND levenshtein(a.token, b.token) <= 2
    """,
)
def q_text_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join of the corpus vocabulary: all token pairs within
    edit distance 2, found by SYMMETRIC-DELETE blocking (SymSpell): each
    token emits its identity plus every 1- and 2-character-deletion
    variant as candidate keys; only pairs sharing a key are verified with
    the exact levenshtein — the typo-mining / spelling-normalization
    primitive of text curation.

    Correctness rests on the symmetric-delete guarantee: if
    lev(a, b) <= d then deleting at most d chars from each side reaches a
    common string, so every true pair shares at least one blocking key
    and the verified result equals the oracle's exhaustive O(V^2) cross
    join exactly.

    Scale shape: candidate generation is O(V * L^2) rows (L = token
    length, key arrays deduped with array_union) shuffled on the blocking
    key — replacing the quadratic all-pairs compare that is infeasible at
    a 100 TB corpus's vocabulary; the expensive levenshtein runs only on
    co-bucketed candidates, and the hot short-key buckets are bounded by
    the alphabet, not the corpus. All JVM expressions (transform /
    flatten / array_union inside codegen), no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    k = tok.select(
        "token", "tf", F.explode(symdelete_keys("token")).alias("bkey")
    )
    a = k.select(
        F.col("token").alias("token_a"),
        F.col("tf").alias("tf_a"),
        "bkey",
    )
    b = k.select(
        F.col("token").alias("token_b"),
        F.col("tf").alias("tf_b"),
        "bkey",
    )
    cand = (
        a.join(b, ["bkey"])
        .filter(F.col("token_a") < F.col("token_b"))
        .drop("bkey")
        .distinct()
    )
    dist = F.levenshtein("token_a", "token_b")
    return cand.filter(dist <= 2).withColumn(
        "dist", dist.cast("bigint")
    )


# Phrase searched by q_text_phrase_search — two adjacent tokens, distinct
# by construction so occurrences can never overlap.
PHRASE = ("key", "agg")


@query(
    "q_text_phrase_search",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ), hits AS (
        SELECT doc_id,
               list_filter(range(1, len(toks)),
                           i -> toks[i] = '{PHRASE[0]}'
                            AND toks[i + 1] = '{PHRASE[1]}') AS ps
        FROM t
    )
    SELECT doc_id,
           CAST(len(ps) AS BIGINT) AS n_hits,
           CAST(ps[1] - 1 AS BIGINT) AS first_pos
    FROM hits WHERE len(ps) > 0
    """,
)
def q_text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search — the inverted-index probe: tokenize with
    positions (posexplode), select each phrase term's posting list, and
    join on (doc, adjacent position); per matching doc ship the hit count
    and the first occurrence's 0-based token position. The oracle is an
    independent serial implementation (DuckDB list lambda over the token
    array), not the same join transcribed.

    Scale shape: at 100 TB the (token, doc_id, pos) frame is the posting
    -list table you materialize ONCE into a partitioned/bucketed
    SnapshotTable keyed by token, so a phrase probe reads only its terms'
    buckets; the k-way positional join is driven by the rarest term and
    each equality+adjacency join is a hash join on (doc_id) with the
    position offset as residual — never a cartesian. Term selectivity
    filters push into the scan here (PushedFilters on the generated
    column after materialization).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )
    t1 = tok.filter(F.col("token") == PHRASE[0]).select(
        "doc_id", F.col("pos").alias("p1")
    )
    t2 = tok.filter(F.col("token") == PHRASE[1]).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("p2")
    )
    hits = t1.join(
        t2,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("p2") == F.col("p1") + 1),
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("p1").cast("bigint").alias("first_pos"),
    )


# Temperature-sampling scale constant: per-language keep probability
# p_l = min(1, TSAMPLE_C / sqrt(n_l)) — the T=2 temperature flattening
# (p_l * n_l ∝ sqrt(n_l): low-resource languages keep a larger share,
# the multilingual-corpus rebalancing recipe). 5/sqrt(64..218) spans
# ~0.34..0.63 on the driver corpus, so every language is genuinely
# subsampled and genuinely differently.
TSAMPLE_C = 5


@query(
    "q_docs_temperature_sample",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ), u AS (
        SELECT d.lang, c.n_docs,
               CAST(CONCAT('0x',
                    SUBSTR(md5(CAST(d.doc_id AS VARCHAR) || '#tsample'),
                           1, 4)) AS BIGINT) AS u16
        FROM documents d JOIN counts c ON c.lang = d.lang
    )
    SELECT lang, n_docs,
           CAST(COUNT(*) FILTER (
               WHERE u16 * u16 * n_docs
                     < {TSAMPLE_C * TSAMPLE_C} * 4294967296
           ) AS BIGINT) AS n_kept
    FROM u
    GROUP BY lang, n_docs
    """,
)
def q_docs_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BALANCED language resampling (T=2): keep each doc of
    language l with p_l = min(1, C / sqrt(n_l)), so the sampled corpus'
    language mass goes from n_l to ~C*sqrt(n_l) — the standard
    multilingual rebalancing (p_l ∝ (n_l/N)^(1/T) per-doc) that keeps
    low-resource languages from drowning. Completes the sampling family
    (uniform / stratified / split / weighted) with the
    distribution-reshaping flavor.

    The sqrt NEVER enters either engine: squaring the keep inequality
    (u16/65536 < C/sqrt(n_l)  <=>  u16^2 * n_l < C^2 * 65536^2) makes
    the decision one exact BIGINT cross-multiplication on the keyed md5
    uniform — both engines select IDENTICAL rows, stable across reruns
    and cluster sizes (the q_docs_weighted_sample construction;
    u16^2 * n_l tops out ~4e15, far under 2^63).

    Scale shape: one groupBy for the language counts (KB-sized),
    broadcast back onto the scan, then a row-local integer filter in
    whole-stage codegen — no second shuffle; membership is a pure hash
    of (doc_id, salt), so arrivals never reshuffle the existing sample.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    u16 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit("#tsample"))
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    rhs = F.lit(TSAMPLE_C * TSAMPLE_C * 4294967296).cast("bigint")
    kept_flag = (u16 * u16 * F.col("n_docs") < rhs).cast("bigint")
    return (
        d.join(F.broadcast(counts), "lang")
        .groupBy("lang", "n_docs")
        .agg(F.sum(kept_flag).cast("bigint").alias("n_kept"))
    )


@query(
    "q_text_ppl_buckets",
    oracle=_BIGRAM_SCORE_CTES
    + """
    SELECT doc_id, avg_logprob,
           CAST(NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id)
                AS BIGINT) AS bucket
    FROM scored
    """,
)
def q_text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: rank every document by its
    bigram-LM score and split the corpus into HEAD (bucket 1, most
    corpus-typical = lowest perplexity), MIDDLE, TAIL — the filter CCNet
    applies with a KenLM before keeping head+middle for training.
    Composes q_text_bigram_lm's exact-integer score (micro-unit long
    accumulation, engine-identical) with one ranked window; the
    (avg_logprob DESC, doc_id) order is total, so bucket edges are
    engine-stable even at score ties.

    Scale note: NTILE is a global sort (range exchange). At 100 TB the
    same cut comes from approx_percentile edges + a row-local CASE —
    documented swap, same downstream semantics; the exact global rank
    is the validation tier.
    """
    scored = q_text_bigram_lm(spark, sf_dir).select(
        "doc_id", "avg_logprob"
    )
    w = Window.orderBy(F.desc("avg_logprob"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "avg_logprob",
        F.ntile(3).over(w).cast("bigint").alias("bucket"),
    )


@query(
    "q_text_distinct_ngrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS t FROM documents
    ), uni AS (
        SELECT lang, UNNEST(t) AS w FROM toks
    ), bi AS (
        SELECT lang,
               UNNEST(t[1 : LEN(t) - 1]) || ' ' || UNNEST(t[2 : LEN(t)])
                   AS g
        FROM toks WHERE LEN(t) >= 2
    ), u AS (
        SELECT lang, COUNT(*) AS n1, COUNT(DISTINCT w) AS d1 FROM uni
        GROUP BY 1
    ), b AS (
        SELECT lang, COUNT(*) AS n2, COUNT(DISTINCT g) AS d2 FROM bi
        GROUP BY 1
    )
    SELECT u.lang, u.n1, u.d1,
           CAST(u.d1 * 1000000 // u.n1 AS BIGINT) AS distinct1_ppm,
           b.n2, b.d2,
           CAST(b.d2 * 1000000 // b.n2 AS BIGINT) AS distinct2_ppm
    FROM u JOIN b ON b.lang = u.lang
    """,
)
def q_text_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity (distinct-1/distinct-2: unique n-grams over
    total n-grams, in exact ppm) per language — the standard
    text-diversity / degeneration metric (low distinct-n = repetitive,
    template-heavy, or model-looped text) reported alongside the Gopher
    and repetition gates.

    Exact integers end to end (counts + one integer division per ppm,
    `div`/`//` on both engines). Scale shape: two map-side-combined
    token/bigram aggregates; COUNT(DISTINCT) shuffles on (lang, gram) —
    the gram-keyed partial-dedup shape, never a driver set.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("t"))
    uni = toks.select("lang", F.explode("t").alias("w"))
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            "lang",
            F.explode(
                F.zip_with(
                    F.slice(F.col("t"), 1, F.size("t") - 1),
                    F.slice(F.col("t"), 2, F.size("t") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("g"),
        )
    )
    u = uni.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n1"),
        F.countDistinct("w").alias("d1"),
    )
    b = bi.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n2"),
        F.countDistinct("g").alias("d2"),
    )
    return u.join(b, "lang").select(
        "lang",
        "n1",
        "d1",
        F.expr("d1 * 1000000 div n1").cast("bigint").alias("distinct1_ppm"),
        "n2",
        "d2",
        F.expr("d2 * 1000000 div n2").cast("bigint").alias("distinct2_ppm"),
    )


@query(
    "q_docs_entropy",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
    ), tot AS (
        SELECT source, SUM(n) AS s FROM c GROUP BY 1
    ), terms AS (
        SELECT c.source,
               CAST(ROUND(-(CAST(c.n AS DOUBLE) / t.s)
                          * LN(CAST(c.n AS DOUBLE) / t.s)
                          * 1000000) AS BIGINT) AS term_micro
        FROM c JOIN tot t ON t.source = c.source
    )
    SELECT source,
           CAST(SUM(term_micro) AS BIGINT) AS entropy_micro_nats,
           COUNT(*) AS n_langs
    FROM terms
    GROUP BY source
    """,
)
def q_docs_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each SOURCE's language distribution (in
    micro-nats) — the mixture-health metric: a source whose entropy
    collapses is feeding a single language (or a crawler got stuck),
    one whose entropy spikes changed composition. Pairs with
    q_quality_drift as the monitoring duo (drift = across time,
    entropy = across mixture).

    Exactness: the usual recipe — p·ln(p) on IEEE doubles built from
    identical exact integer ratios, rounded per TERM to micro-units and
    summed as BIGINT (partition-order-immune; the bigram-LM pattern).
    One |sources| x |langs| aggregate after a map-side-combined scan.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("source").agg(F.sum("n").alias("s"))
    p = F.col("n").cast("double") / F.col("s")
    term = F.round(-p * F.log(p) * 1000000).cast("bigint")
    return (
        c.join(F.broadcast(tot), "source")
        .select("source", term.alias("term_micro"))
        .groupBy("source")
        .agg(
            F.sum("term_micro").cast("bigint").alias("entropy_micro_nats"),
            F.count(F.lit(1)).alias("n_langs"),
        )
    )


DSIR_BUCKETS = 4096


@query(
    "q_docs_dsir",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
        FROM documents
    ), tk AS (
        SELECT doc_id,
               CAST(CONCAT('0x', SUBSTR(md5(w), 1, 8)) AS BIGINT)
                   % {DSIR_BUCKETS} AS b
        FROM toks WHERE w <> ''
    ), ct AS (
        SELECT b, COUNT(*) AS c FROM tk WHERE doc_id % 50 = 0 GROUP BY b
    ), cs AS (
        SELECT b, COUNT(*) AS c FROM tk WHERE doc_id % 50 != 0 GROUP BY b
    ), tot AS (
        SELECT (SELECT COUNT(*) FROM tk WHERE doc_id % 50 = 0) AS ctot,
               (SELECT COUNT(*) FROM tk WHERE doc_id % 50 != 0) AS stot
    ), lam AS (
        SELECT cs.b,
               CAST(ROUND(LN(
                   CAST((COALESCE(ct.c, 0) + 1)
                        * (stot + {DSIR_BUCKETS}) AS DOUBLE)
                   / ((cs.c + 1) * (ctot + {DSIR_BUCKETS}))
               ) * 1000000) AS BIGINT) AS l
        FROM cs LEFT JOIN ct USING (b), tot
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(l.l) AS BIGINT) AS dsir_micro_nats,
           CAST(CASE WHEN SUM(l.l) > 0 THEN 1 ELSE 0 END AS BIGINT)
               AS selected
    FROM tk t JOIN lam l USING (b)
    WHERE t.doc_id % 50 != 0
    GROUP BY t.doc_id
    """,
)
def q_docs_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-weighted data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"),
    DuckDB-oracled bit-stably: hashed word-unigram features (md5 ->
    4096 buckets), add-one-smoothed bucket distributions for
    the TARGET domain (the doc_id % 50 == 0 grid — the same
    benchmark-like slice the decontamination fixtures use) and the
    SOURCE corpus, and per source document the log importance weight
    sum log p_target(b)/p_source(b) over its token occurrences —
    ``selected`` marks docs that look more target- than source-like.
    The house transcendental recipe keeps it exact: each bucket's
    log-ratio is ln of one double ratio of EXACT integers, rounded to
    micro-nats ONCE into a BIGINT, and per-doc weights are exact
    integer sums — partition-order-independent and identical in both
    engines.

    Scale shape: the model is two map-side-combined bucket counts
    collapsed to a <= 4096-row lambda table (broadcast);
    scoring is the token scan joined to that broadcast plus ONE
    doc-key shuffle. At 100 TB the target set is MBs (a benchmark /
    curated seed), the source stream never reshuffles on anything
    wider than doc_id, and resampling downstream composes with the
    weighted/temperature samplers (q_docs_weighted_sample's
    Horvitz-Thompson contract)."""
    d = load_table(spark, sf_dir, "documents")
    B = DSIR_BUCKETS
    tk = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast(
                    "long"
                )
                % B
            ).alias("b"),
        )
    )
    is_target = F.col("doc_id") % 50 == 0
    ct = tk.filter(is_target).groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    cs = tk.filter(~is_target).groupBy("b").agg(
        F.count(F.lit(1)).alias("cs")
    )
    totals = tk.groupBy().agg(
        F.sum(is_target.cast("long")).alias("ctot"),
        F.sum((~is_target).cast("long")).alias("stot"),
    )
    lam = (
        cs.join(ct, "b", "left_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        * (F.col("stot") + B)
                    ).cast("double")
                    / ((F.col("cs") + 1) * (F.col("ctot") + B))
                )
                * 1000000
            )
            .cast("bigint")
            .alias("l"),
        )
    )
    return (
        tk.filter(~is_target)
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("l").cast("bigint").alias("dsir_micro_nats"),
            F.when(F.sum("l") > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("selected"),
        )
    )
