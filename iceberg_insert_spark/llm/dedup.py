"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2.5).

Tiered like a real pipeline:
  * exact        — hash groupBy on the full text (one shuffle).
  * fingerprint  — see llm/text.q_text_fingerprint (canonical-form md5).
  * n-gram       — exact shingle-Jaccard via shingle self-join (the
                   oracle-checked ground truth for the approximate tiers).
  * minhash LSH  — spark.ml MinHashLSH banding; only bucket-colliding pairs
                   shuffle (the 100 TB path).
  * simhash      — 32-bit bit-vote signature, pure SQL, oracle-checked.
  * embedding    — cosine near-dup pairs over the embeddings table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .vector import cosine

NGRAM_JACCARD_THRESHOLD = 0.5
COSINE_DUP_THRESHOLD = 0.4
SIMHASH_BITS = 32


@query(
    "q_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies, text
    FROM documents
    GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text: keep lowest doc_id per distinct text."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies")
    ).select("doc_id", "n_copies", "text")


def _shingles(d: DataFrame) -> DataFrame:
    """Distinct 3-token shingles per doc; docs with <3 tokens yield none
    (mirrors the oracle's empty range())."""
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    sh = F.expr(
        "transform(sequence(0, greatest(size(t) - 3, -1)),"
        " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
    )
    return (
        toks.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


@query(
    "q_dedup_ngram",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               UNNEST([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN RANGE(1, GREATEST(LEN(t) - 1, 1))]) AS shingle
        FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents)
    ), cnt AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE ROUND(CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common), 6)
          >= {NGRAM_JACCARD_THRESHOLD}
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (>= threshold).

    Shuffle profile: one explode + distinct, a self-join keyed on shingle
    (only docs sharing a shingle ever meet), then a pair-count aggregate.
    This is the exact ground truth; MinHash below approximates it when the
    shingle join gets hot.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(F.round(jac, 6) >= NGRAM_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query("q_dedup_near")
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs — the 100 TB-scale approximation of
    q_dedup_ngram. shingle -> HashingTF (binary, fixed hashing: no vocab fit)
    -> MinHashLSH banding -> bucket join -> Jaccard-distance filter.
    Rows-only check (LSH is probabilistic; seed pinned for determinism)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d).groupBy("doc_id").agg(
        F.collect_list("shingle").alias("shingles")
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feat = tf.transform(sh).filter(F.expr("size(shingles) > 0"))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, 1.0 - NGRAM_JACCARD_THRESHOLD, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_est"),
        )
    )


def _simhash_col() -> F.Column:
    """32-bit SimHash from md5-derived token hashes via per-bit vote.

    Token hash = first 8 hex chars of md5 (engine-portable, unlike xxhash64 /
    DuckDB hash()). Implemented as 32 conditional sums — all JVM expressions.
    """
    h = F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(SIMHASH_BITS)
    ]
    return votes


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM documents
    ), bits AS (
        SELECT doc_id, i,
               CASE WHEN (CAST(('0x' || SUBSTRING(MD5(token), 1, 8)) AS BIGINT)
                          >> i) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM tok, (SELECT UNNEST(RANGE(0, {SIMHASH_BITS})) AS i)
    )
    SELECT doc_id,
           SUM(CASE WHEN bit_sum > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
               AS simhash
    FROM (SELECT doc_id, i, SUM(vote) AS bit_sum FROM bits GROUP BY doc_id, i)
    GROUP BY doc_id
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash signature (distinct-token bit vote).

    Near-dup candidates are then signature pairs within small Hamming
    distance — at scale, band the signature into 4 bytes and join per band
    (same pattern as MinHash LSH). The signature itself is oracle-checked.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    votes = tok.groupBy("doc_id").agg(*_simhash_col())
    sig = sum(
        F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i)).otherwise(
            F.lit(0).cast("long")
        )
        for i in range(SIMHASH_BITS)
    )
    return votes.select("doc_id", sig.alias("simhash"))


@query(
    "q_dedup_embedding",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.e, b.e)
                 / (SQRT(list_dot_product(a.e, a.e))
                    * SQRT(list_dot_product(b.e, b.e))), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e)
          / (SQRT(list_dot_product(a.e, a.e))
             * SQRT(list_dot_product(b.e, b.e))), 6) >= {COSINE_DUP_THRESHOLD}
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact, threshold {0.4}).

    O(n^2) pair scan — correct at validation scale; the LSH variant
    (q_sim_knn_lsh machinery) replaces the cross join at 100 TB.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine("ea", "eb")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(F.round(cos, 6) >= COSINE_DUP_THRESHOLD)
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos_sim"))
    )
