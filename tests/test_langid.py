"""Language-ID operator: holdout accuracy on a corpus with REAL
per-language character signal, exact python-parity of the Spark scoring
path, and determinism of the registered query.

The fixture documents' ``lang`` labels are uncorrelated with their text
(generator artifact — measured holdout NB 21% vs 43% majority), so
accuracy is proven here on a planted corpus instead; q_text_langid's
confusion matrix over the fixture is pinned for determinism only.
"""

import random

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.llm.langid import (
    langid_predict,
    langid_score_py,
    q_text_langid_nb,
    train_langid,
)

from .conftest import SF_DIR

# word pools with the character distributions a real corpus has —
# stopword-grade function words, language-distinctive letters/diacritics
_POOLS = {
    "en": ("the and of to in is was for with that have this from "
           "they would there what about which when make like").split(),
    "fr": ("le la les et de un une dans est pour que qui avec sur "
           "pas vous nous sont été très où même après français").split(),
    "de": ("der die das und ist nicht mit ein zu von sich auch auf "
           "für wird bei durch über müssen können straße größe").split(),
    "es": ("el la los de y que en un ser por con para como más "
           "pero sus está años también después señor niño").split(),
    "zh": list("的是不了在人有我他这中大来上国个到说们为子和你"),
}


def _planted_corpus(n_per_lang=60, seed=7):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, pool in sorted(_POOLS.items()):
        for _ in range(n_per_lang):
            n = rng.randint(25, 60)
            sep = "" if lang == "zh" else " "
            rows.append((i, sep.join(rng.choice(pool) for _ in range(n)), lang))
            i += 1
    rng.shuffle(rows)
    return rows


def test_langid_holdout_accuracy_on_planted_corpus(spark):
    """Train on 80%, score the held-out 20%: >= 95% accuracy on five
    languages with genuine character-level signal (the CCNet/fastText
    operating regime). Also pins that training is deterministic under
    repartitioning (total-order vocab + tie-breaks)."""
    rows = _planted_corpus()
    split = int(len(rows) * 0.8)
    train_df = spark.createDataFrame(
        rows[:split], "doc_id long, text string, lang string"
    )
    test_df = spark.createDataFrame(
        rows[split:], "doc_id long, text string, lang string"
    )
    model = train_langid(train_df)
    model2 = train_langid(train_df.repartition(13))
    assert model == model2  # partitioning-independent fit
    scored = langid_predict(test_df, model).collect()
    acc = sum(1 for r in scored if r.lang_pred == r.lang) / len(scored)
    assert acc >= 0.95, f"holdout accuracy {acc:.2%}"


def test_langid_spark_scoring_matches_python_exactly(spark):
    """The Arrow-batched scorer and the pure-python reference agree on
    every row — including OOV-heavy and empty/degenerate texts."""
    rows = _planted_corpus(n_per_lang=20, seed=11)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    model = train_langid(df)
    tricky = spark.createDataFrame(
        [
            (1000, "zzz qqq xxx 12345 @@@@", "en"),
            (1001, "", "en"),
            (1002, "a", "en"),
            (1003, "der die das le la les the of 的是", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    probe = df.unionByName(tricky)
    got = {
        r.doc_id: r.lang_pred
        for r in langid_predict(probe, model).collect()
    }
    for doc_id, text, _ in rows + [
        (1000, "zzz qqq xxx 12345 @@@@", "en"),
        (1001, "", "en"),
        (1002, "a", "en"),
        (1003, "der die das le la les the of 的是", "en"),
    ]:
        assert got[doc_id] == langid_score_py(text, model), doc_id


def test_q_text_langid_nb_deterministic_and_total(spark):
    """The registered query returns a full partition of the corpus
    (counts sum to |documents|) and is run-to-run deterministic."""
    a = q_text_langid_nb(spark, SF_DIR).collect()
    b = q_text_langid_nb(spark, SF_DIR).collect()
    assert a == b
    total = sum(r.n_docs for r in a)
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert total == n_docs
    langs = {r.lang for r in a}
    assert langs == {"en", "fr", "de", "es", "zh"}
