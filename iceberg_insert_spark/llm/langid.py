"""Language identification — char-ngram naive Bayes (SURVEY.md §2.5).

The one standard curation-stack primitive (the trained model behind q_text_langid's
heuristic placeholder — the CCNet/fastText slot:
Wenzek et al. 2020 use fastText langid as stage one; Joulin et al. 2016
show char-ngram linear models are the right tool) that had no operator:
every production pipeline DERIVES the language column, it never arrives
as truth. The reference has no analogue (ingest-only, App.java:51-158).

Model: multinomial naive Bayes over character trigrams with Laplace
smoothing, restricted to the top-K trigrams by corpus frequency
(deterministic tie-break), out-of-vocabulary grams ignored. Training is
one distributed counting pass — Arrow-batched partial Counters per
partition, one (label, gram) shuffle with map-side combine, a top-K
vocab pick, and a bounded K x |labels| collect; the fitted model is a
small plain dict broadcast into an Arrow-batched scoring UDF. At 100 TB
the train pass is a single map-side-combined aggregation and scoring is
embarrassingly parallel.

Honesty note, pinned by measurement: the fixture corpus's ``lang``
column is uncorrelated with its text (the generator drew labels and
token-soup independently — a held-out NB scores 21% where the majority
class alone gives 43%), so ``q_text_langid_nb`` reports the DETERMINISTIC
train-set confusion matrix, not an accuracy claim; the operator's
actual discrimination is proven in pytest on a planted corpus with real
per-language character signal (>= 95% holdout accuracy), plus an exact
python-parity pin on the Spark scoring path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

LANGID_NGRAM = 3
LANGID_VOCAB = 2000
# chars of each doc that participate (train AND score — the cap is part
# of the model definition, so parity holds)
LANGID_MAX_CHARS = 1000


def _grams(text: str) -> list[str]:
    """Char trigrams over a space-padded, length-capped document."""
    t = " " + (text or "")[:LANGID_MAX_CHARS] + " "
    n = LANGID_NGRAM
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def train_langid(
    df: DataFrame, text_col: str = "text", label_col: str = "lang"
) -> dict:
    """Fit the NB model distributedly; returns a plain-dict model:
    ``{"priors": {label: log_prior}, "logp": {label: {gram: logp}},
    "floor": {label: logp_unseen_in_vocab}}``. Vocabulary is the
    global top-``LANGID_VOCAB`` trigrams (count desc, gram asc — a
    total order, so the model is deterministic under any partitioning).
    """

    def _count(batches):
        from collections import Counter, defaultdict

        import pandas as pd

        for pdf in batches:
            # one Counter PER LABEL and C-level Counter.update over the
            # whole gram list (r12 optimization, guide §4.2): the
            # per-gram python loop built a (lab, gram) tuple and dict
            # probe per occurrence; update() counts the same list in C.
            # Counts are exact integers either way — output identical.
            per_lab: dict = defaultdict(Counter)
            docs: Counter = Counter()
            for txt, lab in zip(pdf[text_col], pdf[label_col]):
                if lab is None:
                    continue
                # per-doc marker under the empty gram (no real trigram
                # has length 0): doc counts ride the SAME counting pass
                docs[lab] += 1
                per_lab[lab].update(_grams(txt))
            if docs:
                rows = [(lab, "", docs[lab]) for lab in docs]
                rows += [
                    (lab, g, c)
                    for lab, ctr in per_lab.items()
                    for g, c in ctr.items()
                ]
                labs, grams, counts = zip(*rows)
                yield pd.DataFrame(
                    {"lab": labs, "gram": grams, "c": counts}
                )

    # ONE distributed pass, persisted across the three bounded
    # consumers below (review catch: unpersisted, the full Arrow
    # counting pass re-ran per action — 2-3x the advertised cost)
    counts = (
        df.select(text_col, label_col)
        .mapInPandas(_count, "lab string, gram string, c long")
        .groupBy("lab", "gram")
        .agg(F.sum("c").alias("c"))
        .persist()
    )
    try:
        # global top-K vocabulary, total order (count desc, gram asc);
        # the "" doc markers are bookkeeping, never vocabulary
        vocab_rows = (
            counts.filter(F.col("gram") != "")
            .groupBy("gram")
            .agg(F.sum("c").alias("tc"))
            .orderBy(F.desc("tc"), F.asc("gram"))
            .limit(LANGID_VOCAB)
            .collect()
        )
        vocab = {r["gram"] for r in vocab_rows}
        if not vocab:
            raise ValueError("empty training corpus")
        in_vocab = counts.filter(
            F.col("gram").isin(list(vocab))
        ).collect()
        doc_counts = {
            r["lab"]: r["c"]
            for r in counts.filter(F.col("gram") == "").collect()
        }
    finally:
        counts.unpersist()
    n_docs = sum(doc_counts.values())
    by_lab: dict[str, dict[str, int]] = {}
    for r in in_vocab:
        by_lab.setdefault(r["lab"], {})[r["gram"]] = r["c"]
    k = len(vocab)
    model: dict = {"priors": {}, "logp": {}, "floor": {}}
    for lab, n in sorted(doc_counts.items()):
        grams = by_lab.get(lab, {})
        tot = sum(grams.values())
        model["priors"][lab] = math.log(n / n_docs)
        model["logp"][lab] = {
            g: math.log((c + 1) / (tot + k)) for g, c in grams.items()
        }
        model["floor"][lab] = math.log(1 / (tot + k))
    return model


def langid_score_py(text: str, model: dict) -> str:
    """Pure-python reference scorer — the parity pin for the Spark
    path. OOV grams (outside the top-K vocabulary) are ignored; grams
    in vocabulary but unseen for a label score the Laplace floor.
    Ties break by label order (sorted), so prediction is total."""
    vocab = set().union(*(model["logp"][lb] for lb in model["logp"]))
    best = None
    for lab in sorted(model["priors"]):
        s = model["priors"][lab]
        lp = model["logp"][lab]
        floor = model["floor"][lab]
        for g in _grams(text):
            if g in lp:
                s += lp[g]
            elif g in vocab:
                s += floor
        if best is None or s > best[0] + 1e-12:
            best = (s, lab)
    return best[1]


def langid_predict(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Score every row with the broadcast model — one Arrow-batched
    pandas_udf (chars -> trigrams -> log-prob argmax is genuinely not
    expressible as JVM column ops at this vocab size); the model dict
    rides the closure like the dedup/bloom broadcasts. Row-local: no
    shuffle, scales linearly."""
    import numpy as np

    labs = sorted(model["priors"])
    vocab = set().union(*(model["logp"][lb] for lb in labs))
    # Per-gram LABEL VECTOR lookup table (r12 optimization, guide §4.2
    # — vectorize inside the UDF): one dict probe + one |labs|-wide
    # numpy add per gram instead of |labs| dict probes and scalar adds
    # (measured 2.1x on the scoring stage). BIT-EXACT vs the per-label
    # python reference (langid_score_py): each vector component is the
    # same IEEE double added in the same sequential gram order, so the
    # scores — not just the argmax — are unchanged (the parity pin in
    # tests/test_langid.py holds bit-for-bit).
    # gram -> ROW INDEX into one (|vocab|, |labs|) matrix (r13: the
    # r12 per-gram numpy add still paid one tiny ufunc call per gram;
    # gathering the rows and summing them with a single C-level
    # cumsum is ~10x on the scoring core). BIT-EXACT vs the per-label
    # python reference (langid_score_py): np.cumsum accumulates
    # sequentially, so each label column performs the same IEEE
    # doubles added in the same left-to-right gram order — prepending
    # the prior row reproduces `tot = priors; tot += gram...` exactly
    # (the parity pin in tests/test_langid.py holds bit-for-bit).
    gram_ix = {g: i for i, g in enumerate(vocab)}
    lut_m = np.empty((len(gram_ix), len(labs)), dtype=np.float64)
    for g, i in gram_ix.items():
        lut_m[i] = [
            model["logp"][lb].get(g, model["floor"][lb]) for lb in labs
        ]
    pri_vec = np.array([model["priors"][lb] for lb in labs])

    @F.pandas_udf("string")
    def _score(texts):
        import pandas as pd

        out = []
        get = gram_ix.get
        for t in texts:
            ix = [
                i
                for i in map(get, _grams(t))
                if i is not None
            ]
            if ix:
                tot = np.vstack(
                    (pri_vec[None, :], lut_m[ix])
                ).cumsum(axis=0)[-1]
            else:
                tot = pri_vec
            best = None
            for i, lab in enumerate(labs):
                s = tot[i]
                if best is None or s > best[0] + 1e-12:
                    best = (s, lab)
            out.append(best[1])
        return pd.Series(out)

    return df.withColumn(out_col, _score(F.col(text_col)))


@query("q_text_langid_nb")
def q_text_langid_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID over the documents corpus, rows-only (float
    log-prob argmax; no SQL twin): train the char-trigram NB on the
    labeled corpus, score every document with the Arrow-batched path,
    and return the (lang, lang_pred) confusion counts. Deterministic —
    hash-free training, total-order vocabulary and tie-breaks — so the
    row count and values are stable across runs and partitionings.

    The fixture's ``lang`` labels are uncorrelated with its text (the
    corpus generator drew them independently; measured holdout NB 21%
    vs 43% majority), so this matrix documents self-consistency of the
    fitted model, not accuracy; real discrimination is pinned in
    tests/test_langid.py on a planted corpus (>= 95% holdout).
    """
    docs = load_table(spark, sf_dir, "documents").select("text", "lang")
    model = train_langid(docs)
    return (
        langid_predict(docs, model)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )
