"""Distributed BPE tokenizer induction (SURVEY.md §2.5, round 3).

Training a byte-pair-encoding vocabulary is the canonical *iterative*
corpus job in an LLM data pipeline (the tokenizer itself is trained on the
data before the model is). The scale-correct shape, used here:

  1. Collapse the corpus to its WORD-FREQUENCY table first — one shuffle.
     BPE statistics depend only on (distinct word, count), and the distinct
     vocabulary is orders of magnitude smaller than the corpus (Heaps'
     law), so every later step runs on the compressed table, never the
     raw text. This is exactly how sequential BPE trainers work; at
     100 TB the distinct-word table itself can be billions of rows.
  2. Take the deterministic top-``BPE_TRAIN_TOP_WORDS`` sample in the
     same distributed pass (per-partition top-N heaps, one O(top_n)
     driver merge) and run the merge rounds on the DRIVER over that
     bounded sample (r13; the rounds previously paid 3 Spark jobs each
     to iterate a table whose size is independent of the corpus). Each
     round is O(sample) work; only step 1 ever sees the corpus.

Determinism: the argmax orders by (frequency DESC, pair ASC) — a total
order, so the merge sequence is reproducible and equals the sequential
reference implementation merge-for-merge (tests/test_bpe.py).

Rows-only: iterative algorithms are not SQL-expressible; parity is pinned
against a pure-python reference BPE instead — a stronger check than a
rows-only count, the same strategy as connected_components' union-find
oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tiny_df

from ..registry import query
from ..tables import load_table

BPE_MERGES = 10
END_OF_WORD = "</w>"

# Training-sample bound: BPE statistics are learned from the TOP-N words by
# frequency, not the unbounded distinct vocabulary. Real tokenizers train
# on samples (GPT-2's BPE saw ~40 GB, not the web; SentencePiece defaults
# to a 10M-sentence sample) because tail words contribute ~nothing to merge
# counts while dominating vocabulary size at corpus scale (Heaps' law). The
# cap makes every per-round quantity — the symbol table, the pair-count
# shuffle, the rewrite — O(BPE_TRAIN_TOP_WORDS), EXPLICITLY independent of
# corpus size: at 100 TB only the one word_freq_table shuffle sees the
# corpus; the merge loop's driver round-trips run on a bounded table
# whatever the input. Deterministic: ties at the cut order (freq DESC,
# word ASC) — a total order, so the sample (and thus the merge sequence)
# is a pure function of the corpus.
BPE_TRAIN_TOP_WORDS = 50_000

def _merge_pair(arr: list[str], left: str, right: str) -> list[str]:
    """Left-to-right single-pass merge of adjacent (left, right) into one
    symbol — THE merge semantics, shared by the trainer's rewrite and the
    encoder so they cannot diverge."""
    merged: list[str] = []
    i = 0
    while i < len(arr):
        if i + 1 < len(arr) and arr[i] == left and arr[i + 1] == right:
            merged.append(left + right)
            i += 2
        else:
            merged.append(arr[i])
            i += 1
    return merged



def word_freq_table(d: DataFrame) -> DataFrame:
    """(word, freq) over whitespace tokens — the compressed training set."""
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bounded_word_sample(
    words: DataFrame, top_n: int = BPE_TRAIN_TOP_WORDS
) -> DataFrame:
    """Deterministic top-N training sample of a (word, freq) table — see
    BPE_TRAIN_TOP_WORDS. orderBy+limit plans as TakeOrderedAndProject
    (per-partition top-N heaps, one O(top_n) merge), never a global sort
    materialization."""
    return words.orderBy(F.desc("freq"), F.asc("word")).limit(top_n)





def train_bpe(
    words: DataFrame,
    n_merges: int = BPE_MERGES,
    top_n: int = BPE_TRAIN_TOP_WORDS,
) -> list[tuple[int, str, str, int]]:
    """Run ``n_merges`` BPE rounds over a (word, freq) table; returns
    [(rank, left, right, pair_freq_at_merge_time)].

    Cost shape (r13 optimization, guide §1.2 — pick the right
    distributed algorithm): ONE corpus-scale Spark job takes the
    deterministic top-``BPE_TRAIN_TOP_WORDS`` sample
    (TakeOrderedAndProject — per-partition heaps, an O(top_n) driver
    merge), then the merge rounds run on the driver over that BOUNDED
    sample — which is how sequential BPE trainers work, and what the
    sample cap was for. The previous shape ran 3 Spark jobs per round
    (pair-count argmax + checkpointed rewrite) over the same ≤50k-row
    table; ~30 driver round-trips to iterate a sample whose size is
    independent of the corpus. Merge-for-merge IDENTICAL output: the
    driver loop counts the same freq-weighted adjacent pairs with the
    same (freq DESC, pair ASC) tie-break and the same ``_merge_pair``
    rewrite (pinned by tests/test_bpe.py's sequential-reference
    parity)."""
    from collections import Counter

    rows = bounded_word_sample(words, top_n).collect()
    vocab: dict[tuple, int] = {}
    for r in rows:
        syms = tuple(list(r["word"]) + [END_OF_WORD])
        vocab[syms] = vocab.get(syms, 0) + r["freq"]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, n))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out = tuple(_merge_pair(list(syms), left, right))
            new_vocab[out] = new_vocab.get(out, 0) + f
        vocab = new_vocab
    return merges


# train_bpe is a deterministic pure function of the corpus, so the merge
# table is memoized per (sf_dir, n_merges) — q_text_bpe_merges and
# q_text_bpe_encode share one training run instead of re-iterating (same
# rationale as tables.load_table's plan cache).
_MERGE_CACHE: dict[tuple[str, int], list[tuple[int, str, str, int]]] = {}


def _merges_for(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> list[tuple[int, str, str, int]]:
    key = (sf_dir, n_merges)
    if key not in _MERGE_CACHE:
        d = load_table(spark, sf_dir, "documents")
        # train_bpe bounds its own sample (the bound is part of the
        # model's definition) — no pre-bounding here, or the sort
        # stage would run twice (review catch)
        _MERGE_CACHE[key] = train_bpe(word_freq_table(d), n_merges)
    return _MERGE_CACHE[key]


@query("q_text_bpe_merges")
def q_text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE_MERGES (10) BPE merges learned from the corpus — the
    tokenizer-induction operator. Output: merge rank, the merged pair, and
    the pair's frequency when it won. Rows-only (iterative); the merge
    sequence is pinned merge-for-merge against a sequential pure-python
    BPE in tests/test_bpe.py."""
    merges = _merges_for(spark, sf_dir)
    return tiny_df(spark, 
        merges, "rank long, left string, right string, pair_freq long"
    )


def apply_bpe(
    d: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Tokenize documents with a learned merge table: per word, apply the
    merges in rank order (textbook BPE encoding). The merge table is a
    broadcast closure (tokenizers are KBs); per-batch memoization makes
    the per-word cost amortize to O(1) for repeated words — which is most
    of them, by the same Heaps-law argument the trainer exploits.

    Returns (doc_id, n_words, n_bpe_tokens) — Arrow-batched, no shuffle.
    """
    ordered = [(left, right) for _, left, right, _ in sorted(merges)]

    def encode(batches):
        for pdf in batches:
            memo: dict[str, int] = {}

            def word_tokens(w: str) -> int:
                got = memo.get(w)
                if got is not None:
                    return got
                syms = list(w) + [END_OF_WORD]
                for left, right in ordered:
                    syms = _merge_pair(syms, left, right)
                memo[w] = len(syms)
                return len(syms)

            n_words, n_tokens = [], []
            for text in pdf["text"]:
                words = [w for w in text.split(" ") if w]
                n_words.append(len(words))
                n_tokens.append(sum(word_tokens(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_bpe_tokens": n_tokens,
                }
            )

    return d.select("doc_id", "text").mapInPandas(
        encode, schema="doc_id long, n_words long, n_bpe_tokens long"
    )


@query("q_text_bpe_encode")
def q_text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE: learn BPE_MERGES (10) merges from the corpus,
    then tokenize every document with them — per doc, whitespace word
    count vs BPE token count (the pipeline's real token accounting, used
    for packing budgets and mixture math once a tokenizer exists).
    Rows-only (iterative training upstream); the encode step is pinned
    against a reference implementation in tests/test_bpe.py."""
    d = load_table(spark, sf_dir, "documents")
    return apply_bpe(d, _merges_for(spark, sf_dir))
