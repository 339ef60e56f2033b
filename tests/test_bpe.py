"""Distributed BPE == sequential reference BPE, merge-for-merge
(llm/bpe.py). The reference implements textbook BPE over the same word-
frequency table with the same (freq DESC, pair ASC) tie-break."""

from __future__ import annotations

from collections import Counter

import duckdb

from iceberg_insert_spark.llm.bpe import (
    BPE_MERGES,
    END_OF_WORD,
    train_bpe,
    word_freq_table,
)
from iceberg_insert_spark.tables import load_table

from .conftest import SF_DIR


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    vocab = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    merges = []
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
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_sequential_reference(spark):
    d = load_table(spark, SF_DIR, "documents")
    got = train_bpe(word_freq_table(d), BPE_MERGES)
    wf = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""SELECT w, COUNT(*) FROM (
                   SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w
                   FROM '{SF_DIR}/documents.parquet') WHERE w != ''
               GROUP BY w"""
        ).fetchall()
    }
    want = _reference_bpe(wf, BPE_MERGES)
    assert got == want


def test_bpe_merges_are_deterministic(spark):
    d = load_table(spark, SF_DIR, "documents")
    a = train_bpe(word_freq_table(d), 4)
    b = train_bpe(word_freq_table(d), 4)
    assert a == b and len(a) == 4


def test_bpe_encode_matches_reference(spark):
    """apply_bpe token counts == encoding every word with the reference
    merge application."""
    from iceberg_insert_spark.llm.bpe import apply_bpe

    d = load_table(spark, SF_DIR, "documents")
    merges = train_bpe(word_freq_table(d), BPE_MERGES)
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in apply_bpe(d, merges).collect()}
    ordered = [(left, right) for _, left, right, _ in sorted(merges)]

    def encode_word(w: str) -> int:
        syms = list(w) + [END_OF_WORD]
        for left, right in ordered:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    for doc_id, text in docs:
        words = [w for w in text.split(" ") if w]
        assert got[doc_id] == (len(words), sum(encode_word(w) for w in words))
    # bounds: at least one token per word, at most chars+1 per word
    # (END_OF_WORD adds one symbol; merges only ever shrink)
    char_bound = {
        doc_id: sum(len(w) + 1 for w in text.split(" ") if w)
        for doc_id, text in docs
    }
    for doc_id, (nw, nt) in got.items():
        assert nw <= nt <= char_bound[doc_id]


def test_merge_pair_overlap_semantics():
    """Left-to-right non-overlapping merge: 'aaa' under (a,a) gives
    [aa, a], never [a, aa] or [aa, aa] — the convention both the trainer
    and encoder must share (and the reference implements identically)."""
    from iceberg_insert_spark.llm.bpe import _merge_pair

    assert _merge_pair(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_pair(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_pair(["x", "a", "a", "y"], "a", "a") == ["x", "aa", "y"]
    assert _merge_pair([], "a", "a") == []
    assert _merge_pair(["a"], "a", "a") == ["a"]


def test_bounded_word_sample_caps_and_preserves_merges(spark):
    """The training-sample bound (BPE_TRAIN_TOP_WORDS): the sample is
    exactly the deterministic top-N by (freq DESC, word ASC), its size is
    capped regardless of corpus vocabulary, and merges trained on a capped
    sample equal the sequential reference trained on the same top-N dict —
    the invariant that makes merge-round cost corpus-size-independent."""
    from iceberg_insert_spark.llm.bpe import bounded_word_sample

    d = load_table(spark, SF_DIR, "documents")
    wf_full = word_freq_table(d)
    n_vocab = wf_full.count()
    top_n = max(3, n_vocab // 10)  # force a real truncation
    sample = bounded_word_sample(wf_full, top_n)
    rows = [(r.word, r.freq) for r in sample.collect()]
    assert len(rows) == top_n < n_vocab

    expected = sorted(
        ((r.word, r.freq) for r in wf_full.collect()),
        key=lambda wv: (-wv[1], wv[0]),
    )[:top_n]
    assert sorted(rows, key=lambda wv: (-wv[1], wv[0])) == expected

    got = train_bpe(sample, 5)
    ref = _reference_bpe(dict(rows), 5)
    assert got == ref
