"""Targeted semantics for the sampling + fuzzy-join text operators.

The oracle gate (test_oracle.py) proves engine parity on the fixture; these
tests pin the ALGORITHMIC claims: the symmetric-delete blocking loses no
pair the exhaustive compare finds (on a crafted vocabulary with every edit
class), and the weighted sample's keep rule is the documented exact integer
function of (key, weight).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from iceberg_insert_spark.llm.text import WSAMPLE_CAP, WSAMPLE_PPM_MULT
from iceberg_insert_spark.registry import get_queries

from .conftest import SF_DIR

QUERIES = get_queries()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_complete_vs_bruteforce(spark, tmp_path):
    """Crafted vocabulary exercising every edit class within distance 2 —
    substitution, insertion, deletion, double-substitution, transposition
    (= 2 substitutions for levenshtein), length-1/2 tokens, repeated
    characters — plus pairs at distance 3+ that must NOT appear. The
    blocked result must equal the exhaustive O(V^2) compare exactly."""
    words = [
        "cat", "cut", "cart", "at", "a", "ab", "ba", "scan", "scans",
        "aaaa", "aaab", "abba", "join", "jion", "windmill", "table",
    ]
    docs = spark.createDataFrame(
        [(i, w, "en", "src", len(w)) for i, w in enumerate(words)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = {
        (r.token_a, r.token_b, r.dist)
        for r in QUERIES["q_text_fuzzy_join"](spark, sf).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for a in words
        for b in words
        if a < b and _lev(a, b) <= 2
    }
    assert got == want
    # sanity: the crafted set really exercises distances 1 and 2
    assert {d for (_, _, d) in want} == {1, 2}


def test_weighted_sample_rule_exact_and_cap(spark):
    """Re-derive the keep decision per doc in Python (md5 + one integer
    cross-multiplication) and demand the query selected exactly that set;
    docs at/above the weight cap are always kept and carry pi_ppm == 1e6."""
    out = QUERIES["q_docs_weighted_sample"](spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }

    def kept(doc_id: int, w: int) -> bool:
        u16 = int(
            hashlib.md5(f"{doc_id}#wsample".encode()).hexdigest()[:4], 16
        )
        return u16 * WSAMPLE_CAP < w * 65536

    want = {d for d, w in docs.items() if kept(d, w)}
    assert {r.doc_id for r in out} == want
    assert any(w >= WSAMPLE_CAP for w in docs.values())
    for r in out:
        assert r.pi_ppm == min(10**6, r.n_chars * WSAMPLE_PPM_MULT)
        if r.n_chars >= WSAMPLE_CAP:
            assert r.pi_ppm == 10**6
    # every at-or-above-cap doc is in the sample (pi == 1)
    assert all(d in want for d, w in docs.items() if w >= WSAMPLE_CAP)


def test_fuzzy_join_plan_is_blocked_not_crossjoin(spark):
    """The physical plan must join on the blocking key — no cartesian
    product anywhere (the O(V^2) shape the operator exists to avoid)."""
    plan = (
        QUERIES["q_text_fuzzy_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_search_edges_vs_python(spark, tmp_path):
    """Crafted corpus: phrase at token 0, at the very end, repeated
    back-to-back occurrences, terms present but never adjacent, reversed
    order, and a doc with no terms at all — counts and first positions
    must match a serial Python scan."""
    from iceberg_insert_spark.llm.text import PHRASE

    a, b = PHRASE
    texts = [
        f"{a} {b} tail words here",            # at start
        f"lead words {a} {b}",                 # at end
        f"{a} {b} {a} {b} {a} {b}",            # back-to-back repeats
        f"{a} x {b} {a} y {b}",                # present, never adjacent
        f"{b} {a} {b} {a}",                    # reversed pairs; one fwd hit inside
        "nothing relevant at all",
        f"{a}",                                # lone first term
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in QUERIES["q_text_phrase_search"](spark, sf).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        ps = [
            j
            for j in range(len(toks) - 1)
            if toks[j] == a and toks[j + 1] == b
        ]
        if ps:
            want[i] = (len(ps), ps[0])
    assert got == want
    assert want == {0: (1, 0), 1: (1, 2), 2: (3, 0), 4: (1, 1)}


def _symdelete_py(w: str) -> set:
    """Python mirror of text.symdelete_keys: identity + 1- and 2-char
    deletions."""
    keys = {w}
    for i in range(len(w)):
        keys.add(w[:i] + w[i + 1:])
    for j in range(1, len(w)):
        for i in range(j):
            keys.add(w[:i] + w[i + 1:j] + w[j + 1:])
    return keys


def test_symdelete_guarantee_property():
    """The SymSpell completeness guarantee, property-tested in pure
    Python: for ANY pair within levenshtein distance 2, the deletion-key
    sets intersect (so the blocked join can never lose a true pair)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abc", min_size=1, max_size=7)

    @given(a=words, b=words)
    @settings(max_examples=500, deadline=None)
    def check(a, b):
        if _lev(a, b) <= 2:
            assert _symdelete_py(a) & _symdelete_py(b), (a, b)

    check()


def test_symdelete_spark_expression_matches_python(spark):
    """Expression parity: the JVM-side symdelete_keys column must emit
    exactly the Python mirror's key set for a vocab covering length-1,
    repeated-char, and longer tokens."""
    from iceberg_insert_spark.llm.text import symdelete_keys

    words = ["a", "ab", "aab", "abba", "query", "windmill", "zz"]
    df = spark.createDataFrame([(w,) for w in words], "token string")
    got = {
        r.token: set(r.keys)
        for r in df.select(
            "token", symdelete_keys("token").alias("keys")
        ).collect()
    }
    assert got == {w: _symdelete_py(w) for w in words}


def test_repetition_gates_flag_planted_loops(spark, tmp_path):
    """q_text_repetition_gates semantics on crafted docs: a healthy doc
    passes, a one-bigram loop and a repeated-sentence doc are flagged,
    signals are exact integers, and the plan is SHUFFLE-FREE (the
    top-bigram mode count folds row-locally over the sorted array —
    no explode/groupBy exchange)."""
    import os

    from iceberg_insert_spark.llm.quality import q_text_repetition_gates

    docs = spark.createDataFrame(
        [
            # healthy: 30 distinct words -> top-bigram share 1/29,
            # dup signals 0 (the gate composes AFTER gopher's 30-word
            # length floor — a 6-word doc trivially has top share 1/5)
            (1, " ".join(f"w{i}" for i in range(30)), "en", "s", 30),
            # one-bigram loop: "spam ham" repeated -> top bigram share
            # huge, dup words huge
            (2, " ".join(["spam", "ham"] * 20), "en", "s", 40),
            # repeated sentence -> duplicate trigrams dominate
            (3, " ".join(["the cat sat on the mat"] * 8), "en", "s", 48),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    rows = {r.doc_id: r for r in q_text_repetition_gates(spark, d).collect()}
    assert rows[1].repetitive == 0
    assert (
        rows[1].dup_word_ppm == 0
        and rows[1].dup_trigram_ppm == 0
    )
    assert rows[2].repetitive == 1
    # "ham spam" x19 + "spam ham" x20 over 39 bigrams -> top = 20
    assert rows[2].top_bigram_ppm == 20 * 1_000_000 // 39
    assert rows[3].repetitive == 1
    assert rows[3].dup_trigram_ppm > 500_000
    # plan pin: zero Exchange nodes
    plan = q_text_repetition_gates(spark, d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fuzzy_decontamination_planted(spark, tmp_path):
    """Planted-contamination semantics for the 13-gram overlap tier: a
    near-copy of a benchmark doc scores high ppm and flags; a doc
    quoting ONE benchmark line scores low and passes; clean and
    too-short docs behave per contract. The fixture plants doc ids on
    the % 50 == 0 grid so the query's eval/train split applies."""
    import shutil

    words = [f"w{i}" for i in range(40)]
    bench = " ".join(words)  # doc 0: the benchmark (eval side)
    near_copy = " ".join(words[:36] + ["zzz", "yyy", "xxx", "qqq"])
    # 24 of near_copy's 28 windows hit (positions 1..24 of 36-13+1... )
    one_quote = " ".join(
        ["a%d" % i for i in range(30)] + words[:13] + ["b%d" % i for i in range(30)]
    )
    clean = " ".join("c%d" % i for i in range(40))
    short = "tiny doc"
    df = spark.createDataFrame(
        [
            (0, bench),
            (1, near_copy),
            (2, one_quote),
            (3, clean),
            (4, short),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    shutil.os.makedirs(sf)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {
        r.train_doc_id: r
        for r in QUERIES["q_text_decontaminate_fuzzy"](spark, sf).collect()
    }
    assert set(out) == {1, 2, 3}  # eval doc 0 and 8-token doc 4 absent
    # near-copy: 40 tokens -> 28 windows; the 24 windows fully inside
    # the copied 36-word prefix hit (36-13+1), the 4 crossing into the
    # junk tail don't
    nc = out[1]
    assert nc.n_grams == 28 and nc.n_hits == 24
    assert nc.overlap_ppm == 24 * 1_000_000 // 28
    assert nc.contaminated == 1
    # one quoted line: 73 tokens -> 61 windows, exactly 1 hit (only the
    # window aligned on the quoted 13 words)
    q = out[2]
    assert q.n_grams == 61 and q.n_hits == 1
    assert q.overlap_ppm == 1_000_000 // 61 and q.contaminated == 0
    # clean: zero hits
    c = out[3]
    assert c.n_hits == 0 and c.overlap_ppm == 0 and c.contaminated == 0


def test_dsir_selection_planted(spark, tmp_path):
    """Planted DSIR semantics: source docs written in the TARGET
    domain's vocabulary score positive importance (selected), docs in
    a disjoint vocabulary score negative (rejected), and a mixed doc
    sits between the two. Target = the doc_id % 50 grid."""
    import shutil

    target_vocab = " ".join(["alpha", "beta", "gamma", "delta"] * 10)
    source_like_target = " ".join(["alpha", "beta", "gamma"] * 12)
    source_other = " ".join(["xray", "york", "zulu", "quux"] * 12)
    source_mixed = " ".join(["alpha", "xray"] * 18)
    df = spark.createDataFrame(
        [
            (0, target_vocab),     # target grid
            (50, target_vocab),    # target grid
            (1, source_like_target),
            (2, source_other),
            (3, source_mixed),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    shutil.os.makedirs(sf)
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    out = {
        r.doc_id: r
        for r in QUERIES["q_docs_dsir"](spark, sf).collect()
    }
    assert set(out) == {1, 2, 3}  # target docs never scored
    assert out[1].selected == 1 and out[1].dsir_micro_nats > 0
    assert out[2].selected == 0 and out[2].dsir_micro_nats < 0
    assert (
        out[2].dsir_micro_nats
        < out[3].dsir_micro_nats
        < out[1].dsir_micro_nats
    )
    assert out[1].n_tokens == 36
