"""bench.py's measurement harness (r11 verdict demerit #2 / item #7):
an absorbed per-attempt exception must surface as a NAMED record —
{"query", "attempt", "error"} — not an anonymous stacktrace in the
artifact's stderr tail. `failures` keeps its meaning (queries with no
successful attempt); a transient whose retry went green gets a timing
AND an attempt_errors record."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_induced_transient_is_named(spark):
    bench = _bench()
    calls = {"n": 0}

    def flaky_query(s, sf_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("induced transient")
        return s.range(3).selectExpr("id AS v")

    def broken_query(s, sf_dir):
        raise ValueError("always broken")

    def good_query(s, sf_dir):
        return s.range(2).selectExpr("id AS v")

    timings, failures, errs = bench.run_pass(
        spark,
        "/root/testdata/sf0.001",
        {"q_flaky": flaky_query, "q_broken": broken_query,
         "q_good": good_query},
    )
    # the transient retried green: timed, NOT a failure, but NAMED
    assert "q_flaky" in timings and "q_flaky" not in failures
    named = [e for e in errs if e["query"] == "q_flaky"]
    assert named == [
        {"query": "q_flaky", "attempt": 0,
         "error": "RuntimeError: induced transient"}
    ]
    # deterministic failure: still a failure (n_failures semantics
    # unchanged), with its attempts named too
    assert "q_broken" in failures and "q_broken" not in timings
    assert failures["q_broken"] == "ValueError: always broken"
    broken = [e for e in errs if e["query"] == "q_broken"]
    assert [e["attempt"] for e in broken] == [0, 1]
    # clean queries contribute nothing to the error record
    assert "q_good" in timings
    assert not [e for e in errs if e["query"] == "q_good"]
