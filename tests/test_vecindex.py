"""Persisted IVF-PQ vector index: lifecycle, pruning, and quality.

The oracled end-to-end checks live in the registry (q_vecindex_build /
q_vecindex_incremental via test_oracle.py); these tests pin the
mechanics the hashes can't see — planted-neighbor retrieval, planner
file pruning, quantizer immutability across refreshes, and the
build-required / exactly-once contracts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_insert_spark.llm import vecindex as V
from iceberg_insert_spark.sources.snapshots import SnapshotTable


def _mk_src(spark, tmp_path, vecs):
    src = SnapshotTable(str(tmp_path / "src"))
    rows = [(i, i % 3, [float(x) for x in v]) for i, v in enumerate(vecs)]
    src.append(
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>"
        )
    )
    return src


def _clustered_vectors(n_clusters=6, per=40, d=16, planted=True):
    """Deterministic clustered corpus: vec 0 gets a planted
    near-duplicate (vec 1) that exact cosine must rank #1."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, d) * 4.0
    vecs = []
    for c in range(n_clusters):
        vecs.extend(centers[c] + rng.randn(per, d) * 0.3)
    vecs = np.asarray(vecs)
    if planted:
        vecs[1] = vecs[0] + 1e-3  # near-duplicate of vec 0
    return vecs


def test_planted_neighbor_retrieved(spark, tmp_path):
    """The planted near-duplicate of probe 0 must come back rank 1:
    a broken LUT, a wrong residual, or a bad cell join would lose it."""
    src = _mk_src(spark, tmp_path, _clustered_vectors())
    V.build_vector_index(spark, src, str(tmp_path / "idx"))
    got = (
        V.query_vector_index(spark, str(tmp_path / "idx"), src)
        .filter((F.col("probe_id") == 0) & (F.col("rn") == 1))
        .collect()
    )
    assert len(got) == 1 and got[0].cand_id == 1
    assert got[0].cos_sim > 0.999


def test_probe_reads_fewer_files_than_index_holds(spark, tmp_path):
    """The inverted lists are FILES: an nprobe plan must open a strict
    subset — the scale claim, measured from metadata alone."""
    src = _mk_src(spark, tmp_path, _clustered_vectors())
    idx = V.build_vector_index(spark, src, str(tmp_path / "idx"))
    kept, total = idx.plan_files(
        isin=("cell", list(range(V.VI_NPROBE)))
    )
    assert total > V.VI_NPROBE // 2  # hash write: ~1 file per cell
    assert 0 < len(kept) < total


def test_refresh_is_delta_only_and_exactly_once(spark, tmp_path):
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs[:150])
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    assert V.indexed_through(idx) == src.snapshots()[-1]
    rows = [
        (150 + i, 0, [float(x) for x in v])
        for i, v in enumerate(vecs[150:])
    ]
    src.append(
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>"
        )
    )
    v1 = V.refresh_vector_index(spark, src, path)
    v2 = V.refresh_vector_index(spark, src, path)  # replay: no-op
    assert v1 == v2 == src._latest_published()
    assert len(idx.snapshots()) == 2
    assert idx.read(spark).count() == len(vecs)
    # the delta commit holds exactly the appended ids
    delta_ids = {
        r.vec_id
        for r in idx.read(spark).join(
            idx.read(spark, as_of=idx.snapshots()[0]),
            "vec_id",
            "left_anti",
        ).collect()
    }
    assert delta_ids == {150 + i for i in range(len(vecs) - 150)}


def test_quantizer_frozen_across_refresh(spark, tmp_path):
    """Refresh must encode with the PERSISTED quantizer — the sidecar
    bytes are identical before and after (train-once contract)."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs[:150])
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    epoch = V._build_epoch(idx)
    before = open(V._quantizer_path(path, epoch)).read()
    rows = [
        (150 + i, 0, [float(x) for x in v])
        for i, v in enumerate(vecs[150:])
    ]
    src.append(
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>"
        )
    )
    V.refresh_vector_index(spark, src, path)
    assert V._build_epoch(idx) == epoch  # refresh never moves epochs
    assert open(V._quantizer_path(path, epoch)).read() == before
    q = json.loads(before)
    assert len(q["cells"]) == V.VI_CELLS
    assert len(q["books"]) == V.VI_PQ_M


def test_rebuild_replaces_codes_and_flips_epoch(spark, tmp_path):
    """The documented recovery after an overwrite-shaped source
    history: rebuild on the SAME path must atomically REPLACE the old
    codes (no duplicate vec_ids — review catch: an append-shaped
    build doubled every row) and pair readers with the new epoch's
    quantizer; the old epoch's sidecar stays immutable on disk."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    e1 = V._build_epoch(idx)
    src.overwrite(
        spark.createDataFrame(
            [(i, i % 3, [float(x) for x in v]) for i, v in enumerate(vecs[:100])],
            "vec_id long, label int, embedding array<double>",
        )
    )
    with pytest.raises(ValueError):
        V.refresh_vector_index(spark, src, path)  # crosses overwrite
    idx = V.build_vector_index(spark, src, path)
    e2 = V._build_epoch(idx)
    assert e2 > e1
    got = idx.read(spark)
    assert got.count() == 100
    assert got.select("vec_id").distinct().count() == 100  # no dups
    assert os.path.exists(V._quantizer_path(path, e1))  # immutable
    # queries resolve the NEW epoch's quantizer and still retrieve
    top = (
        V.query_vector_index(spark, path, src)
        .filter(F.col("rn") == 1)
        .count()
    )
    assert top == min(10, 100)  # one rank-1 hit per probe


def test_refresh_requires_build(spark, tmp_path):
    src = _mk_src(spark, tmp_path, _clustered_vectors(planted=False))
    with pytest.raises(ValueError, match="build_vector_index first"):
        V.refresh_vector_index(spark, src, str(tmp_path / "nope"))


def test_bad_dim_refuses(spark, tmp_path):
    import numpy as np

    with pytest.raises(ValueError, match="not divisible"):
        V._train_quantizer(np.ones((10, 15)))


def test_vector_index_stream_available_now(spark, tmp_path):
    """Continuous maintenance: files stream into the source table one
    per trigger, the index builds on batch 0 and refreshes per batch;
    a full RERUN of the stream (same checkpoint gone, same files)
    replays every batch into no-ops — exactly-once end to end."""
    import numpy as np

    vecs = _clustered_vectors(planted=False)
    land = tmp_path / "landing"
    land.mkdir()
    for part, sl in enumerate((slice(0, 80), slice(80, 160), slice(160, 240))):
        rows = [
            (int(sl.start + i), [float(x) for x in v])
            for i, v in enumerate(vecs[sl])
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(str(land / f"b{part}"))
    glob = str(land / "*")
    idx = V.vector_index_stream_available_now(
        spark,
        glob,
        "vec_id long, embedding array<double>",
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )
    n_snaps = len(idx.snapshots())
    assert idx.read(spark).count() == 240
    assert idx.read(spark).select("vec_id").distinct().count() == 240
    epoch = V._build_epoch(idx)
    # rerun with a FRESH checkpoint: every batch replays, all tokens
    # hit, nothing double-appends, the quantizer epoch never moves
    V.vector_index_stream_available_now(
        spark,
        glob,
        "vec_id long, embedding array<double>",
        str(tmp_path / "src"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt2"),
    )
    assert idx.read(spark).count() == 240
    assert len(idx.snapshots()) == n_snaps
    assert V._build_epoch(idx) == epoch


def test_build_crash_before_commit_leaves_index_intact(spark, tmp_path):
    """The rebuild crash window: a rebuild that wrote its new
    epoch-named quantizer sidecar but DIED before the overwrite
    commit leaves readers exactly where they were — the token index
    still names the old epoch, so old codes keep decoding against the
    codebooks that produced them; the orphan sidecar is inert and the
    retried build completes idempotently over it."""
    vecs = _clustered_vectors()
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    e1 = V._build_epoch(idx)
    # source moves by an overwrite; the rebuild gets as far as the
    # new quantizer file and crashes before committing any codes
    src.overwrite(
        spark.createDataFrame(
            [(i, i % 3, [float(x) for x in v])
             for i, v in enumerate(vecs[:120])],
            "vec_id long, label int, embedding array<double>",
        )
    )
    cur2 = src._latest_published()
    orphan = V._train_quantizer(vecs[:50])
    with open(V._quantizer_path(path, cur2), "w") as fh:
        json.dump(orphan, fh)
    # nothing moved: old epoch resolves, queries still retrieve
    assert V._build_epoch(idx) == e1
    got = (
        V.query_vector_index(spark, path, src)
        .filter((F.col("probe_id") == 0) & (F.col("rn") == 1))
        .collect()
    )
    assert got and got[0].cand_id == 1
    # the retried build completes over the orphan (os.replace is
    # idempotent) and flips the epoch atomically with its commit
    idx = V.build_vector_index(spark, src, path)
    assert V._build_epoch(idx) == cur2
    assert idx.read(spark).count() == 120


def test_concurrent_refreshes_commit_exactly_once(spark, tmp_path):
    """Two sessions refreshing the same index after one source append:
    the commit critical section + the vidx-through token admit exactly
    ONE delta commit; the loser no-ops onto the winner's snapshot."""
    from concurrent.futures import ThreadPoolExecutor

    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs[:150])
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    src.append(
        spark.createDataFrame(
            [(150 + i, 0, [float(x) for x in v])
             for i, v in enumerate(vecs[150:])],
            "vec_id long, label int, embedding array<double>",
        )
    )
    with ThreadPoolExecutor(2) as ex:
        got = list(
            ex.map(
                lambda _: V.refresh_vector_index(spark, src, path),
                range(2),
            )
        )
    assert got[0] == got[1] == src._latest_published()
    assert len(idx.snapshots()) == 2  # ONE delta commit, not two
    assert idx.read(spark).count() == len(vecs)
    assert (
        idx.read(spark).select("vec_id").distinct().count() == len(vecs)
    )


def test_cdc_refresh_applies_deletes_and_updates(spark, tmp_path):
    """refresh_vector_index_cdc (r9 verdict #3): after a source merge
    carrying updates + deletes, the index must equal a from-scratch
    re-encode under the frozen quantizer — deletes hidden, updated
    vectors re-encoded (cell moves included), nothing doubled."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    idx = V.build_vector_index(spark, src, path)
    state = src.read(spark)
    upd = state.filter(F.col("vec_id") % 7 == 0).select(
        "vec_id",
        "label",
        F.reverse("embedding").alias("embedding"),
        F.lit("U").alias("_op"),
    )
    dele = state.filter(
        (F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 5 == 1)
    ).select("vec_id", "label", "embedding", F.lit("D").alias("_op"))
    gone = {r.vec_id for r in dele.select("vec_id").collect()}
    src.merge(spark, upd.unionByName(dele), key="vec_id")
    got_v = V.refresh_vector_index_cdc(spark, src, path)
    assert got_v == src._latest_published()
    live = idx.read(spark)
    assert live.count() == len(vecs) - len(gone)
    ids = {r.vec_id for r in live.select("vec_id").collect()}
    assert ids.isdisjoint(gone)
    # bit-identity vs a full re-encode under the SAME quantizer
    quant = V._load_quantizer(path, idx)
    fresh = V._encode(
        src.read(spark).select("vec_id", "embedding"), quant
    ).select(
        "vec_id",
        F.col("cell").alias("_fc"),
        F.col("codes").alias("_fk"),
    )
    mism = (
        live.join(fresh, "vec_id", "full_outer")
        .filter(
            F.col("cell").isNull()
            | F.col("_fc").isNull()
            | (F.col("cell") != F.col("_fc"))
            | (F.col("codes") != F.col("_fk"))
        )
        .count()
    )
    assert mism == 0
    # the probe path still works over the MoR'd index: deleted ids
    # never surface as candidates
    cands = {
        r.cand_id
        for r in V.query_vector_index(spark, path, src).collect()
    }
    assert cands.isdisjoint(gone)


def test_cdc_refresh_crash_replay_noops(spark, tmp_path):
    """The CDC refresh is ONE tokened merge commit: a replay from a
    restarted process (fresh handle) finds the token and no-ops —
    same count, same snapshots, same indexed_through."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    state = src.read(spark)
    src.merge(
        spark,
        state.filter(F.col("vec_id") < 10).select(
            "vec_id", "label", "embedding", F.lit("D").alias("_op")
        ),
        key="vec_id",
    )
    V.refresh_vector_index_cdc(spark, src, path)
    idx = V._index_handle(path)
    snaps, n = idx.snapshots(), idx.read(spark).count()
    through = V.indexed_through(idx)
    # restarted process = fresh handle, same call
    got = V.refresh_vector_index_cdc(spark, src, path)
    idx2 = V._index_handle(path)
    assert got == through == V.indexed_through(idx2)
    assert idx2.snapshots() == snaps
    assert idx2.read(spark).count() == n


def test_cdc_refresh_refuses_overwrite_history(spark, tmp_path):
    """Overwrite-shaped source history still refuses (the changelog
    cannot represent it) — the documented recovery is a rebuild."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs[:100])
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    src.overwrite(
        spark.createDataFrame(
            [(i, 0, [float(x) for x in v])
             for i, v in enumerate(vecs[:50])],
            "vec_id long, label int, embedding array<double>",
        )
    )
    with pytest.raises(ValueError, match="overwrite"):
        V.refresh_vector_index_cdc(spark, src, path)
    # rebuild recovers
    idx = V.build_vector_index(spark, src, path)
    assert idx.read(spark).count() == 50


def test_index_compact_folds_cdc_deletes(spark, tmp_path):
    """After CDC churn the index carries equality-delete files (reads
    pay the broadcast anti-join); a plain SnapshotTable.compact folds
    them back into data — delete_files gone, rows identical, the
    probe path still returns the same candidates."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    state = src.read(spark)
    src.merge(
        spark,
        state.filter(F.col("vec_id") % 6 == 1).select(
            "vec_id", "label", "embedding", F.lit("D").alias("_op")
        ),
        key="vec_id",
    )
    V.refresh_vector_index_cdc(spark, src, path)
    idx = V._index_handle(path)
    head = idx._latest_published()
    assert idx._raw_meta(head).get("delete_files")  # MoR debt exists
    before = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in idx.read(spark).collect()
    }
    pre_q = {
        (r.probe_id, r.cand_id)
        for r in V.query_vector_index(spark, path, src).collect()
    }
    idx.compact(spark, target_files=V.VI_CELLS)
    head2 = idx._latest_published()
    assert not idx._raw_meta(head2).get("delete_files")
    after = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in idx.read(spark).collect()
    }
    assert after == before
    post_q = {
        (r.probe_id, r.cand_id)
        for r in V.query_vector_index(spark, path, src).collect()
    }
    assert post_q == pre_q


def test_cdc_refresh_model_random_churn(spark, tmp_path):
    """Seeded randomized churn model (the lifecycle-model idiom):
    interleave appends, merge-updates, and merge-deletes on the
    source; the refresh fires only every OTHER step (so refresh
    ranges genuinely span several commits, merges included), appends
    RE-USE previously deleted ids when available (delete then
    re-insert — the eq-delete must not hide the higher-sequence
    re-insert), and after each refresh the index must exactly equal
    a frozen-quantizer re-encode of the live source — ids, cells,
    and codes. Review catch, r10: the first version refreshed every
    step and never re-used ids, so its docstring claimed these two
    compositions without exercising them."""
    import numpy as np

    rng = np.random.RandomState(11)
    d = 16

    def vec():
        return [float(x) for x in rng.randn(d)]

    rows = [(i, 0, vec()) for i in range(60)]
    src = SnapshotTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<double>"
        )
    )
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    idx = V._index_handle(path)
    live = {i: r[2] for i, r in enumerate(rows)}
    next_id = 60
    deleted: list[int] = []
    reinserted = 0
    ops_run = []
    forced = ["delete", "append"]  # guarantee delete-then-reinsert
    for step in range(8):
        op = (
            forced[step]
            if step < len(forced)
            else rng.choice(["append", "update", "delete", "noop"])
        )
        if op == "append":
            batch = []
            # re-insert up to two previously deleted ids (fresh
            # vectors): delete-then-reinsert composition
            for _ in range(min(2, len(deleted))):
                rid = deleted.pop()
                batch.append((rid, 0, vec()))
                reinserted += 1
            batch += [(next_id + j, 0, vec()) for j in range(3)]
            next_id += 3
            src.append(
                spark.createDataFrame(
                    batch,
                    "vec_id long, label int, embedding array<double>",
                )
            )
            live.update({b[0]: b[2] for b in batch})
        elif op == "update" and live:
            ids = sorted(live)
            pick = [int(i) for i in rng.choice(ids, size=min(7, len(ids)), replace=False)]
            chg = [(i, 0, vec(), "U") for i in pick]
            src.merge(
                spark,
                spark.createDataFrame(
                    chg,
                    "vec_id long, label int, embedding array<double>, "
                    "_op string",
                ),
                key="vec_id",
            )
            live.update({c[0]: c[2] for c in chg})
        elif op == "delete" and live:
            ids = sorted(live)
            pick = [int(i) for i in rng.choice(ids, size=min(5, len(ids)), replace=False)]
            chg = [(i, 0, live[i], "D") for i in pick]
            src.merge(
                spark,
                spark.createDataFrame(
                    chg,
                    "vec_id long, label int, embedding array<double>, "
                    "_op string",
                ),
                key="vec_id",
            )
            for i in pick:
                del live[i]
                deleted.append(i)
        ops_run.append(op)
        if step % 2 == 0:
            continue  # next refresh spans this commit AND the next
        got_v = V.refresh_vector_index_cdc(spark, src, path)
        assert got_v == src._latest_published()
        state = {
            r.vec_id: (r.cell, tuple(r.codes))
            for r in idx.read(spark).collect()
        }
        assert set(state) == set(live), (
            f"step {step} ({op}): ids diverged"
        )
        quant = V._load_quantizer(path, idx)
        fresh = {
            r.vec_id: (r.cell, tuple(r.codes))
            for r in V._encode(
                src.read(spark).select("vec_id", "embedding"), quant
            ).collect()
        }
        assert state == fresh, f"step {step} ({op}): codes diverged"
    # final refresh covers any trailing unrefreshed commit
    V.refresh_vector_index_cdc(spark, src, path)
    final = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in idx.read(spark).collect()
    }
    quant = V._load_quantizer(path, idx)
    fresh = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in V._encode(
            src.read(spark).select("vec_id", "embedding"), quant
        ).collect()
    }
    assert final == fresh
    # the seeded mix really exercised the claimed compositions
    assert len(ops_run) == 8
    assert reinserted > 0, f"seed produced no re-inserts: {ops_run}"


def test_tune_nprobe_walks_to_the_target(spark, tmp_path):
    """tune_nprobe (r10): recall is monotone in nprobe (superset of
    probed cells), the walk stops at the first doubling point meeting
    the target, and an unreachable target caps at max_nprobe with
    met=False — the calibration workflow as one call."""
    vecs = _clustered_vectors(planted=False)
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path)
    got = V.tune_nprobe(spark, src, path, target_recall_pct=70.0)
    assert got["met"] and got["recall_pct"] >= 70.0
    assert got["nprobe"] <= V.VI_CELLS
    # monotone: each curve step's recall never drops by more than
    # rounding noise (cells are supersets)
    recs = [r for _np, r in got["curve"]]
    assert all(b >= a - 0.1 for a, b in zip(recs, recs[1:])), recs
    # the found nprobe is the FIRST meeting point on the doubling walk
    assert all(r < 70.0 for _np, r in got["curve"][:-1])
    # unreachable target: cap at max_nprobe, met=False, full curve
    capped = V.tune_nprobe(
        spark, src, path, target_recall_pct=101.0, max_nprobe=4
    )
    assert not capped["met"] and capped["nprobe"] == 4
    assert [n for n, _r in capped["curve"]] == [1, 2, 4]


# ---- attribute-filtered ANN (r12, r11 verdict #4) ----------------------


def test_filtered_ann_oracle_row(spark, ddb):
    """q_vecindex_filtered (staged for r13 registration) against its
    DuckDB oracle at the suite's SF — the same driver-rule compare the
    registry check will run: recall floor on the FILTERED subspace
    holds, every probe fills its full top-k from the subspace
    (pre-filtering, not post-filtering), zero off-filter leaks."""
    from tests.conftest import SF_DIR, compare_frames

    df = V.q_vecindex_filtered(spark, SF_DIR)
    cur = ddb.execute(V.VECINDEX_FILTERED_ORACLE)
    compare_frames(df, cur.fetchall(), [d[0] for d in cur.description])


def test_filtered_ann_semantics_and_refusal(spark, tmp_path):
    """Mechanics the hash can't see: (a) the filtered result equals
    the exact filtered twin on a seeded corpus when the index probes
    every cell (nprobe=VI_CELLS -> candidate superset is exact);
    (b) the predicate excludes matching candidates from the SHORTLIST,
    not just the output; (c) an index built without the attribute
    refuses by name, pointing at the rebuild."""
    vecs = _clustered_vectors()
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path, attrs=("label",))
    where = "label = 1"
    ann = V.query_vector_index(
        spark, path, src, nprobe=V.VI_CELLS, where=where
    )
    got = ann.collect()
    # exactness at full probe width: every returned candidate carries
    # the label, and the pair set matches the exact filtered twin
    assert all(r.cand_label == 1 for r in got)
    pairs = {(r.probe_id, r.cand_id) for r in got}
    exact = V.exact_topk_pairs(spark, src, where=where)
    assert pairs == exact
    # refusal: no attrs in this index
    bare = str(tmp_path / "idx_bare")
    V.build_vector_index(spark, src, bare)
    with pytest.raises(ValueError, match="rebuild"):
        V.query_vector_index(spark, bare, src, where=where)


def test_filtered_ann_refresh_paths_carry_attrs(spark, tmp_path):
    """Refresh paths re-derive the build-time attrs from the index's
    own schema: an append refresh encodes new rows WITH the attribute
    (so the filtered query sees them), and the CDC refresh's pure-
    delete rows union cleanly against the attr-carrying schema."""
    vecs = _clustered_vectors()
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path, attrs=("label",))
    # append a planted near-duplicate of vec 0 with label 1
    probe = vecs[0]
    new_id = len(vecs)
    src.append(
        spark.createDataFrame(
            [(new_id, 1, [float(x) + 1e-4 for x in probe])],
            "vec_id long, label int, embedding array<double>",
        )
    )
    V.refresh_vector_index(spark, src, path)
    idx = V._index_handle(path)
    assert [f.name for f in V._index_attr_fields(idx)] == ["label"]
    got = V.query_vector_index(
        spark, path, src, nprobe=V.VI_CELLS, where="label = 1"
    )
    probe0 = {r.cand_id for r in got.collect() if r.probe_id == 0}
    # the refreshed row is visible through the filtered query (the
    # corpus's own planted near-dup, vec 1, also carries label 1 and
    # may outrank it — membership is the refresh claim)
    assert new_id in probe0
    # CDC path: delete the planted row via a changelog-readable merge
    # commit -> the index's 'D' rows carry NULL attrs, and the
    # filtered query stops returning it
    src.merge(
        spark,
        spark.createDataFrame(
            [(new_id, None, None, "D")],
            "vec_id long, label int, embedding array<double>, "
            "_op string",
        ),
        key="vec_id",
    )
    V.refresh_vector_index_cdc(spark, src, path)
    remaining = {
        r.cand_id
        for r in V.query_vector_index(
            spark, path, src, nprobe=V.VI_CELLS, where="label = 1"
        ).collect()
    }
    assert new_id not in remaining


def test_tune_nprobe_filtered_subspace(spark, tmp_path):
    """tune_nprobe(where=...) calibrates against the exact FILTERED
    baseline: returns a measured curve and, at full probe width, must
    meet any target the exact twin can (candidate-superset argument
    holds within the subspace)."""
    vecs = _clustered_vectors()
    src = _mk_src(spark, tmp_path, vecs)
    path = str(tmp_path / "idx")
    V.build_vector_index(spark, src, path, attrs=("label",))
    out = V.tune_nprobe(
        spark, src, path, target_recall_pct=99.9, where="label = 2",
        max_nprobe=V.VI_CELLS,
    )
    # the walk may meet the target before full width (clustered
    # corpus, small subspace); at or before VI_CELLS it MUST meet it
    # (candidate-superset argument within the subspace)
    assert out["met"] and out["recall_pct"] >= 99.9
    assert out["nprobe"] <= V.VI_CELLS


def test_shared_fixture_reuses_and_matches_private_build(spark):
    """The content-keyed shared fixture (r12): (a) a second call
    serves the SAME published artifact without rebuilding (the index
    table's snapshot set is unchanged); (b) the served codes are
    bit-identical to a private from-scratch build over the same
    corpus (deterministic seeded build — sharing changes nothing a
    query can observe)."""
    import shutil

    from tests.conftest import SF_DIR

    src1, idx1 = V._shared_index_fixture(spark, SF_DIR)
    handle = V._index_handle(idx1)
    snaps_before = handle.snapshots()
    src2, idx2 = V._shared_index_fixture(spark, SF_DIR)
    assert idx2 == idx1
    assert V._index_handle(idx2).snapshots() == snaps_before
    # bit-identity vs a private build (fresh scratch, same corpus)
    priv_src, priv_base = V._src_from_embeddings(
        spark, SF_DIR, "vf_private_twin"
    )
    V.build_vector_index(spark, priv_src, f"{priv_base}/idx")
    a = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in V._index_handle(idx1).read(spark).collect()
    }
    b = {
        (r.vec_id, r.cell, tuple(r.codes))
        for r in V._index_handle(f"{priv_base}/idx")
        .read(spark)
        .collect()
    }
    assert a == b
    shutil.rmtree(priv_base, ignore_errors=True)
