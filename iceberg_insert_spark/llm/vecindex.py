"""Persisted IVF-PQ vector index with snapshot-tracked lifecycle.

The in-memory ANN tiers (llm/similarity.py) each demonstrate ONE
pruning axis — LSH prunes the pair space, IVF prunes candidate ROWS,
PQ prunes candidate BYTES. Production vector search composes the last
two (FAISS ``IndexIVFPQ``, Jégou et al. 2011 §IV: coarse cells of
residual PQ codes) and, crucially, PERSISTS the index: the quantizer
trains once, codes live next to the data, and new vectors are encoded
incrementally — nobody re-trains a codebook per query. This module is
that artifact, built from the repo's own table format:

  * the INDEX IS A SnapshotTable — rows ``(vec_id, cell, codes)``
    partitioned by ``cell`` with per-file [min, max] ``cell`` stats
    and hash write distribution (one file per cell per commit). The
    inverted lists are therefore FILES, and "probe nprobe cells" is
    literally the metadata planner's ``isin`` pruning: a query opens
    only the probed cells' files, verifiable with ``plan_files`` —
    zero data IO decides the scan;
  * the QUANTIZER (coarse centroids + per-subspace residual
    codebooks) is immutable after ``build`` — written once as a JSON
    sidecar, broadcast-sized (cells x d + M x K x d/M doubles) at any
    corpus size. Freezing it is the standard FAISS lifecycle: train on
    a bounded sample, add forever;
  * REFRESH is exactly-once and O(delta): the index's commit token
    records the source snapshot it is indexed through (the
    incremental-MV checkpoint idiom, incremental_mv.py:45), a refresh
    encodes only ``_read_incremental(src, last, cur)`` rows (manifest
    set-difference, no rescans), and a replayed refresh finds its
    token and no-ops;
  * QUERIES are asymmetric-distance scans: per (probe, probed-cell)
    the driver builds the M x K lookup table against the PROBE'S OWN
    residual in that cell, the scan computes the ADC distance as a
    pure-JVM ``aggregate(zip_with(codes, lut, ...))`` over 8-byte
    codes (64x less bandwidth than raw 64-dim doubles), and the
    top-R shortlist is re-scored with exact cosine against the source
    table — returned similarities are exact, candidate generation is
    approximate, recall is a CHECKED claim (q_sim_ann_recall's
    'ivfpq' floor).

100 TB anatomy: train on <=VI_TRAIN_CAP vectors (driver numpy, the
FAISS workflow); encode in one Arrow-batched pass (distances via the
|x|^2 - 2x.c + |c|^2 expansion — n x K matrices, never n x K x d
broadcasts); store M bytes + a cell id per vector; a probe batch
reads nprobe/C of the FILES (not just rows) and scans codes, not
vectors. The reference (App.java:51-158) has no vector surface at
all; this is the lakehouse-native version of what FAISS does on one
node.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import tiny_df

from ..registry import query
from ..tables import load_table, scratch_dir
from ..sources.snapshots import SnapshotTable
from ..sources.snapshots.incremental import _read_incremental
from .similarity import N_PROBES, TOP_K
from .vector import cosine

VI_CELLS = 16
VI_NPROBE = 8  # same recall/cost dial as the IVF tier (SCALE.md curve)
VI_PQ_M = 8  # subspaces: 64-dim embeddings -> 8 dims each, 8-byte codes
VI_PQ_K = 256
VI_RERANK = 100  # exact re-score depth per probe (top-R by ADC);
# measured recall@5 vs the exact twin: 82/84/84 % at sf0.001/0.01/0.1
# (R=50 dipped to 80 % at sf0.1) — the ceiling is the coarse nprobe
# pruning, same as the pure-IVF tier (SCALE.md r9 curve)
VI_TRAIN_CAP = 20_000  # quantizer training-sample bound
_VI_TOKEN = "vidx-through-"  # refresh commits: delta appended
_VI_BUILD_TOKEN = "vidx-built-"  # build commits: full overwrite


def _lloyd(x, k: int, rng, iters: int = 10):
    """Seeded Lloyd k-means on the driver — THE shared quantizer
    trainer (similarity._pq_codebooks delegates here; one
    implementation, one determinism contract: fixed sample, caller-
    owned RandomState — recall floors must not move with host or
    layout). Tiny inputs pad by repeating centroids; assignment
    distances use the dot-product expansion so memory stays n x k."""
    import numpy as np

    n = len(x)
    k0 = min(k, n)
    c = x[rng.choice(n, size=k0, replace=False)].copy()
    if k0 < k:
        c = np.vstack([c, c[rng.choice(k0, size=k - k0)]])
    for _ in range(iters):
        # argmin_j ||x - c_j||² == argmin_j (-2 x·c_j + ||c_j||²):
        # the ||x||² row constant can't change the winner, and
        # dropping it (plus in-place accumulation) removes two
        # n x k float64 temporaries per iteration — the training
        # loop's actual cost at k=256 (r11; assignment ties shift
        # only where two centroids were equidistant to the ulp,
        # re-measured against every recall-shaped oracle constant)
        d2 = x @ c.T
        d2 *= -2.0
        d2 += (c * c).sum(1)[None, :]
        assign = d2.argmin(1)
        # vectorized per-cell means (r11): the per-centroid boolean-
        # mask loop was 10 iters x k masks per training call — ~1.5 s
        # of pure driver Python per index build at k=256. add.at sums
        # each cell's members in index order (vs np.mean's pairwise
        # summation), a last-ulp numerics change; every recall- and
        # nprobe-shaped oracle constant was re-measured across
        # sf0.001/0.01/0.1 after the switch (margins >= 7 points,
        # unchanged). Empty cells keep their previous centroid,
        # exactly like the masked loop did.
        sums = np.zeros_like(c)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nz = counts > 0
        c[nz] = sums[nz] / counts[nz, None]
    return c


def _train_quantizer(vectors) -> dict:
    """IVF-PQ quantizer: coarse centroids over L2-normalized vectors
    (unit sphere: L2 order == cosine order), then per-subspace
    codebooks over the RESIDUALS x - c[cell] (Jégou et al. 2011 §IV.A
    — residual PQ concentrates the quantizer on within-cell variance,
    measurably better than coding raw vectors). Pure driver numpy,
    deterministic."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, d = x.shape
    if d % VI_PQ_M:
        raise ValueError(f"dim {d} not divisible by VI_PQ_M={VI_PQ_M}")
    cents = _lloyd(x, VI_CELLS, np.random.RandomState(42))
    d2 = (
        (x * x).sum(1)[:, None]
        - 2.0 * (x @ cents.T)
        + (cents * cents).sum(1)[None, :]
    )
    resid = x - cents[d2.argmin(1)]
    sub = d // VI_PQ_M
    books = [
        _lloyd(
            resid[:, m * sub : (m + 1) * sub],
            VI_PQ_K,
            np.random.RandomState(43 + m),
        )
        for m in range(VI_PQ_M)
    ]
    return {
        "d": d,
        "cells": [[float(v) for v in c] for c in cents],
        "books": [
            [[float(v) for v in row] for row in b] for b in books
        ],
    }


def _quantizer_path(path: str, epoch: int) -> str:
    """The quantizer sidecar is IMMUTABLE PER BUILD EPOCH (named by
    the source snapshot the build covered): a REBUILD writes a new
    file and its overwrite commit atomically flips which epoch the
    token index names — readers resolving through ``_build_epoch``
    always pair codes with the codebooks that produced them (review
    catch: a single mutable _quantizer.json made rebuild a torn-read
    window where old codes decoded against retrained codebooks)."""
    return os.path.join(path, f"_quantizer.{epoch}.json")


def _build_epoch(idx: SnapshotTable) -> int | None:
    """The source snapshot of the live build commit (max over
    ``vidx-built-*`` tokens still in history)."""
    vs = [
        int(t[len(_VI_BUILD_TOKEN):])
        for t, v in idx._token_index().items()
        if t.startswith(_VI_BUILD_TOKEN) and v in idx.snapshots()
    ]
    return max(vs) if vs else None


def _load_quantizer(path: str, idx: SnapshotTable) -> dict:
    epoch = _build_epoch(idx)
    if epoch is None:
        raise ValueError(
            f"no index at {path!r} — build_vector_index first"
        )
    with open(_quantizer_path(path, epoch)) as f:
        return json.load(f)


def _encode(
    df: DataFrame, quantizer: dict, attrs: tuple = ()
) -> DataFrame:
    """One Arrow-batched encoding pass: (vec_id, embedding) ->
    (vec_id, cell, codes[, *attrs]). Distance matrices use the
    dot-product expansion (n x K doubles per subspace, never
    n x K x d). ``attrs`` (r12, filtered ANN): attribute columns
    carried VERBATIM from the source into the code rows, so an
    attribute predicate pushes into the probed cells' parquet scan
    at query time — the filtered-ANN co-location every production
    vector store does."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(quantizer["cells"], dtype=np.float64)
    books = np.stack(
        [np.asarray(b, dtype=np.float64) for b in quantizer["books"]]
    )  # (M, K, sub)

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas inference can't resolve the closure (same note
    # as similarity.pq_encode) — explicit returnType selects SCALAR
    @pandas_udf("cell int, codes array<int>")
    def enc(batch):
        import pandas as pd

        x = np.stack(batch.to_numpy()).astype(np.float64)
        x = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        n, d = x.shape
        sub = d // VI_PQ_M
        d2c = (
            (x * x).sum(1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        cell = d2c.argmin(1)
        resid = x - cents[cell]
        out = np.empty((n, VI_PQ_M), dtype=np.int32)
        for m in range(VI_PQ_M):
            s = resid[:, m * sub : (m + 1) * sub]
            b = books[m]
            d2 = (
                (s * s).sum(1)[:, None]
                - 2.0 * (s @ b.T)
                + (b * b).sum(1)[None, :]
            )
            out[:, m] = d2.argmin(1)
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "codes": list(out)}
        )

    return df.select(
        "vec_id", *attrs, enc("embedding").alias("_e")
    ).select(
        "vec_id",
        F.col("_e.cell").alias("cell"),
        F.col("_e.codes").alias("codes"),
        *attrs,
    )


def _index_handle(path: str) -> SnapshotTable:
    return SnapshotTable(
        path,
        partition_by=["cell"],
        stats_cols=["cell", "vec_id"],
        write_distribution="hash",
    )


def indexed_through(idx: SnapshotTable) -> int | None:
    """The source snapshot the index covers — from the index table's
    own commit tokens (the MV-refresh checkpoint idiom: state moves
    atomically with the commit, crash-replay finds it and no-ops).
    Build (overwrite) and refresh (append) tokens both count."""
    vs = [
        int(t[len(p):])
        for t, v in idx._token_index().items()
        for p in (_VI_TOKEN, _VI_BUILD_TOKEN)
        if t.startswith(p) and v in idx.snapshots()
    ]
    return max(vs) if vs else None


def _index_attr_fields(idx: SnapshotTable) -> list:
    """Attribute StructFields the index carries beyond the core
    (vec_id, cell, codes) — read from the index table's own stored
    schema, so refresh paths re-derive the build-time ``attrs``
    choice instead of trusting a caller to repeat it."""
    lp = idx._latest_published()
    sj = idx._raw_meta(lp).get("schema") if lp is not None else None
    if not sj:
        return []
    from pyspark.sql import types as T

    return [
        f
        for f in T.StructType.fromJson(sj).fields
        if f.name not in ("vec_id", "cell", "codes")
    ]


def build_vector_index(
    spark: SparkSession,
    src: SnapshotTable,
    path: str,
    attrs: tuple = (),
) -> SnapshotTable:
    """Build (or REBUILD — the documented recovery after an
    overwrite/rollback-shaped source history): train the quantizer on
    a deterministic bounded sample of the source's CURRENT snapshot,
    persist it under a new epoch-named sidecar, encode every row, and
    commit the codes as ONE idempotent OVERWRITE (token = source
    version). Overwrite — never append — so a rebuild on an existing
    index atomically REPLACES the old codes instead of duplicating
    every vec_id (review catch), and the epoch flip pairs readers
    with the matching codebooks whichever side of the commit they
    read. The epoch's quantizer is immutable afterwards — refreshes
    only ADD codes encoded with it.

    ``attrs`` (r12): source attribute columns to co-locate with the
    codes for filtered ANN (``query_vector_index(where=...)``) —
    refresh paths re-derive the choice from the index's own schema,
    so it is made once, here."""
    cur = src._latest_published()
    if cur is None:
        raise ValueError("source table has nothing published")
    state = src.read(spark).select("vec_id", "embedding", *attrs)
    sample = [
        r.embedding
        for r in state.orderBy("vec_id").limit(VI_TRAIN_CAP).collect()
    ]
    quantizer = _train_quantizer(sample)
    os.makedirs(path, exist_ok=True)
    qp = _quantizer_path(path, cur)
    tmp = qp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(quantizer, f)
    os.replace(tmp, qp)  # before the commit: an orphan on crash,
    # never a live pointer to codes that don't match it
    idx = _index_handle(path)
    idx.overwrite(
        _encode(state, quantizer, attrs=tuple(attrs)),
        token=f"{_VI_BUILD_TOKEN}{cur}",
    )
    return idx


def refresh_vector_index(
    spark: SparkSession, src: SnapshotTable, path: str
) -> int:
    """Advance the index to the source's current snapshot: encode ONLY
    the rows appended since the last indexed snapshot (manifest
    set-difference — no source rescan) with the PERSISTED quantizer,
    and append them as one tokened commit. Returns the source snapshot
    the index now covers; a replayed refresh no-ops on its token.
    APPEND-shaped history only — a range containing merge commits
    (dedup deletes, doc updates) refuses inside ``_read_incremental``;
    use :func:`refresh_vector_index_cdc` for those, and rebuild with
    ``build_vector_index`` after overwrite/rollback-shaped history
    (same contract as the incremental MV)."""
    cur = src._latest_published()
    if cur is None:
        raise ValueError("source table has nothing published")
    idx = _index_handle(path)
    last = indexed_through(idx)
    if last is None:
        raise ValueError(
            f"no index at {path!r} — build_vector_index first"
        )
    if last >= cur:
        return last  # nothing new: no commit, no data IO
    attrs = tuple(f.name for f in _index_attr_fields(idx))
    delta = _read_incremental(src, spark, last, cur).select(
        "vec_id", "embedding", *attrs
    )
    quantizer = _load_quantizer(path, idx)
    idx.append_once(
        _encode(delta, quantizer, attrs=attrs),
        token=f"{_VI_TOKEN}{cur}",
    )
    return cur


def refresh_vector_index_cdc(
    spark: SparkSession, src: SnapshotTable, path: str
) -> int:
    """Advance the index across source DELETES and UPDATES (r9
    verdict #3): consume the source's CDC changelog between the last
    indexed snapshot and the current one (``read_changelog`` — pure
    manifest arithmetic + two bounded scans) and apply it to the
    index as ONE atomic merge commit:

      * delete images whose key never re-inserts -> equality-delete
        entries on ``vec_id`` (the index's own MoR delete — O(keys)
        write, zero rewrite; readers pay the broadcast anti-join
        until the index is compacted);
      * insert images (including the new halves of update pairs) ->
        encoded with the FROZEN quantizer and written as 'U' rows
        (eq-delete of any stale code + the new code, together).

    One tokened commit (token = source snapshot, the same
    ``indexed_through`` checkpoint idiom as the append path): a
    crash before it leaves the index exactly at ``last``; a replay
    after it finds the token and no-ops. Codes are BIT-IDENTICAL to
    a from-scratch re-encode under the same quantizer — the oracled
    q_vecindex_cdc claim — because both paths run the identical
    seeded encoder; a cell CHANGE on update is handled naturally
    (the eq-delete hides the old cell's row at read, whatever file
    holds it). Overwrite/rollback-shaped history still refuses
    inside ``read_changelog`` — rebuild for those.

    Before this existed, any real corpus taking dedup deletes or doc
    updates stranded the index until a full rebuild epoch; now those
    are O(|changelog|) encode + one metadata commit, the same cost
    shape as the append refresh. Returns the source snapshot the
    index now covers."""
    from ..sources.snapshots.incremental import read_changelog

    cur = src._latest_published()
    if cur is None:
        raise ValueError("source table has nothing published")
    idx = _index_handle(path)
    last = indexed_through(idx)
    if last is None:
        raise ValueError(
            f"no index at {path!r} — build_vector_index first"
        )
    if last >= cur:
        return last  # nothing new: no commit, no data IO
    ch = read_changelog(src, spark, last, cur)
    quantizer = _load_quantizer(path, idx)
    attr_fields = _index_attr_fields(idx)
    attrs = tuple(f.name for f in attr_fields)
    ins = ch.filter(F.col("_change_type") == "insert").select(
        "vec_id", "embedding", *attrs
    )
    # update pairs carry BOTH images; a key with an insert image is
    # an upsert ('U' eq-deletes the stale code itself), so only
    # delete-without-reinsert keys become pure 'D' rows
    del_only = (
        ch.filter(F.col("_change_type") == "delete")
        .select("vec_id")
        .distinct()
        .join(ins.select("vec_id"), "vec_id", "left_anti")
    )
    chg = (
        _encode(ins, quantizer, attrs=attrs)
        .withColumn("_op", F.lit("U"))
        .unionByName(
            del_only.select(
                "vec_id",
                F.lit(None).cast("int").alias("cell"),
                F.lit(None).cast("array<int>").alias("codes"),
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in attr_fields
                ],
                F.lit("D").alias("_op"),
            )
        )
    )
    idx.merge(
        spark, chg, key="vec_id", token=f"{_VI_TOKEN}{cur}",
        _ops_validated=True,  # _op is F.lit("U")/F.lit("D") above
    )
    return cur


def query_vector_index(
    spark: SparkSession,
    path: str,
    src: SnapshotTable,
    nprobe: int = VI_NPROBE,
    k: int = TOP_K,
    rerank: int = VI_RERANK,
    where: str | None = None,
) -> DataFrame:
    """ANN top-k for the first N_PROBES source vectors against the
    persisted index. Per (probe, probed cell) the driver builds the
    ADC lookup table against the probe's residual IN THAT CELL
    (residual PQ makes the LUT cell-dependent); the scan reads only
    the probed cells' files (metadata ``isin`` pruning), computes ADC
    JVM-side, shortlists top-``rerank`` per probe, and re-scores
    exactly against the source table. LUTs are
    N_PROBES x nprobe x M x K doubles — broadcast-sized at any corpus
    size.

    ``where`` (r12, r11 verdict #4 — attribute-filtered ANN): a SQL
    predicate over the index's co-located attribute columns
    (``build_vector_index(attrs=...)``), e.g. "label = 'a'". Pushed
    into BOTH scans: the probed-cells codes scan (so non-matching
    codes never enter ADC or occupy shortlist slots — pre-filtering,
    not post-filtering, which would silently shrink result depth) and
    the exact-rescore scan. Probes stay UNfiltered — the query set is
    the caller's, only the CANDIDATE space filters. An index built
    without the predicate's columns refuses by name, pointing at the
    rebuild."""
    import numpy as np

    idx = _index_handle(path)
    quantizer = _load_quantizer(path, idx)
    cents = np.asarray(quantizer["cells"], dtype=np.float64)
    books = np.stack(
        [np.asarray(b, dtype=np.float64) for b in quantizer["books"]]
    )
    d = int(quantizer["d"])
    sub = d // VI_PQ_M
    probes = (
        src.read(spark)
        .filter(F.col("vec_id") < N_PROBES)
        .select("vec_id", "embedding")
        .collect()
    )
    rows = []
    for r in probes:
        p_raw = [float(v) for v in r.embedding]
        p = np.asarray(p_raw, dtype=np.float64)
        p = p / max(float(np.linalg.norm(p)), 1e-12)
        d2c = ((p[None, :] - cents) ** 2).sum(1)
        for cell in np.argsort(d2c, kind="stable")[:nprobe]:
            resid = p - cents[cell]
            # one vectorized (M, K) distance table per (probe, cell)
            # — not M x K scalar reductions (review catch)
            lut = (
                (books - resid.reshape(VI_PQ_M, 1, sub)) ** 2
            ).sum(-1)
            rows.append(
                (int(r.vec_id), p_raw, int(cell), lut.tolist())
            )
    probe_cells = tiny_df(spark, 
        rows,
        "probe_id long, pe array<double>, cell int, "
        "lut array<array<double>>",
    )
    cells_needed = sorted({c for _, _, c, _ in rows})
    codes = idx.read(spark, isin=("cell", cells_needed))
    if where is not None:
        try:
            codes = codes.filter(F.expr(where))
            codes.schema  # force analysis: fail here, by name
        except Exception as ex:
            idx_attrs = [f.name for f in _index_attr_fields(idx)]
            raise ValueError(
                f"filtered ANN predicate {where!r} does not resolve "
                f"on the index's columns (attributes: {idx_attrs}); "
                "rebuild with build_vector_index(..., attrs=[...]) "
                "to co-locate the predicate's columns"
            ) from ex
    adc = F.expr(
        "aggregate(zip_with(codes, lut, (c, l) -> l[c]), 0D, "
        "(a, x) -> a + x)"
    )
    wadc = Window.partitionBy("probe_id").orderBy(
        F.asc("adc"), F.asc("vec_id")
    )
    shortlist = (
        codes.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .withColumn("adc", adc)
        .withColumn("_r", F.row_number().over(wadc))
        .filter(F.col("_r") <= rerank)
        .select("probe_id", "pe", "vec_id")
    )
    cand_src = src.read(spark)
    if where is not None:
        # same predicate on the rescore scan: pushed to ITS parquet
        # scan too, and it keeps the shortlist->rescore join honest
        # even if index attrs and source drift (belt and braces)
        cand_src = cand_src.filter(F.expr(where))
    cand = cand_src.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("ce"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        shortlist.join(cand, shortlist.vec_id == cand.cand_id)
        .select(
            "probe_id",
            "cand_id",
            "cand_label",
            F.round(cosine("pe", "ce"), 6).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


def _shared_index_fixture(
    spark: SparkSession, sf_dir: str, flt_sql: str | None = None
) -> tuple[SnapshotTable, str]:
    """CONTENT-KEYED shared (src table, built index) fixture for the
    read-only benchmark queries (r11 verdict #6: the top bench tier
    was five from-scratch builds of the same frozen index; the
    queries' claims are about the FROZEN index, not about building it
    five times). Key = sha256(embeddings parquet bytes, this module's
    source, the VI_* config): any corpus change, encoder change, or
    config change misses and rebuilds — the result_cache idiom
    (content IS the invalidation), applied to the index artifact.

    Immutable after publish: built under a tmp dir, renamed into the
    keyed path atomically; concurrent builders race safely (first
    rename wins, losers discard and read the winner's). SCOPED TO THE
    SPARK APPLICATION (r12 optimization round): the key includes the
    applicationId, so every bench/driver invocation rebuilds the index
    from the parquet inputs exactly once — the r11 shape (no app id,
    cross-process reuse "on purpose") was a persisted intermediate
    keyed on the test data, which the optimization rounds ban as
    cross-run result caching, and it would also have distorted the
    driver's core-count scaling passes (the second pass would read the
    first pass's index instead of building). Within one application
    the one-build-serves-five sharing stands: the read-only queries'
    claims are about the FROZEN index, not about building it five
    times. MUTATING queries (incremental, CDC) keep their private
    scratch fixtures."""
    import hashlib
    import shutil
    import threading

    h = hashlib.sha256()
    src_file = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src_file):
        for f in sorted(os.listdir(src_file)):
            p = os.path.join(src_file, f)
            st = os.stat(p)
            h.update(f.encode())
            # size AND mtime_ns: a regenerated corpus with identical
            # part names and byte sizes (fixed-width encodings make
            # that plausible) must miss, not serve a stale index from
            # the cross-process cache (review catch); the single-file
            # branch below hashes full bytes and never had the hole
            h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    else:
        with open(src_file, "rb") as fh:
            h.update(fh.read())
    with open(__file__.rstrip("c"), "rb") as fh:
        h.update(fh.read())
    h.update(
        json.dumps(
            [VI_CELLS, VI_PQ_M, VI_PQ_K, VI_TRAIN_CAP, flt_sql]
        ).encode()
    )
    digest = h.hexdigest()[:16]
    import re as _re

    tag = _re.sub(r"\W", "_", sf_dir.rstrip("/").split("/")[-1])
    app = spark.sparkContext.applicationId
    shared_base = "/tmp/iceberg_insert_spark/vecindex_shared"
    root = f"{shared_base}/{app}/{tag}/{digest}"
    # reclaim OUR OWN app dir at driver exit (r12 ADVICE: the
    # app-keyed scoping means every invocation leaves a full built
    # index behind). Self-cleanup via atexit touches no other
    # application's files — a sibling-pruning sweep could yank a
    # concurrent app's live index (review catch: any age gate reads a
    # creation-time mtime and cannot prove the owner is gone) — and
    # it cannot reintroduce cross-run reuse: the dir dies with the
    # process that built it.
    _registered = _shared_index_fixture.__dict__.setdefault(
        "_cleanup_registered", set()
    )
    if app not in _registered:
        import atexit

        atexit.register(
            shutil.rmtree, f"{shared_base}/{app}", ignore_errors=True
        )
        _registered.add(app)
    if not os.path.isdir(root):
        tmp = f"{root}.tmp-{os.getpid()}-{threading.get_ident()}"
        shutil.rmtree(tmp, ignore_errors=True)
        src_t = SnapshotTable(f"{tmp}/src")
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", "embedding"
        )
        if flt_sql is not None:
            emb = emb.filter(F.expr(flt_sql))
        src_t.append(emb)
        build_vector_index(spark, src_t, f"{tmp}/idx")
        os.makedirs(os.path.dirname(root), exist_ok=True)
        try:
            os.rename(tmp, root)
        except OSError:
            # another process published first: theirs is identical
            # (deterministic seeded build over the same content key)
            shutil.rmtree(tmp, ignore_errors=True)
    return SnapshotTable(f"{root}/src"), f"{root}/idx"


def _cloned_index_fixture(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    flt_sql: str | None = None,
) -> tuple[SnapshotTable, str]:
    """Private MUTABLE copy of the shared fixture for queries that
    churn the source/index (incremental refresh, CDC): copytree the
    immutable artifact into this query's scratch dir — a file copy of
    a KB-scale table instead of a 2-3 s train+encode+commit rebuild
    (r11 verdict #6). The copy starts bit-identical to a private
    build (the shared-fixture pytest pins that), so nothing a query
    observes changes; the shared artifact itself is never written."""
    import shutil

    src, idx_path = _shared_index_fixture(spark, sf_dir, flt_sql)
    base = scratch_dir(spark, sf_dir, name)  # rmtree'd fresh path
    shutil.copytree(os.path.dirname(idx_path), base)
    return SnapshotTable(f"{base}/src"), f"{base}/idx"


def _src_from_embeddings(
    spark: SparkSession, sf_dir: str, name: str, flt=None
) -> tuple[SnapshotTable, str]:
    base = scratch_dir(spark, sf_dir, name)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    if flt is not None:
        emb = emb.filter(flt)
    src = SnapshotTable(f"{base}/src")
    src.append(emb)
    return src, base


@query("q_sim_knn_ivfpq")
def q_sim_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN over the PERSISTED index (FAISS ``IndexIVFPQ``
    composed from this repo's own table format): embeddings land in a
    snapshot table, ``build_vector_index`` trains + encodes + commits
    the cell-partitioned code table, and the query probes
    VI_NPROBE/VI_CELLS cells — reading only those cells' FILES via
    metadata isin pruning — then ADC-shortlists and exactly re-scores.
    Output schema matches the other tiers, so recall vs the exact twin
    is a CHECKED claim: q_vecindex_recall's floor (r9 verdict #5 moved
    it here from q_sim_ann_recall, next to the build it measures).
    Rows-only here (candidate generation is approximate by design; the
    recall query is the correctness statement). Serves from the
    content-keyed shared fixture (r12): the claim is about the frozen
    index, which the fixture builds once per (corpus, encoder,
    config) key."""
    src, idx_path = _shared_index_fixture(spark, sf_dir)
    return query_vector_index(spark, idx_path, src)


@query(
    "q_vecindex_recall",
    oracle="""
    SELECT 'ivfpq'             AS method,
           CAST(5  AS BIGINT)  AS k,
           CAST(72 AS BIGINT)  AS floor_pct,
           CAST(1  AS BIGINT)  AS meets_floor
    """,
)
def q_vecindex_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@k of the PERSISTED IVF-PQ index vs the exact
    brute-force twin — the q_vecindex_* family's quality statement
    (r9 verdict #5: split from q_sim_ann_recall so the floor reuses
    ONE index build instead of a second full fixture inside the
    suite's most expensive row, and bench attribution lands on the
    index it measures). One build, one probe pass, one bounded exact
    twin: recall@k = |ANN top-k ∩ exact top-k| / (N_PROBES * TOP_K);
    the 72% floor sits >= 10 points under the measured 82-84% band
    (nprobe=8, residual codes, R=100 re-rank — SCALE.md r9 curves)
    across sf0.001/0.01/0.1. A silent quality regression anywhere in
    the persisted path (quantizer train, encode, cell pruning, ADC,
    re-score) drops below the floor and hash-mismatches the oracle's
    constant row.

    Scale shape: identical to q_sim_ann_recall's — the exact twin is
    a bounded broadcast probe scan, so this measurement calibrates an
    index of ANY size from a sample table (the FAISS workflow).
    Serves from the content-keyed shared fixture (r12, r11 verdict
    #6): one deterministic build per (corpus, encoder, config) key —
    the floor is a claim about the frozen index, not the build."""
    from .similarity import (
        ANN_RECALL_FLOORS,
        _exact_knn_pairs,
    )

    # the exact twin is independent of the index probe — overlap the
    # two job chains (r13; same pattern as q_sim_ann_recall's pool)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        exact_fut = ex.submit(_exact_knn_pairs, spark, sf_dir)
        src, idx_path = _shared_index_fixture(spark, sf_dir)
        ann = {
            (r.probe_id, r.cand_id)
            for r in query_vector_index(spark, idx_path, src)
            .select("probe_id", "cand_id")
            .collect()
        }
        exact = exact_fut.result()
    total = N_PROBES * TOP_K
    floor = ANN_RECALL_FLOORS["ivfpq"]
    hits = len(exact & ann)
    return tiny_df(spark, 
        [("ivfpq", TOP_K, floor, int(100 * hits >= floor * total))],
        "method string, k bigint, floor_pct bigint, meets_floor bigint",
    )


@query(
    "q_vecindex_build",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_src,
           CAST(COUNT(*) AS BIGINT)            AS n_codes,
           CAST(8 AS BIGINT)                   AS code_bytes,
           CAST(64 AS BIGINT)                  AS compression_x,
           CAST(1 AS BIGINT)                   AS pruning_held
    FROM embeddings
    """,
)
def q_vecindex_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-build audit, DuckDB-oracled: every source vector must be
    indexed exactly once (n_codes == n_src — a dropped Arrow batch or
    a double-encoded partition breaks the hash), codes are
    VI_PQ_M bytes against 64 float64 dims (the 64x scan-bandwidth
    claim), and a VI_NPROBE-cell probe plan must open FEWER files than
    the index holds (``plan_files`` isin over the cell stats — the
    inverted-list pruning measured from metadata alone, zero data IO).
    ``pruning_held`` folds the planner counters into a checked bit;
    the probed-cell set itself is quantizer-dependent (k-means), which
    is exactly why the claim is the INVARIANT, not the cell ids."""
    import numpy as np

    src, base = _src_from_embeddings(spark, sf_dir, "vecindex_build")
    path = f"{base}/idx"
    idx = build_vector_index(spark, src, path)
    quantizer = _load_quantizer(path, idx)
    cents = np.asarray(quantizer["cells"], dtype=np.float64)
    p0 = np.asarray(
        src.read(spark)
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0],
        dtype=np.float64,
    )
    p0 = p0 / max(float(np.linalg.norm(p0)), 1e-12)
    cells = [
        int(c)
        for c in np.argsort(((p0[None, :] - cents) ** 2).sum(1))[
            :VI_NPROBE
        ]
    ]
    kept, total = idx.plan_files(isin=("cell", cells))
    n_src = src.read(spark).count()
    # The strict invariant (a VI_NPROBE-cell probe opens FEWER files
    # than the index holds) presupposes the trained k-means populated
    # MORE than VI_NPROBE cells; on a small or degenerate corpus the
    # quantizer can collapse cells so kept == total with nothing
    # broken (r9 ADVICE). Guard on the OBSERVED populated-cell count
    # — folded into ONE pass with the code count (review catch, r10:
    # a second full MoR scan just for countDistinct).
    stats_row = idx.read(spark).agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("pop"),
    ).collect()[0]
    n_codes = stats_row["n"]
    populated = stats_row["pop"]
    if populated > VI_NPROBE:
        pruning_held = int(0 < len(kept) < total)
    else:
        pruning_held = int(0 < len(kept) <= total)
    return tiny_df(spark, 
        [
            (
                n_src,
                n_codes,
                VI_PQ_M,
                (8 * 64) // VI_PQ_M,
                pruning_held,
            )
        ],
        "n_src bigint, n_codes bigint, code_bytes bigint, "
        "compression_x bigint, pruning_held bigint",
    )


@query(
    "q_vecindex_incremental",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT)
               AS n_total,
           CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id % 5 = 0)
                AS BIGINT) AS n_delta,
           CAST(0 AS BIGINT) AS n_mismatch,
           CAST(2 AS BIGINT) AS n_commits
    """,
)
def q_vecindex_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental index maintenance, DuckDB-oracled end-to-end: the
    index bootstraps on the %5 != 0 vectors, the source then appends
    the %5 == 0 rest, and ONE refresh encodes exactly the delta
    (manifest set-difference read — the source is never rescanned)
    with the PERSISTED quantizer. Checks folded into the hash:

      * n_total — the refreshed index covers every source row;
      * n_mismatch = 0 — re-encoding the FULL source with the same
        frozen quantizer and joining on vec_id finds zero (cell,
        codes) disagreements, i.e. the incremental path writes
        bit-identical codes to what a full rebuild would (refresh
        correctness, not just refresh completion);
      * n_commits = 2 — the delta landed as ONE commit, and a REPLAYED
        refresh (called again below) found its token and no-opped
        (exactly-once: a third snapshot would break the hash).
    """
    # bootstrap state (subset corpus + its built index) clones from
    # the content-keyed shared fixture (r12): the query's claims start
    # at the append below, and the clone is bit-identical to a
    # private build
    src, path = _cloned_index_fixture(
        spark, sf_dir, "vecindex_incr", "vec_id % 5 != 0"
    )
    idx = _index_handle(path)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    src.append(emb.filter(F.col("vec_id") % 5 == 0))
    refresh_vector_index(spark, src, path)
    refresh_vector_index(spark, src, path)  # replay: must no-op
    full = _encode(
        src.read(spark).select("vec_id", "embedding"),
        _load_quantizer(path, idx),
    ).select(
        F.col("vec_id"),
        F.col("cell").alias("_fcell"),
        F.col("codes").alias("_fcodes"),
    )
    # pin the index state once: the mismatch join, total, and delta
    # all read it — three lineage re-scans otherwise (review catch)
    got = idx.read(spark).localCheckpoint(eager=True)
    n_total = got.count()
    mism = (
        got.join(full, "vec_id", "full_outer")
        .filter(
            F.col("cell").isNull()
            | F.col("_fcell").isNull()
            | (F.col("cell") != F.col("_fcell"))
            | (F.col("codes") != F.col("_fcodes"))
        )
        .count()
    )
    n_delta = n_total - idx.read(
        spark, as_of=idx.snapshots()[0]
    ).count()
    return tiny_df(spark, 
        [(n_total, n_delta, mism, len(idx.snapshots()))],
        "n_total bigint, n_delta bigint, n_mismatch bigint, "
        "n_commits bigint",
    )


@query(
    "q_vecindex_cdc",
    oracle="""
    WITH corpus AS (
        SELECT * FROM embeddings WHERE vec_id % 2 = 0
    )
    SELECT CAST((SELECT COUNT(*) FROM corpus
                 WHERE NOT (vec_id % 7 <> 0 AND vec_id % 5 = 1))
                AS BIGINT) AS n_total,
           CAST((SELECT COUNT(*) FROM corpus WHERE vec_id % 7 = 0)
                AS BIGINT) AS n_upd,
           CAST((SELECT COUNT(*) FROM corpus
                 WHERE vec_id % 7 <> 0 AND vec_id % 5 = 1)
                AS BIGINT) AS n_del,
           CAST(0 AS BIGINT) AS n_mismatch,
           CAST(1 AS BIGINT) AS replay_noop
    """,
)
def q_vecindex_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-driven index maintenance, DuckDB-oracled end-to-end (r9
    verdict #3): the index builds on the full corpus, the SOURCE then
    takes one merge commit carrying real churn — every %7==0 vector's
    embedding is UPDATED (reversed — a deterministic new vector) and
    every (%7!=0, %5==1) vector is DELETED (disjoint sets) — and ONE
    ``refresh_vector_index_cdc`` applies the changelog to the index.
    Checks folded into the hash:

      * n_total — the refreshed index covers exactly the post-churn
        source rows (deletes really hide codes, updates don't
        double them);
      * n_upd / n_del — fixture-integrity pins counted independently
        by both engines from the %-arithmetic;
      * n_mismatch = 0 — re-encoding the AUDIT SLICE of the post-churn
        source with the frozen quantizer and full-outer-joining on
        vec_id finds zero disagreements. The slice (r10 verdict #6,
        halving the suite's most expensive row without weakening the
        claim) is every churn-TOUCHED key — all updated rows (new
        codes must match a from-scratch encode bit-for-bit, cell
        moves included) and all deleted keys (a code wrongly
        surviving the eq-delete lands in the index side of the join
        with no source twin → mismatch) — plus the deterministic
        %11==3 sample of UNTOUCHED rows (their files were never
        rewritten — the refresh is O(changelog) by construction and
        the no-op-replay token pins that no later commit touched
        them — so a sample re-check of the carried codes is the
        proportionate audit; the pre-r11 full-corpus join re-proved
        byte-carries the manifest already guarantees);
      * replay_noop = 1 — a second refresh_vector_index_cdc call
        returns without committing (token checkpoint), the
        crash-replay contract.

    Scale shape: the refresh costs O(|changelog|) encode + one
    metadata commit; the mismatch audit is the QUERY's cost, not the
    operation's (a deployment runs it on samples — exactly what the
    audit slice is). Before this, any deleting/updating corpus
    stranded the index until a full rebuild epoch."""
    # fixture corpus = the seeded %2==0 half (r10 verdict #6's cost
    # trim, second half: every pinned count scales with the slice on
    # both engines, and none of the claims — bit-identity, delete
    # visibility, replay no-op — depends on corpus size)
    src, path = _cloned_index_fixture(
        spark, sf_dir, "vecindex_cdc", "vec_id % 2 = 0"
    )
    idx = _index_handle(path)
    state = src.read(spark)
    upd = (
        state.filter(F.col("vec_id") % 7 == 0)
        .select(
            "vec_id",
            "label",
            F.reverse("embedding").alias("embedding"),
            F.lit("U").alias("_op"),
        )
    )
    dele = (
        state.filter(
            (F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 5 == 1)
        )
        .select("vec_id", "label", "embedding", F.lit("D").alias("_op"))
    )
    # fixture-integrity pins in ONE aggregate pass (not two scans)
    cnt = state.agg(
        F.sum(
            F.when(F.col("vec_id") % 7 == 0, 1).otherwise(0)
        ).alias("u"),
        F.sum(
            F.when(
                (F.col("vec_id") % 7 != 0)
                & (F.col("vec_id") % 5 == 1),
                1,
            ).otherwise(0)
        ).alias("d"),
    ).collect()[0]
    n_upd, n_del = int(cnt["u"]), int(cnt["d"])
    src.merge(
        spark, upd.unionByName(dele), key="vec_id",
        _ops_validated=True,  # _op is F.lit("U")/F.lit("D") above
    )
    refresh_vector_index_cdc(spark, src, path)
    # replay with a FRESH handle (a restarted process): token found,
    # zero new commits
    before = len(_index_handle(path).snapshots())
    refresh_vector_index_cdc(spark, src, path)
    replay_noop = int(
        len(_index_handle(path).snapshots()) == before
    )
    quantizer = _load_quantizer(path, idx)
    # audit slice: churn-touched keys exactly + a 1/11 untouched
    # sample (see docstring) — pushed into both scans as one predicate
    aud = (
        (F.col("vec_id") % 7 == 0)
        | (F.col("vec_id") % 5 == 1)
        | (F.col("vec_id") % 11 == 3)
    )
    full = _encode(
        src.read(spark).select("vec_id", "embedding").filter(aud),
        quantizer,
    ).select(
        "vec_id",
        F.col("cell").alias("_fcell"),
        F.col("codes").alias("_fcodes"),
    )
    # ONE audit job (r11): n_total (every index row, audited or not)
    # and the slice's mismatch count fold into a single aggregate
    # over got ⟗ full — the checkpoint + two counts this replaces
    # were ~3 driver-visible jobs on a fixture whose wall time is
    # job-count-bound, not row-bound
    got = idx.read(spark).withColumn("_g", F.lit(1))
    joined = got.withColumn(
        "_a", F.when(aud, F.lit(1))
    ).join(full, "vec_id", "full_outer")
    row = joined.agg(
        F.sum("_g").alias("n_total"),
        F.sum(
            F.when(
                (
                    F.col("_a").isNotNull()
                    | F.col("_g").isNull()  # full-side-only row
                )
                & (
                    F.col("cell").isNull()
                    | F.col("_fcell").isNull()
                    | (F.col("cell") != F.col("_fcell"))
                    | (F.col("codes") != F.col("_fcodes"))
                ),
                1,
            ).otherwise(0)
        ).alias("mism"),
    ).collect()[0]
    n_total = int(row["n_total"] or 0)
    mism = int(row["mism"] or 0)
    return tiny_df(spark, 
        [(n_total, n_upd, n_del, mism, replay_noop)],
        "n_total bigint, n_upd bigint, n_del bigint, "
        "n_mismatch bigint, replay_noop bigint",
    )


@query(
    "q_vecindex_tune",
    oracle="""
    SELECT CAST(75 AS BIGINT) AS target_pct,
           CAST(8  AS BIGINT) AS nprobe,
           CAST(1  AS BIGINT) AS met,
           CAST(1  AS BIGINT) AS first_meeting_point,
           CAST(1  AS BIGINT) AS doubling_walk,
           CAST(4  AS BIGINT) AS n_curve_points
    """,
)
def q_vecindex_tune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``tune_nprobe`` — the FAISS nprobe-calibration workflow —
    DuckDB-oracled (r10 verdict #2): one persisted build, one
    batched-concurrent doubling walk against the exact twin at
    target recall 75 %. Oracled constants on the seeded corpus:

      * ``nprobe = 8`` — the chosen probe budget. Measured across
        sf0.001/0.01/0.1: recall@8 lands 82–84 % (≥7 points above
        target) while recall@4 lands 46–66 % (≥9 points below), so
        the step function's answer is stable wherever the driver
        runs it — a quantizer/ADC/re-rank quality regression moves
        the meeting point and breaks the hash, exactly like
        q_vecindex_recall's floor;
      * ``met`` / ``first_meeting_point`` — the walk stopped AT the
        target and every earlier curve point was below it (the
        contract that makes the chosen value minimal-up-to-2x);
      * ``doubling_walk`` / ``n_curve_points`` — the measured curve
        is exactly the doubling sequence 1,2,4,8 (log cost in the
        chosen budget, the efSearch-style calibration shape).

    Scale shape: the exact twin is a bounded broadcast probe scan and
    each walk point reads nprobe/C of the index's files via metadata
    pruning — a deployment calibrates an index of ANY size from a
    sample table; the batch evaluation keeps the wall time at ~one
    probe pass. Serves from the content-keyed shared fixture (r12,
    r11 verdict #6): the walk measures the FROZEN index, so one
    deterministic build serves recall and tune alike."""
    src, path = _shared_index_fixture(spark, sf_dir)
    out = tune_nprobe(spark, src, path, target_recall_pct=75.0)
    curve = out["curve"]
    first_meeting = int(
        all(r < 75.0 for _n, r in curve[:-1])
        and curve[-1][1] >= 75.0
    )
    doubling = int(
        [n for n, _r in curve]
        == [2**i for i in range(len(curve))]
    )
    return tiny_df(spark, 
        [
            (
                75,
                out["nprobe"],
                int(out["met"]),
                first_meeting,
                doubling,
                len(curve),
            )
        ],
        "target_pct bigint, nprobe bigint, met bigint, "
        "first_meeting_point bigint, doubling_walk bigint, "
        "n_curve_points bigint",
    )


# q_vecindex_filtered's oracle, staged for its r13 registration (r11
# verdict #4 capped this round's registrations at q_catalog_merge; the
# query + oracle + pytest land NOW so registering is a 3-line diff):
#   @query("q_vecindex_filtered", oracle=VECINDEX_FILTERED_ORACLE)
VECINDEX_FILTERED_ORACLE = """
    SELECT 'ivfpq_filtered'    AS method,
           CAST(5  AS BIGINT)  AS k,
           CAST(64 AS BIGINT)  AS floor_pct,
           CAST(1  AS BIGINT)  AS meets_floor,
           CAST(50 AS BIGINT)  AS n_pairs,
           CAST(0  AS BIGINT)  AS n_off_filter
"""


def q_vecindex_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-FILTERED ANN over the persisted index (r11 verdict
    #4): the production vector query — "nearest neighbors within
    lang/source/date-range" — as one predicate pushed into BOTH scans.
    The index is built with ``attrs=("label",)`` so the codes rows
    co-locate the attribute; ``where="label % 2 = 0"`` then prunes
    candidates INSIDE the probed cells' parquet scan (pre-filtering:
    non-matching codes never enter ADC or occupy shortlist slots) and
    again on the exact-rescore scan. Hash-pinned claims:

      * ``meets_floor`` — recall@5 vs the exact FILTERED brute-force
        twin ≥ 64 % (measured 74/78/78 % at sf0.001/0.01/0.1,
        nprobe=8 — ≥10 points of margin, the repo's floor
        discipline; the filtered floor sits below the unfiltered 72
        because the predicate empties ~half of every probed cell);
      * ``n_pairs = 50`` — every probe still fills its full top-k
        from the subspace (pre-filtering keeps result depth; a
        post-filter implementation would return short lists and
        break this pin);
      * ``n_off_filter = 0`` — nothing outside the predicate leaks
        into the result (the exactness half of the claim).

    Scale shape: identical to query_vector_index's — metadata isin
    pruning to nprobe/C of the files, the attribute predicate pushed
    to the parquet scan inside them, broadcast LUTs, JVM-side ADC;
    the filter only SHRINKS every stage."""
    src, base = _src_from_embeddings(spark, sf_dir, "vecindex_filt")
    path = f"{base}/idx"
    build_vector_index(spark, src, path, attrs=("label",))
    where = "label % 2 = 0"
    ann = query_vector_index(spark, path, src, where=where).select(
        "probe_id", "cand_id", "cand_label"
    )
    got = ann.collect()
    pairs = {(r.probe_id, r.cand_id) for r in got}
    off = sum(1 for r in got if int(r.cand_label) % 2 != 0)
    exact = exact_topk_pairs(spark, src, where=where)
    floor = 64
    hits = len(exact & pairs)
    return tiny_df(spark, 
        [
            (
                "ivfpq_filtered",
                TOP_K,
                floor,
                int(100 * hits >= floor * len(exact)),
                len(pairs),
                off,
            )
        ],
        "method string, k bigint, floor_pct bigint, "
        "meets_floor bigint, n_pairs bigint, n_off_filter bigint",
    )


def exact_topk_pairs(
    spark: SparkSession,
    src: SnapshotTable,
    k: int = TOP_K,
    n_probes: int = N_PROBES,
    where: str | None = None,
) -> set:
    """Exact brute-force top-k (probe_id, cand_id) pairs over an
    arbitrary source snapshot table — the scoring baseline
    ``tune_nprobe`` uses. Delegates to similarity.exact_topk (review
    catch, r10: one exact-twin convention, not two copies that
    desynchronize the recall baselines). ``where`` filters the
    candidate space only, the filtered-ANN twin contract."""
    from .similarity import exact_topk

    # full read (not a 2-column projection) so a where over attribute
    # columns resolves; Catalyst prunes the untouched columns anyway
    top = exact_topk(
        src.read(spark),
        k=k,
        n_probes=n_probes,
        cand_filter=where,
    )
    return {
        (r.probe_id, r.cand_id)
        for r in top.select("probe_id", "cand_id").collect()
    }


def tune_nprobe(
    spark: SparkSession,
    src: SnapshotTable,
    path: str,
    target_recall_pct: float,
    k: int = TOP_K,
    max_nprobe: int | None = None,
    batch: int = 4,
    where: str | None = None,
) -> dict:
    """The documented FAISS calibration workflow as ONE call (r10):
    measure recall@k of the persisted index against the exact twin at
    doubling nprobe values (1, 2, 4, ...) and return the SMALLEST
    measured nprobe meeting ``target_recall_pct`` — the dial a
    deployment turns before committing a probe budget, run on a
    sample table at any corpus size (the exact twin is a bounded
    broadcast scan; each index probe reads nprobe/C of the files).

    Returns ``{"nprobe", "recall_pct", "met", "curve"}`` where curve
    is the full measured [(nprobe, recall_pct), ...] — the artifact
    SCALE.md's recall-vs-cost tables are made of. Doubling (not
    linear) walk; the ADC re-rank budget is PROPORTIONAL to nprobe
    across the whole walk (rerank = ceil(VI_RERANK / VI_NPROBE) *
    nprobe — review catches, r10, twice: a FIXED shortlist depth
    lets added cells' quantization-noise candidates push a true
    neighbor below the cut, and a floor at the nprobe=VI_NPROBE
    total still shrank the PER-CELL depth 8x across the walk;
    strictly constant per-cell depth keeps the candidate-superset
    argument — and therefore monotone-up-to-ADC-noise recall —
    honest, the efSearch-style scaling FAISS users apply). The first
    meeting point is within 2x of the minimal one at log cost;
    callers wanting the exact minimum bisect the last interval with
    further calls. Raises if the source holds no probe vectors
    (vec_id < n_probes is empty): an empty exact baseline would
    otherwise report every recall as 0.0 and walk the full curve —
    a misconfiguration dressed as an index-quality result.

    The walk is evaluated in CONCURRENT batches of ``batch`` doubling
    points (r11): recall at a given nprobe is a pure function of the
    frozen index, so measuring 1/2/4/8 concurrently and taking the
    first meeting point returns the identical answer to the
    one-at-a-time walk at ~max instead of sum of the probe passes'
    wall time (the q_sim_ann_recall concurrency pattern — Spark
    schedules the three probe jobs side by side on one session). Up
    to ``batch - 1`` points past the meeting one are measured and
    discarded — wasted cluster-side work bounded by the batch, zero
    wasted wall time. ``batch=1`` recovers the strictly sequential
    walk.

    ``where`` (r12): calibrate on the FILTERED subspace — the exact
    baseline and every probe pass take the same candidate predicate,
    so the returned nprobe is the dial for the filtered query the
    deployment will actually run (an unfiltered calibration
    overstates recall when the filter empties probed cells)."""
    exact = exact_topk_pairs(spark, src, k=k, where=where)
    if not exact:
        raise ValueError(
            "tune_nprobe: the exact baseline is empty — the source "
            f"has no rows with vec_id < {N_PROBES}; re-key the "
            "sample (probes are the lowest n_probes vec_ids)"
        )
    total = len(exact)
    if max_nprobe is None:
        max_nprobe = VI_CELLS
    per_cell = -(-VI_RERANK // VI_NPROBE)  # ceil: constant depth
    points: list[int] = []
    nprobe = 1
    while True:
        points.append(nprobe)
        if nprobe >= max_nprobe:
            break
        nprobe = min(nprobe * 2, max_nprobe)

    def measure(np_: int) -> float:
        ann = {
            (r.probe_id, r.cand_id)
            for r in query_vector_index(
                spark,
                path,
                src,
                nprobe=np_,
                k=k,
                rerank=max(k, per_cell * np_),
                where=where,
            )
            .select("probe_id", "cand_id")
            .collect()
        }
        return round(100.0 * len(exact & ann) / total, 1)

    from concurrent.futures import ThreadPoolExecutor

    curve: list[tuple[int, float]] = []
    for i in range(0, len(points), max(batch, 1)):
        window = points[i : i + max(batch, 1)]
        if len(window) == 1:
            recs = [measure(window[0])]
        else:
            with ThreadPoolExecutor(len(window)) as ex:
                recs = list(ex.map(measure, window))
        for np_, rec in zip(window, recs):
            curve.append((np_, rec))
            if rec >= target_recall_pct or np_ >= max_nprobe:
                return {
                    "nprobe": np_,
                    "recall_pct": rec,
                    "met": rec >= target_recall_pct,
                    "curve": curve,
                }
    raise AssertionError("unreachable: the walk ends at max_nprobe")


def vector_index_stream_available_now(
    spark: SparkSession,
    src_glob: str,
    schema,
    table_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> SnapshotTable:
    """CONTINUOUS index maintenance: a file stream of (vec_id,
    embedding) rows lands in the source snapshot table and the
    persisted IVF-PQ index refreshes once per micro-batch — the
    vector-search twin of ``incremental_dedup_stream_available_now``
    (file_stream.py:398), composed entirely from proven exactly-once
    primitives.

    Per micro-batch (inside ``foreachBatch``, which is AT-LEAST-ONCE):
      1. ``append_once(batch, token=md5(batch row signature))`` — a
         replayed batch finds its token and no-ops (the commit-dedup
         idiom every streaming sink here uses). The token is derived
         from the batch's ROW CONTENT (count, vec_id range, an
         order-independent hash sum), not its ordinal and not its
         input files (review catches, r9: ``inputFiles()`` is empty
         inside foreachBatch here, and an ordinal token collides when
         a fresh-checkpoint rerun's batch numbering shifts); with
         content tokens an identical rerun no-ops row-for-row, and an
         EMPTY batch skips entirely — no rows, no token. The flip
         side is EXPLICIT (review catch, r10): a later batch whose
         rows are content-identical to a committed one also no-ops —
         which is CORRECT for this sink (the source is keyed by
         vec_id; re-delivered identical vectors must not double the
         table or the index), but means this stream deduplicates by
         content, not by delivery — a source that legitimately emits
         identical (vec_id, embedding) rows twice and MEANS it needs
         a delivery-id column folded into the row. Exactly-once
         across a rerun whose grouping genuinely differs (files split
         across different batches than the committed run) is out of
         contract — that is what the stream's CHECKPOINT is for;
         rebuild the index or keep the checkpoint;
      2. first batch ever: ``build_vector_index`` (itself an
         idempotent tokened overwrite); later batches:
         ``refresh_vector_index`` — encodes only the batch's rows
         (manifest set-difference), no-ops on ITS token when replayed.

    The quantizer therefore trains on the FIRST batch and stays
    frozen — the FAISS streaming posture (train on a bootstrap
    sample, add forever; retrain = a new build epoch, a planned
    operation, not something a stream does implicitly). At 100 TB
    each trigger costs O(batch) encode + one metadata commit; index
    freshness lags ingest by exactly one trigger."""
    from ..streaming.file_stream import apply_runtime_confs

    apply_runtime_confs(spark)
    tbl = SnapshotTable(table_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import hashlib

        rows = batch_df.select("vec_id", "embedding")
        # CONTENT token from the batch's ROWS, not its input files and
        # not its ordinal. batch_df.inputFiles() is EMPTY inside
        # foreachBatch on this Spark (the micro-batch plan carries no
        # file relation), so a file-set token silently degraded to the
        # ordinal fallback — the exact batch-regrouping replay hazard
        # content tokens exist to avoid (r9 ADVICE; a fresh-checkpoint
        # rerun whose batch numbering shifts could collide with an old
        # ordinal token and no-op a REAL batch). The order-independent
        # aggregate (count, id range, xor-free hash sum over full rows)
        # identifies the batch by what it CONTAINS: an identical rerun
        # no-ops row-for-row whatever the grouping; a genuinely
        # different regrouping (files split across batches differently
        # than the committed run) remains out of contract — that is
        # what the stream's CHECKPOINT is for.
        sig = rows.agg(
            F.count("*").alias("n"),
            F.min("vec_id").alias("lo"),
            F.max("vec_id").alias("hi"),
            F.sum(
                F.hash("vec_id", "embedding").cast("long")
            ).alias("h"),
        ).collect()[0]
        if sig["n"] == 0:
            # An empty batch commits NOTHING — no rows, no token; a
            # minted token would only create collision surface.
            return
        tok = (
            "vecstream-"
            + hashlib.md5(
                repr((sig["n"], sig["lo"], sig["hi"], sig["h"])).encode()
            ).hexdigest()[:16]
        )
        tbl.append_once(rows, token=tok)
        idx = _index_handle(index_dir)
        if _build_epoch(idx) is None:
            build_vector_index(batch_df.sparkSession, tbl, index_dir)
        else:
            refresh_vector_index(
                batch_df.sparkSession, tbl, index_dir
            )

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_glob)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return _index_handle(index_dir)
