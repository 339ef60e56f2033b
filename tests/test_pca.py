"""Property tests for q_emb_pca_project (rows-only: no SQL oracle can
express eigendecomposition, so parity is pinned against numpy's full PCA
on the same data)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from iceberg_insert_spark.llm.similarity import q_emb_pca_project

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def spark_proj(spark):
    return {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in q_emb_pca_project(spark, SF_DIR).collect()
    }


def _numpy_reference():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in rows]
    x = np.array([r[1] for r in rows], dtype=np.float64)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append(c)
    proj = (x - mu) @ np.array(comps).T
    return ids, proj, vals[order[::-1]][::-1]


def test_matches_numpy_pca(spark_proj):
    """Spark's two-phase Gram-matrix PCA == numpy full PCA (tolerance covers
    float32 inputs + E[xx^T]-mumu^T vs centered-Gram formulation)."""
    ids, proj, _ = _numpy_reference()
    for vid, ref in zip(ids, proj):
        got = spark_proj[vid]
        assert got[0] == pytest.approx(ref[0], abs=1e-3)
        assert got[1] == pytest.approx(ref[1], abs=1e-3)


def test_variance_ordering(spark_proj):
    """pc1 carries at least as much variance as pc2."""
    a = np.array(list(spark_proj.values()))
    assert a[:, 0].var() >= a[:, 1].var()


def test_deterministic(spark, spark_proj):
    """Re-running the operator reproduces identical rounded projections
    (deterministic eigenvector sign fix)."""
    again = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in q_emb_pca_project(spark, SF_DIR).collect()
    }
    assert again == spark_proj
