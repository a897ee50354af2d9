"""Distributed PCA vs numpy full-batch PCA (third-oracle style): the
covariance hash-match lives in the oracle suite; these pin the eigen
step and the projection semantics."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_SMALL

from stockanalyses_downloader_spark.operators import pca
from stockanalyses_downloader_spark.sources.tables import load_table

K = 6


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


@pytest.fixture(scope="module")
def np_corpus(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    return (np.array([r["vec_id"] for r in rows]),
            np.array([[float(x) for x in r["embedding"]] for r in rows]))


def test_covariance_matches_numpy(spark, emb, np_corpus):
    _, X = np_corpus
    expected = np.cov(X, rowvar=False, bias=True)  # population cov
    got = {(r["dim_i"], r["dim_j"]): r["cov"]
           for r in pca.embedding_covariance(emb).collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == pytest.approx(expected[i, j],
                                                rel=1e-9, abs=1e-12)


def test_pca_projection_matches_numpy(spark, emb, np_corpus):
    """Projections equal numpy's eigh-based PCA componentwise (sign
    already normalized by the model contract), and captured variance
    is non-increasing across components."""
    ids, X = np_corpus
    means, comps = pca.pca_model(emb, k=K)
    C = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:K]
    expected_comps = []
    for idx in order:
        c = vecs[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        expected_comps.append(c)
    for got_c, exp_c in zip(comps, expected_comps):
        assert np.allclose(got_c, exp_c, atol=1e-6)

    proj = {r["vec_id"]: r["proj"] for r in
            pca.project_embeddings(emb, means, comps).collect()}
    Xc = X - np.array(means)
    expected_proj = Xc @ np.array(comps).T
    got = np.array([proj[i] for i in ids])
    assert np.allclose(got, expected_proj, atol=1e-6)

    var = got.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(K - 1)), var


def test_pca_empty_and_zero_length_inputs(spark):
    """ADVICE r4: empty embeddings -> clear ValueError (not an opaque
    max() crash); zero-length vectors are dropped from the covariance
    rather than erroring under ANSI on element_at(v, 0)."""
    import pytest
    from stockanalyses_downloader_spark.operators import pca

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca.pca_model(empty, k=2)

    mixed = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, []), (2, [3.0, 5.0])],
        "vec_id long, embedding array<float>")
    rows = {(r["dim_i"], r["dim_j"]): r["cov"]
            for r in pca.embedding_covariance(mixed).collect()}
    # covariance over the two NON-EMPTY rows: var(x0)=1, var(x1)=2.25
    assert rows[(0, 0)] == pytest.approx(1.0)
    assert rows[(1, 1)] == pytest.approx(2.25)
    assert rows[(0, 1)] == pytest.approx(1.5)
