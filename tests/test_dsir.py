"""DSIR importance resampling (operators/dsir.py): planted-semantics
pins (target-like docs outrank off-target docs), per-partition keep
accounting, and the no-global-sort guard. The cross-engine hash
certification lives in the registry sweep (dsir_selection_report)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import dsir


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_target_like_docs_score_higher(spark):
    target = _docs(spark, [
        (1, "t", "alpha beta gamma delta alpha beta"),
        (2, "t", "beta gamma alpha delta gamma"),
    ])
    raw = _docs(spark, [
        (10, "r", "alpha beta gamma delta"),          # target-like
        (11, "r", "zonk quux blarg frobnicate wibble"),  # off-target
        (12, "r", "alpha beta zonk quux"),            # mixed
    ])
    llr = dsir.dsir_bucket_llr(dsir.hashed_gram_buckets(target),
                               dsir.hashed_gram_buckets(raw))
    got = {r["doc_id"]: r["score"] for r in
           dsir.dsir_scores(raw, llr).collect()}
    assert got[10] > got[12] > got[11]


def test_select_keeps_top_fraction_per_partition(spark):
    scores = spark.createDataFrame(
        [(i, "s%d" % (i % 2), 10, float(i)) for i in range(16)],
        "doc_id long, source string, n_grams long, score double")
    sel = dsir.dsir_select(scores, 0.25, ["source"]).collect()
    kept = {r["doc_id"] for r in sel if r["kept"]}
    # 8 docs per source, keep floor(8*0.25)=2 — the 2 highest scores
    # in each parity class
    assert kept == {15, 13, 14, 12}
    for r in sel:
        assert r["kept"] == (r["rank"] <= 2)


def test_select_keeps_at_least_one(spark):
    scores = spark.createDataFrame(
        [(1, "only", 5, 0.5), (2, "only", 5, 0.4)],
        "doc_id long, source string, n_grams long, score double")
    sel = dsir.dsir_select(scores, 0.01, ["source"]).collect()
    assert sum(1 for r in sel if r["kept"]) == 1
    assert next(r for r in sel if r["kept"])["doc_id"] == 1


def test_select_refuses_global_sort(spark):
    scores = spark.createDataFrame([(1, 5, 0.5)],
                                   "doc_id long, n_grams long, score double")
    with pytest.raises(ValueError, match="partition_cols"):
        dsir.dsir_select(scores, 0.5, [])


def test_llr_model_is_bucket_bounded(spark):
    """The model is exactly n_buckets rows regardless of vocabulary —
    the hashing-trick bound that makes the broadcast join safe at any
    corpus size."""
    target = _docs(spark, [(1, "t", "a b c d e f g h i j")])
    raw = _docs(spark, [(2, "r", "k l m n o p q r s t u v w x y z")])
    llr = dsir.dsir_bucket_llr(dsir.hashed_gram_buckets(target),
                               dsir.hashed_gram_buckets(raw),
                               n_buckets=64)
    assert llr.count() == 64
    assert llr.filter(F.col("llr").isNull()).count() == 0
