"""quality_model: the distributed logistic-regression trainer is
pinned against a single-threaded pure-numpy batch-GD reference on the
SAME features (third-oracle style, like BPE's), and the learned model
must actually separate a planted task."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import quality_model as qm
from stockanalyses_downloader_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _numpy_gd(X, y, n_iter, lr):
    w = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / n
    return w


def test_train_logistic_matches_numpy_reference(spark):
    """Same features, same labels, same update rule: the distributed
    trainer's weights after 15 iterations must match numpy's within
    1e-6 (decimal gradient accumulation keeps the distributed sums
    order-independent; residual drift is exp()'s last ulp)."""
    d = load_table(spark, SF, "documents")
    feats = qm.surface_features(d).join(
        d.select("doc_id", (F.col("lang") == "en").alias("y")), "doc_id")
    rows = feats.orderBy("doc_id").collect()
    X = np.array([r["x"] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    expected = _numpy_gd(X, y, n_iter=15, lr=1.0)
    got = qm.train_logistic(feats, "y", n_iter=15, lr=1.0)
    assert np.max(np.abs(np.array(got) - expected)) < 1e-6, (got, expected)


def test_trained_model_separates_planted_task(spark):
    """A task surface features CAN express — digit-heavy junk vs
    alphabetic prose — must be learned to >= 95% accuracy in a few
    iterations; the frozen quality prior must rank the prose doc
    above the junk doc too (its whole reason to exist)."""
    rows = []
    for i in range(60):
        rows.append((i, " ".join(f"word{j} text here" for j in range(8))
                     .replace(str(i % 10), ""), 1))
        rows.append((1000 + i,
                     " ".join(f"{i}{j}937 4459 x9" for j in range(8)), 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    feats = qm.surface_features(df).join(df.select("doc_id", "y"), "doc_id")
    w = qm.train_logistic(feats, "y", n_iter=25, lr=2.0)
    scored = qm.score_with_weights(feats, w).join(
        df.select("doc_id", "y"), "doc_id")
    acc = scored.select(F.avg(
        ((F.col("prob") > 0.5) == (F.col("y") == 1)).cast("double"))
    ).first()[0]
    assert acc >= 0.95, acc

    from stockanalyses_downloader_spark.queries.text_queries import (
        _QUALITY_W)
    prior = {r["doc_id"]: r["logit"] for r in
             qm.score_with_weights(feats, _QUALITY_W).collect()}
    assert prior[0] > prior[1000]   # prose above digit soup


def test_surface_features_edge_rows(spark):
    """Empty and single-char docs produce finite, well-shaped feature
    vectors (no div-by-zero under ANSI; bias always 1)."""
    df = spark.createDataFrame(
        [(0, ""), (1, " "), (2, "a"), (3, "7")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["x"] for r in qm.surface_features(df).collect()}
    for i, x in out.items():
        assert len(x) == len(qm.FEATURE_NAMES)
        assert x[0] == 1.0
        assert all(np.isfinite(v) for v in x), (i, x)
    assert out[2][2] == pytest.approx(1.0)   # 'a' is all-alpha
    assert out[3][3] == pytest.approx(1.0)   # '7' is all-digit


def test_source_level_split_has_no_group_leakage(spark):
    """Every source maps to exactly ONE split (the guarantee the
    query exists for), and doc-level splitting on the same corpus
    demonstrably violates it (some source straddles splits) — i.e.
    the group-level variant isn't vacuously equal to the doc-level
    one on this corpus."""
    from stockanalyses_downloader_spark.queries.text_queries import (
        source_level_split_assignment, doc_split_assignment)
    from stockanalyses_downloader_spark.sources.tables import load_table

    by_source = (source_level_split_assignment(spark, SF)
                 .groupBy("source")
                 .agg(F.countDistinct("split").alias("n")))
    assert by_source.filter(F.col("n") > 1).count() == 0

    d = load_table(spark, SF, "documents").select("doc_id", "source")
    doc_level = doc_split_assignment(spark, SF).join(d, ["doc_id"])
    straddling = (doc_level.groupBy("source")
                  .agg(F.countDistinct("split").alias("n"))
                  .filter(F.col("n") > 1).count())
    assert straddling > 0   # doc-level leaks across groups here


def test_countmin_never_underestimates_and_merges(spark):
    """Count-min contracts: (1) estimate >= true count for EVERY
    token (the one-sided guarantee); (2) overestimation stays inside
    the classic e*N/width band for the median probe; (3) sketches of
    two half-corpora MERGE by bucket addition into exactly the
    whole-corpus sketch — the re-aggregation property that justifies
    a sketch over the exact histogram."""
    from stockanalyses_downloader_spark.operators import sketches
    from stockanalyses_downloader_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .alias("token"))
    exact = {r["token"]: r["n"] for r in
             toks.groupBy("token").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())

    sketch = sketches.countmin_build(toks, "token")
    probes = spark.createDataFrame(
        [(t,) for t in sorted(exact)[:200]], "token string")
    est = {r["token"]: r["est"] for r in
           sketches.countmin_estimate(sketch, probes, "token").collect()}
    overs = []
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])
        overs.append(e - exact[t])
    overs.sort()
    bound = 2.718 * n_total / sketches.CM_WIDTH
    assert overs[len(overs) // 2] <= bound, (overs[len(overs) // 2], bound)

    half1 = sketches.countmin_build(
        toks.filter(F.col("doc_id") % 2 == 0), "token")
    half2 = sketches.countmin_build(
        toks.filter(F.col("doc_id") % 2 == 1), "token")
    merged = {(r["row_id"], r["bucket"]): r["c"] for r in
              sketches.countmin_merge(half1, half2).collect()}
    whole = {(r["row_id"], r["bucket"]): r["c"] for r in
             sketch.collect()}
    assert merged == whole


def test_split_leakage_report_flags_cross_split_pairs(spark):
    """Planted leakage: near-identical docs whose doc_ids hash into
    train (1), val (0) and test (3) must produce off-diagonal rows —
    the eval-contamination signal the report exists to surface — and
    an unrelated doc contributes nothing."""
    import tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq
    from stockanalyses_downloader_spark.queries.similarity_queries import (
        split_leakage_report)

    base = ("the quarterly report shows steady growth across all "
            "regional markets with revenue up and costs contained")
    rows = [(1, base + " alpha"),        # train (md5 split of doc_id)
            (0, base + " beta"),         # val
            (3, base + " gamma"),        # test
            (44, " ".join(f"zz{i}" for i in range(40)))]  # unrelated
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), f"{d}/documents.parquet")
    got = {(r["split_a"], r["split_b"]): r["n_near_dup_pairs"]
           for r in split_leakage_report(spark, d).collect()}
    assert got == {("train", "val"): 1, ("test", "train"): 1,
                   ("test", "val"): 1}


def test_roc_auc_matches_brute_force_pairs(spark):
    """The midrank AUC equals the probabilistic definition computed
    by brute pair enumeration (ties counted 1/2) on a planted score
    set WITH duplicated scores across both classes."""
    rows = [(1.0, 1), (1.0, 0), (0.5, 1), (0.5, 0), (0.5, 1),
            (0.2, 0), (0.2, 0), (0.9, 1), (0.1, 0), (0.9, 0)]
    from stockanalyses_downloader_spark.operators import quality_model as qm

    df = spark.createDataFrame(rows, "logit double, y int")
    got = qm.roc_auc(df, "logit", "y").collect()[0]

    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - num / (len(pos) * len(neg))) < 1e-12


def test_roc_auc_bucketed_prefix_sum_parity(spark):
    """The two-level bucket prefix sum is a pure reorganization of the
    midrank summation: on a 2000-row continuous score set (every score
    distinct — the regime that used to serialize onto one task) the
    result matches the exact pure-Python Mann-Whitney AUC at 1e-12
    for EVERY bucket geometry, including the degenerate n_buckets=1
    (single bucket = the old single-window shape) and n_buckets far
    above the distinct-score count (one score per bucket)."""
    import random
    from stockanalyses_downloader_spark.operators import quality_model as qm

    rng = random.Random(77)
    rows = [(rng.gauss(1.0 if i % 3 == 0 else 0.0, 1.0), 1 if i % 3 == 0 else 0)
            for i in range(2000)]
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    import bisect
    num = sum(bisect.bisect_left(neg, p)
              + 0.5 * (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p))
              for p in pos)
    want = num / (len(pos) * len(neg))

    df = spark.createDataFrame(rows, "logit double, y int")
    for nb in (1, 3, 64, 4096, 1 << 20):
        got = qm.roc_auc(df, "logit", "y", n_buckets=nb).collect()[0]
        assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
        assert abs(got["auc"] - want) < 1e-12, (nb, got["auc"], want)


def test_roc_auc_boundary_values(spark):
    """Perfect separation = 1.0; inverted separation = 0.0; a
    constant score (all ties) = 0.5 exactly."""
    from stockanalyses_downloader_spark.operators import quality_model as qm

    perfect = spark.createDataFrame(
        [(2.0, 1), (1.9, 1), (0.1, 0), (0.0, 0)], "logit double, y int")
    assert qm.roc_auc(perfect).collect()[0]["auc"] == 1.0
    inverted = spark.createDataFrame(
        [(0.0, 1), (0.1, 1), (1.9, 0), (2.0, 0)], "logit double, y int")
    assert qm.roc_auc(inverted).collect()[0]["auc"] == 0.0
    ties = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "logit double, y int")
    assert qm.roc_auc(ties).collect()[0]["auc"] == 0.5
