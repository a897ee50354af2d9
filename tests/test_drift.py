"""Embedding-distribution drift (embedding_drift_report): planted
mean-shift semantics — the shifted group must dominate every drift
statistic; identically-distributed groups sit near zero. The
cross-engine hash certification lives in the registry sweep."""

from __future__ import annotations


def test_planted_shift_dominates_drift(spark, tmp_path):
    import pyspark.sql.functions as F

    from stockanalyses_downloader_spark.queries.similarity_queries import (
        embedding_drift_report)

    # label 0/1: same deterministic distribution; label 2: dim-0
    # shifted by +3
    rows = []
    for i in range(300):
        base = [((i * 7 + d * 13) % 11 - 5) / 5.0 for d in range(8)]
        label = i % 3
        if label == 2:
            base[0] += 3.0
        rows.append((i, base, label))
    src = str(tmp_path / "emb")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                "label int") \
        .write.parquet(src + "/embeddings.parquet")

    got = {r["label"]: r for r in
           embedding_drift_report(spark, src).collect()}
    assert set(got) == {0, 1, 2}
    # the +3 shift on one of three groups moves the CORPUS mean by
    # ~+1 on dim 0, so the clean groups drift ~1 and the shifted one
    # ~2 — dominance is 2x on the mean stats, larger on the KL
    # (quadratic in the shift)
    for stat in ("mean_shift_l2", "worst_dim_shift"):
        assert got[2][stat] > 1.8 * max(got[0][stat], got[1][stat]), stat
    assert got[2]["sym_kl_diag"] > 2 * max(got[0]["sym_kl_diag"],
                                           got[1]["sym_kl_diag"])
    assert 1.5 < got[2]["worst_dim_shift"] < 2.5
    assert got[2]["n_vecs"] == 100
