"""Weighted sampling (A-ES) + HLL set algebra: python-parity pinned
selection, weight-mass sanity, and the inclusion-exclusion overlap
band."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import sampling, sketches
from stockanalyses_downloader_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_priority(key, weight, salt=""):
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()[:8]
    u = (int(h, 16) + 1.0) / 16 ** 8
    return u ** (1.0 / weight)


def test_weighted_sample_matches_python_selection(spark):
    """Exact same 64 docs as the pure-Python replica of the priority
    arithmetic — reproducibility is the operator's whole point."""
    docs = load_table(spark, SF, "documents")
    rows = docs.select("doc_id", "n_chars").collect()
    want = sorted(rows,
                  key=lambda r: (-_py_priority(r["doc_id"], r["n_chars"]),
                                 r["doc_id"]))[:64]
    got = sampling.weighted_sample(docs, 64, "n_chars", "doc_id") \
        .select("doc_id").collect()
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in want}

    # and a second run is bit-identical (determinism)
    again = sampling.weighted_sample(docs, 64, "n_chars", "doc_id") \
        .select("doc_id").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}


def test_weighted_sample_weight_mass_and_exclusions(spark):
    """A weight-dominant row is always selected at n=1; zero/negative/
    NULL weights never appear."""
    rows = [(0, 1e9)] + [(i, 1e-9) for i in range(1, 200)] \
        + [(500, 0.0), (501, -3.0), (502, None)]
    df = spark.createDataFrame(rows, "k long, w double")
    got = sampling.weighted_sample(df, 1, "w", "k").collect()
    assert [r["k"] for r in got] == [0]
    full = sampling.weighted_sample(df, 1000, "w", "k").collect()
    picked = {r["k"] for r in full}
    assert picked.isdisjoint({500, 501, 502})
    assert len(picked) == 200

    # independent salts redraw: across 12 salts, a 10x-weighted row
    # out-selects a 1x row at n=1 most of the time
    two = spark.createDataFrame([(1, 10.0), (2, 1.0)], "k long, w double")
    wins = sum(
        sampling.weighted_sample(two, 1, "w", "k", salt=f"s{i}")
        .first()["k"] == 1
        for i in range(12))
    assert wins >= 8, wins


def test_hll_intersection_band(spark):
    """Two 30k-distinct sets sharing 15k items: inclusion-exclusion
    recovers the overlap within a compounded band (3 estimates at
    ~6.5% RSE each -> accept 35%); near-disjoint sets estimate near
    zero (|est| small relative to set size)."""
    a = spark.range(30_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("item"))
    b = spark.range(15_000, 45_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("item"))
    ga, gb = sketches.hll_build(a, "item"), sketches.hll_build(b, "item")
    r = sketches.hll_intersection_estimate(ga, gb).first()
    assert abs(r["est_intersection"] - 15_000) / 15_000 < 0.35, r

    c = spark.range(60_000, 90_000).select(
        F.concat(F.lit("x"), F.col("id")).alias("item"))
    gc = sketches.hll_build(c, "item")
    r2 = sketches.hll_intersection_estimate(ga, gc).first()
    assert abs(r2["est_intersection"]) < 0.15 * 30_000, r2
