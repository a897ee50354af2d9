"""Analytics-tier semantics: funnel order-sensitivity, cohort
retention offsets, and grouped OLS pinned against numpy — the planted
scenarios the corpus-level oracles can't single out."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F


def _write_events(spark, rows, td):
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .write.parquet(os.path.join(td, "events.parquet")))


def test_funnel_is_order_sensitive(spark):
    """A purchase BEFORE the first post-signup click must not convert;
    the same events in funnel order must. Users without a signup never
    appear (they did not enter the funnel)."""
    from stockanalyses_downloader_spark.queries.relational_queries import (
        signup_conversion_funnel)

    def ts(d, h=0):
        return datetime(2024, 5, d, h)

    rows = [
        # user 1: signup -> click -> purchase  => converted
        (1, ts(1), 1, "signup", 0.0, "{}"),
        (2, ts(2), 1, "click", 0.0, "{}"),
        (3, ts(3), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE click => not converted (stage 2 only)
        (4, ts(1), 2, "signup", 0.0, "{}"),
        (5, ts(2), 2, "purchase", 0.0, "{}"),
        (6, ts(3), 2, "click", 0.0, "{}"),
        # user 3: click before signup doesn't count; no click after
        (7, ts(2), 3, "click", 0.0, "{}"),
        (8, ts(3), 3, "signup", 0.0, "{}"),
        # user 4: never signed up => not in the funnel at all
        (9, ts(1), 4, "click", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["user_id"]: r for r in
               signup_conversion_funnel(spark, td).collect()}

    assert set(out) == {1, 2, 3}
    assert out[1]["converted"] and out[1]["purchase_ts"] == ts(3)
    assert not out[2]["converted"]
    assert out[2]["click_ts"] == ts(3) and out[2]["purchase_ts"] is None
    assert out[3]["click_ts"] is None and not out[3]["converted"]


def test_retention_cohort_offsets(spark):
    """Cohort anchor is the FIRST event's week; later activity lands
    at integer week offsets; two users anchored in different weeks
    form separate cohorts."""
    from stockanalyses_downloader_spark.queries.relational_queries import (
        weekly_retention_cohorts)

    # 2024-05-06 and 2024-05-13 are Mondays
    rows = [
        (1, datetime(2024, 5, 7), 1, "view", 0.0, "{}"),    # wk0
        (2, datetime(2024, 5, 15), 1, "view", 0.0, "{}"),   # wk1
        (3, datetime(2024, 5, 29), 1, "view", 0.0, "{}"),   # wk3
        (4, datetime(2024, 5, 14), 2, "view", 0.0, "{}"),   # wk0 (own)
        (5, datetime(2024, 5, 16), 2, "view", 0.0, "{}"),   # wk0 too
    ]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        got = {(r["cohort_week"].date().isoformat(), r["week_offset"]):
               r["n_users"]
               for r in weekly_retention_cohorts(spark, td).collect()}

    assert got == {("2024-05-06", 0): 1, ("2024-05-06", 1): 1,
                   ("2024-05-06", 3): 1, ("2024-05-13", 0): 1}


def test_ols_trend_matches_numpy(spark):
    """Grouped closed-form OLS vs numpy.polyfit on a planted series
    with known slope + noise: slope/intercept to 1e-9, r² to 1e-9,
    and a constant-x group yields NULL slope instead of dividing by
    zero."""
    from stockanalyses_downloader_spark.operators import pipeline  # noqa: F401
    from stockanalyses_downloader_spark.queries.reference_queries import (
        isin_price_trend)

    base = datetime(2024, 1, 1)
    xs = list(range(0, 600, 7))
    ys = [3.5 * x + 100 + ((x * 37) % 11 - 5) * 0.25 for x in xs]
    # event_id starts at 1: id 0 would draw the synthetic feed's
    # every-97th status=500 and be filtered out of the fit
    rows = [(i + 1, datetime.fromtimestamp(base.timestamp() + x),
             2, "view", y, "{}")
            for i, (x, y) in enumerate(zip(xs, ys))]
    # user_id=2 -> even -> exchange btsp; isin XFC000000003
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = {r["isin"]: r for r in isin_price_trend(spark, td).collect()}

    isin = next(iter(out))
    r = out[isin]
    slope_np, icpt_np = np.polyfit(np.array(xs, dtype=float),
                                   np.array(ys, dtype=float), 1)
    assert r["slope"] == pytest.approx(slope_np, rel=1e-9)
    assert r["intercept"] == pytest.approx(icpt_np, rel=1e-9)
    corr = np.corrcoef(xs, ys)[0, 1]
    assert r["r2"] == pytest.approx(corr ** 2, rel=1e-9)


def test_ols_trend_degenerate_group_is_null(spark):
    """All ticks at ONE instant: zero x-variance -> NULL slope/r2,
    no exception."""
    from stockanalyses_downloader_spark.queries.reference_queries import (
        isin_price_trend)

    t0 = datetime(2024, 2, 1)
    rows = [(i, t0, 4, "view", 10.0 + i, "{}") for i in range(5)]
    with tempfile.TemporaryDirectory() as td:
        _write_events(spark, rows, td)
        out = isin_price_trend(spark, td).collect()
    assert len(out) == 1
    assert out[0]["slope"] is None and out[0]["r2"] is None


def test_bootstrap_weights_and_se_theory_band(spark):
    """Deterministic Poisson bootstrap: (1) per-replicate weights
    behave like Poisson(1) — each replicate's weight SUM is n within
    a 5-sigma band; (2) the bootstrap SE of a total tracks the
    theoretical sqrt(sum x_i^2) within a wide band; (3) two runs are
    IDENTICAL (the reproducibility the hash derivation exists for)."""
    import math

    from pyspark.sql import functions as F
    from stockanalyses_downloader_spark.operators import bootstrap
    from stockanalyses_downloader_spark.sources.tables import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    n = o.count()
    # weight-sum sanity on 3 replicates
    for rep in (0, 1, 7):
        w = bootstrap.poisson_weight(bootstrap.uniform_from(
            F.col("o_orderkey"), F.lit(rep)))
        s = o.select(w.alias("w")).agg(F.sum("w").alias("s")).first()["s"]
        assert abs(s - n) < 5 * math.sqrt(n), (rep, s, n)

    reps = bootstrap.bootstrap_replicates(o, "o_orderkey",
                                          "o_totalprice", b=64)
    got = bootstrap.bootstrap_summary(reps).first()
    sum_sq = o.agg(F.sum(
        (F.col("o_totalprice") * F.col("o_totalprice"))
        .cast("decimal(38,6)")).cast("double").alias("s")).first()["s"]
    theory = math.sqrt(sum_sq)
    assert 0.6 * theory < got["boot_se"] < 1.5 * theory
    again = bootstrap.bootstrap_summary(
        bootstrap.bootstrap_replicates(o, "o_orderkey",
                                       "o_totalprice", b=64)).first()
    assert (got["boot_mean"], got["boot_se"]) == \
        (again["boot_mean"], again["boot_se"])
