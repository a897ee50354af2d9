"""Bucketed-table layout (sources/bucketing.py): the write-once
pre-shuffle that makes every later equi-join/groupBy on the bucket key
exchange-free. The assertions here are PLAN pins — the point of
bucketing is what does NOT appear in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stockanalyses_downloader_spark.sources import bucketing
from stockanalyses_downloader_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    """orders + lineitem written bucketed by the join key into a
    throwaway database (explicit LOCATION keeps files out of the
    repo's spark-warehouse)."""
    loc = tmp_path_factory.mktemp("bucketed_db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bucketing.write_bucketed(o, "bktest.orders_b", ["o_orderkey"],
                             sort_cols=["o_orderkey"])
    bucketing.write_bucketed(li, "bktest.lineitem_b", ["l_orderkey"],
                             sort_cols=["l_orderkey"])
    yield "bktest.orders_b", "bktest.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def _with_smj(spark):
    """Force SortMergeJoin so the exchange-free claim is tested on the
    join strategy bucketing targets (broadcast would trivially have no
    shuffle)."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    return saved, saved_aqe


def _restore(spark, saved, saved_aqe):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    if saved_aqe is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       saved_aqe)


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """The headline: orders_b ⋈ lineitem_b on the bucket key plans a
    SortMergeJoin with ZERO Exchange nodes — both sides stream their
    co-located buckets. The same join on the raw parquet tables
    shuffles both sides (sanity leg: the pin isn't vacuous)."""
    ob, lb = bucketed_tables
    saved = _with_smj(spark)
    try:
        j = (bucketing.read_bucketed(spark, ob)
             .join(bucketing.read_bucketed(spark, lb),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .select("o_orderkey", "l_linenumber", "o_totalprice"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        raw = (load_table(spark, sf_dir, "orders")
               .join(load_table(spark, sf_dir, "lineitem"),
                     F.col("o_orderkey") == F.col("l_orderkey"))
               .select("o_orderkey", "l_linenumber", "o_totalprice"))
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan

        # and the exchange-free plan is still CORRECT: row counts match
        assert j.count() == raw.count()
    finally:
        _restore(spark, *saved)


def test_bucketed_join_sorted_buckets_skip_sort(spark, bucketed_tables):
    """sortBy at write time removes the per-task Sort before the
    merge join: with the one-file-per-bucket layout the writer
    guarantees and the (Spark>=3.0 opt-in) legacy.outputOrdering
    flag, the executed plan reads pre-sorted buckets — no Exchange
    AND no Sort."""
    ob, lb = bucketed_tables
    saved = _with_smj(spark)
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = (bucketing.read_bucketed(spark, ob)
             .join(bucketing.read_bucketed(spark, lb),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .select("o_orderkey", "l_linenumber"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ")
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
        _restore(spark, *saved)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key also skips the shuffle: the
    partial/final HashAggregate pair collapses onto the bucket
    layout."""
    _, lb = bucketed_tables
    agg = (bucketing.read_bucketed(spark, lb)
           .groupBy("l_orderkey").agg(F.count("*").alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_raw_parquet_read_loses_bucket_spec(spark, bucketed_tables):
    """The documented trap: bypassing the catalog re-introduces the
    shuffle — the bucket metadata lives in the catalog, not the
    files."""
    ob, lb = bucketed_tables
    loc_o = spark.sql(f"DESCRIBE FORMATTED {ob}").filter(
        F.col("col_name") == "Location").collect()[0]["data_type"]
    loc_l = spark.sql(f"DESCRIBE FORMATTED {lb}").filter(
        F.col("col_name") == "Location").collect()[0]["data_type"]
    saved = _with_smj(spark)
    try:
        j = (spark.read.parquet(loc_o)
             .join(spark.read.parquet(loc_l),
                   F.col("o_orderkey") == F.col("l_orderkey")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        _restore(spark, *saved)
