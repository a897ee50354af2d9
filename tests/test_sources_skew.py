from __future__ import annotations

import json

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.operators import skew
from stockanalyses_downloader_spark.queries.helpers import dsum
from stockanalyses_downloader_spark.sources import jobs_feed, synthetic
from stockanalyses_downloader_spark.streaming import sinks

SF = "/root/testdata/sf0.001"


def test_read_jobs_json_normalizes_actions(spark, tmp_path):
    feed = tmp_path / "jobs.jsonl"
    feed.write_text("\n".join([
        json.dumps({"downloader_jq_id": 1, "action": "1000",
                    "value": "btsp#XFC000000001", "type_idtype": "2"}),
        json.dumps({"downloader_jq_id": 2, "action": 1100,
                    "value": "btfx#XFC000000002", "type_idtype": 2}),
        json.dumps({"action": "oops", "value": "x"}),
    ]))
    jobs = jobs_feed.read_jobs_json(spark, str(feed))
    rows = {r["downloader_jq_id"]: r for r in jobs.collect()}
    assert rows[1]["action"] == 1000 and rows[1]["type_idtype"] == 2
    assert rows[2]["action"] == 1100
    assert rows[0]["action"] == 0          # malformed -> sentinel, not crash
    assert dict(jobs.dtypes)["action"] == "int"


def test_empty_jobs_schema(spark):
    df = jobs_feed.empty_jobs(spark)
    assert df.count() == 0
    assert df.columns == ["downloader_jq_id", "action", "value", "type_idtype"]


def test_salted_sum_matches_plain(spark):
    ev = synthetic.ticks(spark, SF)
    plain = {(r["isin"]): r["s"] for r in
             ev.groupBy("isin").agg(dsum(F.col("volume")).alias("s")).collect()}
    salted = {r["isin"]: r["sum_volume"] for r in
              skew.salted_sum(ev, "isin", "volume").collect()}
    assert salted == plain        # decimal accumulation -> bit-identical


def test_salt_replicate_join_matches_plain(spark):
    from stockanalyses_downloader_spark.dims.currency import currency_dim
    t = synthetic.ticks(spark, SF)
    dim = currency_dim(spark)
    plain = t.join(dim, "isin", "inner")
    salted = skew.salt_replicate_join(t, dim, "isin", n_salts=4)
    assert salted.count() == plain.count()
    pk = {(r["tick_id"], r["pair"]) for r in plain.select("tick_id", "pair").collect()}
    sk = {(r["tick_id"], r["pair"]) for r in salted.select("tick_id", "pair").collect()}
    assert pk == sk


def test_jobs_writeback_idempotent_replay(spark, tmp_path):
    """ST4/claim idempotence: replaying the same micro-batch leaves the
    jobs table unchanged (checkpoint replay safety)."""
    path = str(tmp_path / "jobs_table")
    wb = sinks.jobs_state_writeback(path)
    b = spark.createDataFrame([(1, 1300), (2, 1900)],
                              "downloader_jq_id long, action int")
    wb(b, 0)
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    wb(b, 0)   # replay
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second


def test_write_partitioned_prunes(spark, tmp_path):
    """Partitioned layout + partition pruning: a filter on the
    partition column scans only that directory."""
    from stockanalyses_downloader_spark.operators import pipeline
    from stockanalyses_downloader_spark.plans import explain_str

    t = pipeline.validate_http(synthetic.ticks(spark, SF))
    path = str(tmp_path / "by_exchange")
    sinks.write_partitioned(t, path, ["exchange"])

    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("exchange=")) == \
        ["exchange=btfx", "exchange=btsp"]

    rd = spark.read.parquet(path).filter(F.col("exchange") == "btsp")
    plan = explain_str(rd)
    assert "PartitionFilters" in plan and "btsp" in plan
    assert rd.count() == t.filter(F.col("exchange") == "btsp").count()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle —
    the write-once co-location contract."""
    from stockanalyses_downloader_spark.plans import explain_str
    from stockanalyses_downloader_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    sinks.write_bucketed(orders, "b_orders", "o_custkey", 8)
    sinks.write_bucketed(customer, "b_customer", "c_custkey", 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("b_orders")
             .join(spark.table("b_customer"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment").count())
        plan = explain_str(j)
        tree = plan.split("\n\n", 1)[0]
        n_exchanges = tree.count("Exchange") - tree.count("BroadcastExchange")
        # the join itself must be exchange-free; only the final
        # mktsegment aggregation may shuffle
        assert n_exchanges <= 1, plan
        assert "SortMergeJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
