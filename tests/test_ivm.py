"""Incremental view maintenance (operators/ivm): stored aggregate
state folded batch by batch equals the full recompute — the
never-rescan-history refresh contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from stockanalyses_downloader_spark.operators import ivm
from stockanalyses_downloader_spark.sources.tables import load_table

SPECS = [("sum_price", "sum", "o_totalprice"),
         ("n_orders", "count", None),
         ("min_price", "min", "o_totalprice"),
         ("max_price", "max", "o_totalprice")]
DERIVED = [("avg_price", "sum_price", "n_orders")]


def _final_rows(df):
    out = ivm.finalize(df, SPECS, DERIVED)
    return {r["o_orderstatus"]:
            (r["sum_price"], r["n_orders"], r["min_price"],
             r["max_price"], r["avg_price"])
            for r in out.collect()}


def test_ivm_three_batches_equal_full_recompute(spark, tmp_path):
    """Three daily batches folded through refresh_aggregate_table
    produce EXACTLY the state (and finalized view incl. the algebraic
    average) of one aggregate over the concatenation — decimal state
    makes the equality bit-exact, not approximate."""
    o = load_table(spark, SF_SMALL, "orders")
    batches = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    path = str(tmp_path / "agg_state")
    for b in batches:
        ivm.refresh_aggregate_table(spark, path, b,
                                    ["o_orderstatus"], SPECS)
    got = _final_rows(spark.read.parquet(path))
    want = _final_rows(ivm.agg_state(o, ["o_orderstatus"], SPECS))
    assert got == want and len(got) > 1


def test_ivm_new_group_in_late_batch(spark, tmp_path):
    """A group that first appears in batch 2 seeds cleanly (the
    union-merge must not require the group to pre-exist)."""
    rows1 = [("A", 10.0), ("A", 20.0)]
    rows2 = [("B", 5.0), ("A", 30.0)]
    path = str(tmp_path / "late_group")
    for rows in (rows1, rows2):
        b = spark.createDataFrame(rows, "k string, v double")
        ivm.refresh_aggregate_table(
            spark, path, b, ["k"],
            [("s", "sum", "v"), ("n", "count", None),
             ("mn", "min", "v"), ("mx", "max", "v")])
    got = {r["k"]: (float(r["s"]), r["n"], r["mn"], r["mx"])
           for r in spark.read.parquet(path).collect()}
    assert got == {"A": (60.0, 3, 10.0, 30.0), "B": (5.0, 1, 5.0, 5.0)}


def test_ivm_crash_leaves_old_state_readable(spark, tmp_path):
    """The swap protocol: a refresh that dies after writing its temp
    dir (simulated) leaves the CURRENT table untouched and readable;
    stray temps don't shadow it."""
    import glob
    import os

    path = str(tmp_path / "crash_state")
    b1 = spark.createDataFrame([("A", 1.0)], "k string, v double")
    spec = [("s", "sum", "v"), ("n", "count", None)]
    ivm.refresh_aggregate_table(spark, path, b1, ["k"], spec)
    before = {(r["k"], float(r["s"]), r["n"])
              for r in spark.read.parquet(path).collect()}
    # simulate the crash window: a temp dir exists, no rename happened
    tmp = f"{path}.__tmp-deadbeef"
    os.makedirs(tmp)
    after = {(r["k"], float(r["s"]), r["n"])
             for r in spark.read.parquet(path).collect()}
    assert after == before
    # and a subsequent refresh still works
    b2 = spark.createDataFrame([("A", 2.0)], "k string, v double")
    ivm.refresh_aggregate_table(spark, path, b2, ["k"], spec)
    got = {(r["k"], float(r["s"]), r["n"])
           for r in spark.read.parquet(path).collect()}
    assert got == {("A", 3.0, 2)}
    assert glob.glob(f"{path}.__old-*") == []


def test_ivm_cdc_partial_refresh_equals_full_recompute(spark, tmp_path):
    """IVM under updates/deletes (the case append-only merge can't
    handle): changes flow through the CDC merge, touched_groups
    derives the affected group set (before-image groups + payload
    groups), refresh_groups recomputes ONLY those. Final state ==
    full recompute on the new base — including a row that MOVED
    between groups, a delete, an insert, and an untouched group.
    The partiality contract is proven by handing refresh_groups a
    source PRUNED to the touched groups' rows only: untouched
    groups never need scanning."""
    from stockanalyses_downloader_spark.operators import cdc

    base = spark.createDataFrame(
        [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 5.0),
         (4, "C", 7.0), (5, "E", 100.0)],
        "k long, grp string, v double")
    spec = [("s", "sum", "v"), ("n", "count", None),
            ("mn", "min", "v"), ("mx", "max", "v")]
    path = str(tmp_path / "cdc_state")
    ivm.refresh_aggregate_table(spark, path, base, ["grp"], spec)

    changes = spark.createDataFrame(
        [(1, 1, "U", "B", 11.0),    # k1 moves A -> B
         (3, 1, "D", None, None),   # k3 deleted from B
         (6, 1, "I", "D", 3.0)],    # new key in new group D
        "k long, seq long, op string, grp string, v double")
    new_base = cdc.apply_changelog(base, changes, "k", ["seq"],
                                   "op", ["grp", "v"])
    touched = ivm.touched_groups(base, changes, "k", ["grp"])
    tg = {r["grp"] for r in touched.collect()}
    assert {"A", "B", "D"} <= tg and "E" not in tg

    pruned = new_base.join(F.broadcast(touched), ["grp"], "semi")
    ivm.refresh_groups(spark, path, pruned, touched, ["grp"], spec)

    def snap(df):
        return {r["grp"]: (float(r["s"]), r["n"], r["mn"], r["mx"])
                for r in df.collect()}
    got = snap(spark.read.parquet(path))
    want = snap(ivm.agg_state(new_base, ["grp"], spec))
    assert got == want
    assert got["E"] == (100.0, 1, 100.0, 100.0)   # untouched, carried
    assert "C" in got        # untouched group survives the anti join
    assert got["B"] == (11.0, 1, 11.0, 11.0)      # move + delete net


def test_ivm_streaming_refresh_replay_is_exactly_once(spark, tmp_path):
    """refresh_aggregate_table_once refuses a replayed batch id (the
    at-least-once reality of foreachBatch after crash recovery) —
    applying (b0, b1, b1, b0) leaves exactly the (b0, b1) state; the
    marker rides the same atomic rename as the data."""
    spec = [("s", "sum", "v"), ("n", "count", None)]
    path = str(tmp_path / "stream_state")
    b0 = spark.createDataFrame([("A", 1.0), ("B", 2.0)], "k string, v double")
    b1 = spark.createDataFrame([("A", 10.0)], "k string, v double")
    assert ivm.refresh_aggregate_table_once(spark, path, b0, 0, ["k"], spec)
    assert ivm.refresh_aggregate_table_once(spark, path, b1, 1, ["k"], spec)
    assert not ivm.refresh_aggregate_table_once(spark, path, b1, 1,
                                                ["k"], spec)
    assert not ivm.refresh_aggregate_table_once(spark, path, b0, 0,
                                                ["k"], spec)
    got = {(r["k"], float(r["s"]), r["n"])
           for r in spark.read.parquet(path).collect()}
    assert got == {("A", 11.0, 2), ("B", 2.0, 1)}
    assert ivm.last_applied_batch(path) == 1


def test_ivm_streaming_crash_replay_matches_batch(spark, tmp_path):
    """End to end across a real crash: a foreachBatch wrapper dies
    AFTER the refresh applied batch 1 (first attempt only); the
    restarted query replays batch 1, the exactly-once guard skips
    it, and the final stored aggregate equals the whole-input batch
    aggregate bit-exactly."""
    spec = [("s", "sum", "v"), ("n", "count", None)]
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    rows1 = [("A", float(i)) for i in range(10)] + [("B", 5.0)]
    rows2 = [("A", 100.0), ("C", 7.0)]
    spark.createDataFrame(rows1, "k string, v double") \
        .coalesce(1).write.parquet(src)
    spark.createDataFrame(rows2, "k string, v double") \
        .coalesce(1).write.mode("append").parquet(src)

    inner = ivm.streaming_refresh(state, ["k"], spec)
    died = {"flag": False}

    def crashing(batch_df, batch_id):
        inner(batch_df, batch_id)
        if batch_id == 1 and not died["flag"]:
            died["flag"] = True
            raise RuntimeError("injected crash after side effect")

    stream = (spark.readStream.schema("k string, v double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(crashing)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    assert died["flag"]

    q2 = (spark.readStream.schema("k string, v double")
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream.foreachBatch(inner)
          .option("checkpointLocation", ck)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    got = {(r["k"], float(r["s"]), r["n"])
           for r in spark.read.parquet(state).collect()}
    whole = spark.createDataFrame(rows1 + rows2, "k string, v double")
    want = {(r["k"], float(r["s"]), r["n"])
            for r in ivm.agg_state(whole, ["k"], spec).collect()}
    assert got == want
