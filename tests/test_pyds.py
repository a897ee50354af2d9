"""Custom Python DataSource (sources/pyds.py): batch partition
planning, filter pushdown pruning, streaming offset bookkeeping — the
Spark-4 DataSource API surface."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stockanalyses_downloader_spark.sources import pyds

PAIRS = [f"p{i:02d}eur" for i in range(20)]
OPTS = {"pairs": ",".join(PAIRS), "chunk": "8"}


def test_batch_source_reads_partition_parallel(spark):
    """spark.read.format('tickersnap'): schema as declared, one row
    per (exchange, pair), and partition planning = exchanges x
    ceil(pairs/chunk) — the fetch parallelism unit."""
    pyds.register(spark)
    df = (spark.read.format("tickersnap")
          .options(**OPTS).load())
    assert df.schema == pyds.SNAP_SCHEMA
    rows = df.collect()
    assert len(rows) == 2 * len(PAIRS)
    assert {r["exchange"] for r in rows} == {"btsp", "btfx"}
    # deterministic fixture: same read twice = identical rows
    again = (spark.read.format("tickersnap").options(**OPTS).load()
             .collect())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # partition planning: 2 exchanges x ceil(20/8) = 6 reader splits
    reader = pyds.TickerSnapReader(dict(OPTS))
    assert len(reader.partitions()) == 6


def test_batch_source_pushdown_prunes_partitions(spark):
    """An exchange-equality filter prunes whole partitions at PLAN
    time (the reader keeps only that exchange's chunks), and the
    end-to-end filtered read stays correct. Unsupported filters are
    handed back for Spark to re-apply."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    reader = pyds.TickerSnapReader(dict(OPTS))
    leftover = reader.pushFilters([EqualTo(("exchange",), "btsp"),
                                   GreaterThan(("bid",), 0.0)])
    assert [type(f).__name__ for f in leftover] == ["GreaterThan"]
    assert len(reader.partitions()) == 3  # one exchange's chunks only

    pyds.register(spark)
    df = (spark.read.format("tickersnap").options(**OPTS).load()
          .filter(F.col("exchange") == "btsp"))
    rows = df.collect()
    assert len(rows) == len(PAIRS)
    assert all(r["exchange"] == "btsp" for r in rows)


def test_stream_source_offsets_resume_exactly(spark, tmp_path):
    """tickerstream: micro-batches advance integer offsets; the rows
    that reach the sink are exactly the deterministic sequence prefix
    (no gap, no dup), and a RESTART from the same checkpoint resumes
    at the committed offset instead of replaying from zero."""
    import os

    pyds.register(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    def start_query(max_n):
        # max_n bounds the feed so the query QUIESCES before we stop
        # it — stopping mid-batch would leave a partial append
        return (spark.readStream.format("tickerstream")
                .option("pairs", "aaa,bbb,ccc").option("rate", "7")
                .option("max_n", str(max_n))
                .load()
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(processingTime="300 milliseconds").start())

    def n_rows():
        if not os.path.exists(out):
            return 0
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0  # only an empty batch-0 dir exists yet

    q = start_query(max_n=21)
    deadline = time.time() + 60
    while time.time() < deadline and n_rows() < 21:
        time.sleep(0.3)
    q.stop()
    n1 = n_rows()
    assert n1 == 21

    got = [tuple(r) for r in spark.read.parquet(out).collect()]
    expected = [pyds._fixture_row(
        "btsp" if i % 2 == 0 else "btfx",
        ["aaa", "bbb", "ccc"][i % 3], seq=i) for i in range(n1)]
    assert sorted(got) == sorted(map(tuple, expected))

    # restart on the same checkpoint with a raised bound: continues
    # past n1 without replaying — the final sink contents are still a
    # gap-free dup-free prefix
    q2 = start_query(max_n=35)
    deadline = time.time() + 60
    while time.time() < deadline and n_rows() < 35:
        time.sleep(0.3)
    q2.stop()
    n2 = n_rows()
    assert n2 == 35 > n1
    final = [tuple(r) for r in spark.read.parquet(out).collect()]
    expected2 = [pyds._fixture_row(
        "btsp" if i % 2 == 0 else "btfx",
        ["aaa", "bbb", "ccc"][i % 3], seq=i) for i in range(n2)]
    assert sorted(final) == sorted(map(tuple, expected2)), (
        "restart replayed or skipped committed offsets")


def test_batch_writer_two_phase_commit(spark, tmp_path):
    """format('mqpublish') batch write: per-partition temp files are
    only renamed into place by the driver commit, the manifest counts
    every published row, the payloads round-trip through JSON, and no
    temp file survives."""
    import glob
    import json
    import os

    pyds.register(spark)
    out = str(tmp_path / "mq")
    df = spark.range(100).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload"))
    df.repartition(4).write.format("mqpublish") \
        .option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "batch.manifest.json")))
    assert manifest["n_rows"] == 100
    rows = []
    for fn in manifest["files"]:
        with open(os.path.join(out, fn)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_stream_writer_per_batch_manifests(spark, tmp_path):
    """Streaming side of the publish connector: each micro-batch
    commits its own atomic manifest; across all manifests the
    published messages are exactly the bounded feed's sequence (no
    loss, no dup), and no temp file survives."""
    import glob
    import json
    import os

    pyds.register(spark)
    out = str(tmp_path / "mq_stream")
    q = (spark.readStream.format("tickerstream")
         .option("pairs", "aaa,bbb").option("rate", "6")
         .option("max_n", "18")
         .load()
         .writeStream.format("mqpublish")
         .option("path", out).option("prefix", "b")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(processingTime="300 milliseconds").start())
    deadline = time.time() + 60

    def published():
        total = 0
        for m in glob.glob(os.path.join(out, "b-*.manifest.json")):
            total += json.load(open(m))["n_rows"]
        return total

    while time.time() < deadline and published() < 18:
        time.sleep(0.3)
    q.stop()

    manifests = sorted(glob.glob(os.path.join(out, "b-*.manifest.json")))
    assert len(manifests) >= 3  # 18 ticks at rate 6 => >= 3 batches
    msgs = []
    for m in manifests:
        for fn in json.load(open(m))["files"]:
            with open(os.path.join(out, fn)) as f:
                msgs += [json.loads(line) for line in f]
    expected = [pyds._fixture_row(
        "btsp" if i % 2 == 0 else "btfx",
        ["aaa", "bbb"][i % 2], seq=i) for i in range(18)]
    assert sorted((m["pair"], m["last"]) for m in msgs) \
        == sorted((e[1], e[5]) for e in expected)
    assert not glob.glob(os.path.join(out, ".tmp-*"))
