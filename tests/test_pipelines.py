"""End-to-end pipeline-runner tests: the full REST batch cycle and the
WSS streaming path, source to queue to job table."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from stockanalyses_downloader_spark import pipelines
from stockanalyses_downloader_spark.operators import state_machine
from stockanalyses_downloader_spark.sources import synthetic
from stockanalyses_downloader_spark.streaming import sources as ssrc

SF = "/root/testdata/sf0.001"


def test_run_rest_batch_end_to_end(spark, tmp_path):
    jobs = synthetic.jobs(spark, SF).limit(300)
    queue_dir = str(tmp_path / "queue")
    jobs_table = str(tmp_path / "jobs_table")

    stats = pipelines.run_rest_batch(spark, jobs, queue_dir, jobs_table)

    assert stats["jobs_in"] == 300
    assert 0 < stats["actionable"] < 300      # filters really filtered
    # every published message is valid JSON with the enriched fields
    files = glob.glob(os.path.join(queue_dir, "conn-*.jsonl"))
    msgs = [json.loads(line) for f in files for line in open(f)]
    assert len(msgs) == stats["published"] > 0
    for m in msgs[:5]:
        assert m["mid"] and m["pair"] and m["isin"].startswith("XFC")
    # job table: claimed jobs ended 1300 (fixture fetch always 200)
    final = spark.read.parquet(jobs_table)
    states = {r["action"] for r in final.collect()}
    assert states <= {state_machine.PUBLISHED, state_machine.ERROR}
    assert final.count() == stats["actionable"]


def test_run_wss_stream_end_to_end(spark, tmp_path):
    raw = synthetic.wss_ticks_raw(spark, SF).drop("isin")
    src = str(tmp_path / "wss_src")
    raw.write.parquet(src)
    queue_dir = str(tmp_path / "wss_queue")

    stream = ssrc.file_tick_stream(spark, src, schema=raw.schema)
    q = pipelines.run_wss_stream(spark, stream, queue_dir,
                                 str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    q.stop()

    files = glob.glob(os.path.join(queue_dir, "conn-*.jsonl"))
    msgs = [json.loads(line) for f in files for line in open(f)]
    assert len(msgs) == raw.count()
    sample = msgs[0]
    assert abs(sample["mid"] - (sample["bid"] + sample["ask"]) / 2) < 1e-9
    assert "isin" in sample and "pair" in sample
