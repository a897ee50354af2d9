"""Whole-registry ANALYSIS smoke (VERDICT r2 #4).

Round 2 lost its entire bench to one AnalysisException
(TIMESTAMP_NTZ) that only surfaced when queries were EXECUTED.
Analysis is cheap: building every registry entry's plan and forcing
resolution (``df.schema``) catches type/resolution breakage across
all ~84 queries in seconds, without running a single job for the
lazily-constructed ones. Any environment shift that changes inferred
source types (the NTZ incident's shape) goes red here first.
"""

from __future__ import annotations

from conftest import SF_SMALL

from stockanalyses_downloader_spark.queries import all_queries

_ALL = all_queries()


def test_every_registry_entry_analyzes(spark):
    failures: dict[str, str] = {}
    for name, q in sorted(_ALL.items()):
        try:
            df = q.spark(spark, SF_SMALL)
            _ = df.schema  # forces full analysis/resolution, no execution
        except Exception as exc:  # noqa: BLE001
            failures[name] = (f"{type(exc).__name__}: "
                              f"{str(exc).splitlines()[0][:200]}")
    assert not failures, f"{len(failures)} queries fail analysis: {failures}"


def test_streaming_sources_analyze(spark, tmp_path):
    """Same guard for the streaming layer, which the registry doesn't
    cover: event-time ops reject TIMESTAMP_NTZ, so build a watermarked
    plan from each simulated source and force analysis."""
    from stockanalyses_downloader_spark.streaming.sources import (
        decode_kafka_ticks, file_tick_stream, kafka_tick_stream,
        rate_tick_stream)

    d = str(tmp_path)
    streams = {
        "file": file_tick_stream(spark, d),
        "kafka": decode_kafka_ticks(kafka_tick_stream(spark, d)),
        "rate": rate_tick_stream(spark),
    }
    failures: dict[str, str] = {}
    for name, s in streams.items():
        try:
            if dict(s.dtypes)["ts"] != "timestamp":
                # file/kafka carry the raw wire double-epoch ts;
                # event-time needs a real timestamp first
                import pyspark.sql.functions as F
                s = s.withColumn("ts", F.timestamp_seconds("ts"))
            _ = s.withWatermark("ts", "10 minutes").schema
        except Exception as exc:  # noqa: BLE001
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
    assert not failures, f"streaming analysis failures: {failures}"
