"""Streaming source bindings (reference S6/ST1-ST3).

The reference drains a WSS library's in-process queue in a busy-wait
loop (main.py:391-398). Here the live feed is a Structured Streaming
source; the engine's transforms are source-agnostic DataFrame fns, so
the same pipeline binds to:

  file_tick_stream   parquet-directory source — tests and backfills
                     (availableNow=True gives the replay-everything-
                     then-stop semantics of a historical job)
  rate_tick_stream   synthetic rate source shaped like the tick schema
                     — connectivity/perf smoke without data at rest

A production Kafka/socket binding plugs in the same way (readStream
.format("kafka") -> from_json(value) -> same columns); not shipped
because this container has no broker to integrate against.

Empty micro-batches (reference ST2 ``queue.Empty: pass``) are native
no-ops in Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TICK_WSS_RAW


def file_tick_stream(spark: SparkSession, path: str,
                     schema=TICK_WSS_RAW,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Parquet-directory tick stream. Schema is explicit (streaming
    sources never infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def rate_tick_stream(spark: SparkSession, rows_per_second: int = 100,
                     n_pairs: int = 4) -> DataFrame:
    """Rate-source ticks: deterministic synthetic bid/ask around a
    drifting value, pair round-robined — the shape of TICK_WSS after
    projection."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second)).load())
    v = (F.col("value") % 1000).cast("double") + 10.0
    return rate.select(
        F.concat(F.lit("pair"), (F.col("value") % n_pairs).cast("string"))
         .alias("pair"),
        (v * 0.999).alias("bid"),
        (v * 1.001).alias("ask"),
        v.alias("last_price"),
        F.abs(v).alias("volume"),
        F.col("timestamp").alias("ts"))
