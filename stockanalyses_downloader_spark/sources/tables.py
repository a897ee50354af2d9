"""Parquet table loaders for the driver test corpus (TESTDATA.md).

Plain ``spark.read.parquet`` — the parquet footer already carries the
schema, and going through the footer (rather than a redundant explicit
schema) keeps vectorized reading, predicate pushdown and column pruning
on the default fast path. At 100 TB these tables would be
directory-partitioned (e.g. orders by o_orderdate month); the loader
takes any directory layout transparently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    # reader rejects; read nanos as long and truncate to microseconds
    # (same truncation DuckDB applies, so the oracle sees equal values).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            # integral `div`, not `/`: epoch-nanos exceeds double's mantissa
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, TimestampNTZType):
            # PySpark 4.1 infers tz-less parquet timestamps as TIMESTAMP_NTZ,
            # which unix_micros() and withWatermark() reject. The session tz
            # is pinned UTC (session.py), so casting to TIMESTAMP is a pure
            # type relabel — the instant values are unchanged and match what
            # the DuckDB oracle computes on the same files.
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
