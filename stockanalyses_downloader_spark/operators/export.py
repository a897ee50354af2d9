"""Training-data export: the last-mile hand-off from the curation
pipeline to a trainer — sharded JSONL plus an integrity manifest.

Trainers consume line-delimited shards, not parquet; what matters at
the hand-off is (a) deterministic sharding (re-running the export
reproduces byte-identical shard membership — md5-keyed, the same
engine-portable primitive as sampling.py), (b) a manifest recording
per-shard row/token counts and an order-insensitive content checksum,
and (c) a verification pass that recomputes the checksums FROM THE
WRITTEN FILES so a truncated upload, a lost line, or silent
corruption is caught before a training run wastes a cluster-day on a
bad corpus.

The checksum is the sum of per-row digest prefixes mod 2^62 —
order-insensitive (addition commutes, so parallel file listing order
can't matter) and content-sensitive (any changed/missing/extra line
moves the sum; forging a compensating line needs a digest preimage).
Same family as corpus_datacard's dup-fraction digests.

Scale shape: shard assignment and row digests are in-plan; the write
is one hash repartition + partitioned text write (one file per shard
directory); the manifest is shard-count rows (model-sized driver
materialization, like every sizes/centroids table in this repo).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MOD = 1 << 62


def _row_digest_sum(line: Column) -> Column:
    """Order-insensitive content checksum contribution of one line:
    first 15 hex chars of md5 as a long (60 bits — sums of billions
    of rows stay exact in decimal; the stored checksum is the decimal
    sum mod 2^62)."""
    return F.conv(F.substring(F.md5(line.cast("binary")), 1, 15),
                  16, 10).cast("decimal(38,0)")


def export_training_shards(df: DataFrame, path: str, id_col: str,
                           payload_cols: Sequence[str],
                           n_shards: int = 8,
                           token_col: str | None = None) -> None:
    """Write ``df`` as ``{path}/shards/shard=K/`` JSONL plus
    ``{path}/manifest`` parquet with (shard, n_rows, n_tokens,
    checksum). Shard = md5(id) mod n_shards: deterministic,
    engine-portable, independent of partitioning or run order.

    spread() first (r11 rollout): the JSON serialization + per-row
    digest run map-side BEFORE the shard repartition, and both the
    write and the manifest branch recompute them — a narrow upstream
    would serialize the whole encode twice."""
    from .dedup import spread
    df = spread(df)
    line = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")
                                      .cast("binary")), 1, 8), 16, 10)
             .cast("long") % n_shards).cast("int")
    staged = df.select(
        shard.alias("shard"), line.alias("line"),
        (F.col(token_col) if token_col else F.lit(0))
        .cast("long").alias("__tok"))
    (staged.repartition(n_shards, "shard")
     .select("shard", "line")
     .write.mode("overwrite").partitionBy("shard")
     .text(f"{path}/shards"))
    manifest = (staged.groupBy("shard")
                .agg(F.count("*").alias("n_rows"),
                     F.sum("__tok").alias("n_tokens"),
                     (F.sum(_row_digest_sum(F.col("line"))) % _MOD)
                     .cast("long").alias("checksum")))
    manifest.coalesce(1).write.mode("overwrite") \
        .parquet(f"{path}/manifest")


def verify_export(spark: SparkSession, path: str) -> DataFrame:
    """Recompute every shard's row count and checksum FROM THE
    WRITTEN FILES and compare to the manifest. Output one row per
    shard: (shard, n_rows, checksum, file_rows, file_checksum, ok) —
    ``ok`` false on any truncation, corruption, or loss. A missing
    shard directory surfaces as NULL file columns (outer join), an
    EXTRA unmanifested shard as NULL manifest columns."""
    import glob as _glob
    # partition column 'shard' is recovered from the directory names;
    # an EMPTY export writes no shard=K dirs at all, so discovery has
    # nothing to infer from — degrade to an empty recomputed frame
    # with the right schema instead of an unresolved-column error
    if _glob.glob(f"{path}/shards/shard=*"):
        files = (spark.read.text(f"{path}/shards")
                 .withColumnRenamed("value", "line"))
        recomputed = (files.groupBy("shard")
                      .agg(F.count("*").alias("file_rows"),
                           (F.sum(_row_digest_sum(F.col("line"))) % _MOD)
                           .cast("long").alias("file_checksum")))
    else:
        recomputed = spark.createDataFrame(
            [], "shard int, file_rows long, file_checksum long")
    manifest = spark.read.parquet(f"{path}/manifest")
    joined = manifest.join(recomputed, "shard", "full_outer")
    ok = (F.col("n_rows").eqNullSafe(F.col("file_rows"))
          & F.col("checksum").eqNullSafe(F.col("file_checksum")))
    return joined.select("shard", "n_rows", "checksum",
                         "file_rows", "file_checksum", ok.alias("ok"))


def export_is_valid(spark: SparkSession, path: str) -> bool:
    """True iff every shard verifies (driver-side fold over the
    shard-count verification frame)."""
    rows = verify_export(spark, path).collect()
    return bool(rows) and all(r["ok"] for r in rows)
