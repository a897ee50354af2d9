"""Bucketed-table layout: pre-shuffled storage so repeated joins and
aggregations on the same key run with ZERO exchanges.

At 100 TB the dominant cost of orders⋈lineitem is shuffling both
facts on the join key — every query, every day. Bucketing pays that
shuffle ONCE at write time: rows are hash-partitioned into a fixed
number of buckets by key and each bucket lands in its own file set;
any later equi-join or groupBy on the bucket key reads co-located
buckets and Catalyst drops the Exchange on both sides (pinned in
tests/test_bucketing.py — the physical plan's SortMergeJoin has no
shuffle under it). This is the at-rest equivalent of the
repartition-reuse pattern in operators/skew.py, and the batch
counterpart of Kafka's keyed partitions.

Spark specifics encoded here:

* bucketed writes go through ``saveAsTable`` (the bucket metadata
  lives in the catalog, not the parquet footers) — a plain
  ``parquet(path)`` write silently drops the bucket spec;
* both join sides must agree on bucket COUNT and key for the
  exchange-free plan; a mismatched count falls back to a normal
  shuffle (correct, just not free) — so the bucket count is a module
  constant, not a per-call knob;
* ``sortBy`` within buckets additionally removes the per-task Sort
  before SortMergeJoin, leaving a pure zip-merge — Spark only trusts
  the write-time sort when each bucket is ONE file (SPARK-19256:
  several files per bucket interleave unsorted), so the writer
  repartitions by the bucket key first (one writer task per bucket =>
  one file per bucket), AND since Spark 3.0 the planner only consumes
  the stored ordering under
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
  (SPARK-28595) — worth enabling for scan-heavy merge-join workloads,
  pinned in the test either way;
* AQE leaves bucketed joins alone (no runtime re-partitioning to
  undo the layout).

Cited parity: the reference re-fetches and re-joins the same
jobs×currency shape every poll cycle (reference main.py:265-306);
bucketing is how the batch engine makes the recurring join free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

N_BUCKETS = 8


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   sort_cols: Sequence[str] | None = None,
                   n_buckets: int = N_BUCKETS,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a catalog table bucketed by ``keys`` (and
    optionally sorted within buckets). ``table`` may be
    ``db.table``; create the database with an explicit LOCATION first
    to control where files land."""
    one_file_per_bucket = df.repartition(n_buckets, *[df[k] for k in keys])
    writer = (one_file_per_bucket.write.format("parquet").mode(mode)
              .bucketBy(n_buckets, *keys))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table. MUST go through the catalog
    (``spark.table``): reading the table's files with
    ``spark.read.parquet`` loses the bucket spec and re-introduces
    the shuffle."""
    return spark.table(table)


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str],
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet layout — the OTHER at-rest
    lever, orthogonal to bucketing: bucketing co-locates a JOIN key
    across files, directory partitioning prunes FILTER keys before a
    single byte is read (the scan's PartitionFilters run against
    directory names, not data). At 100 TB the standard layout is
    both: partition by the dominant filter (e.g. event date), bucket
    by the dominant join key within each partition.

    Low-cardinality partition columns only: every distinct value is a
    directory, and a high-cardinality partition key (user_id...)
    produces millions of tiny files — the small-files problem that
    kills listing time. Pruning is pinned in
    tests/test_bucketing.py::test_partitioned_layout_prunes_directories.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    mode: str = "overwrite") -> int:
    """Small-files compaction — the maintenance job every streaming
    ingest needs eventually: micro-batches write a file (or several)
    per trigger, and a year of 30-second triggers is ~10^6 files
    whose per-file open/footer/listing overhead dominates scan time
    long before data volume does.

    Sizing is from the SOURCE's actual bytes (Hadoop FileSystem
    content summary — works on any supported filesystem, not just
    local), one output file per `target_file_bytes` of input.
    `repartition(n)` round-robins rows for even output sizes — this
    is the one deliberate full shuffle in the module, PAID ONCE to
    delete per-file overhead from every future scan (the same
    write-time-vs-read-time trade as bucketing). Compacting into a
    bucketed/partitioned layout instead is `write_bucketed` /
    `write_partitioned` composed with this read.

    Returns the number of output files requested."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, -(-total_bytes // target_file_bytes))
    (spark.read.parquet(src)
     .repartition(int(n_files))
     .write.mode(mode).parquet(dst))
    return int(n_files)
