"""Mergeable frequency sketches (X4 sketch tier, round 5): count-min —
the bounded-memory answer to "how often does token X occur in 100 TB"
when the exact vocabulary histogram (top_tokens / token_postings) is
itself too large to materialize per partition/day.

Why a sketch and not the exact agg: the exact token histogram is
vocab-sized state per aggregation window; at web scale with daily
partitions you want a FIXED-size summary per partition that merges by
ADDITION (sum the bucket grids) and answers point queries with a
one-sided error bound: estimate >= true count always, and
P[estimate > true + e*N/width] <= exp(-depth). The HLL sketch
(lang_distinct_token_sketch) covers mergeable DISTINCT counts; this
covers mergeable FREQUENCIES — together they are the re-aggregation
tier exact aggs can't provide.

Engine portability: bucket index = CAST(first 8 hex chars of
md5(row_id | item) AS int) % width — Spark computes it with
conv(substring(md5(...)), 16, 10), DuckDB with CAST('0x'||prefix AS
BIGINT); identical values, so the sketch GRID itself is DuckDB-oracled
(a rare property for sketch code — most hash families aren't portable,
cf. the HLL row being rows-only).

Scale shape: the build is one explode(depth)+agg with map-side combine
— the shuffle carries at most depth×width rows per map partition no
matter how large the corpus; estimation joins a broadcast-sized probe
grid against the broadcast-sized sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_bucket(item: Column, row_id: Column, width: int) -> Column:
    """Bucket of ``item`` under hash row ``row_id`` — 32-bit md5
    prefix of 'row|item', mod width."""
    h = F.md5(F.concat(row_id.cast("string"), F.lit("|"),
                       item.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % width).cast("int")


def countmin_build(items: DataFrame, item_col: str,
                   depth: int = CM_DEPTH,
                   width: int = CM_WIDTH) -> DataFrame:
    """Build the sketch grid: (row_id, bucket, c) with at most
    depth × width rows. Rows that never collide with an item are
    absent (an absent cell estimates 0). Merging two sketches is
    UNION ALL + groupBy-sum of this exact frame — pinned by the
    half-vs-whole merge test."""
    cells = F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(
            i.cast("int").alias("row_id"),
            cm_bucket(F.col(item_col), i, width).alias("bucket"))))
    return (items.select(cells.alias("cell"))
            .select("cell.row_id", "cell.bucket")
            .groupBy("row_id", "bucket")
            .agg(F.count("*").alias("c")))


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch grids built with the SAME depth/width: buckets
    add. This is the whole point — per-partition/day sketches
    re-aggregate without rescanning the corpus."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("row_id", "bucket")
            .agg(F.sum("c").alias("c")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      item_col: str, depth: int = CM_DEPTH,
                      width: int = CM_WIDTH) -> DataFrame:
    """Point-query estimates for each probe item: min over the depth
    rows of the probed cell (absent cell = 0). Guarantee: estimate >=
    true count, overestimate bounded by sums of colliding items.
    Output: (item_col, est)."""
    cells = F.explode(F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: F.struct(
            i.cast("int").alias("row_id"),
            cm_bucket(F.col(item_col), i, width).alias("bucket"))))
    probe_cells = (probes.select(item_col, cells.alias("cell"))
                   .select(item_col, "cell.row_id", "cell.bucket"))
    return (probe_cells
            .join(F.broadcast(sketch), ["row_id", "bucket"], "left")
            .withColumn("c", F.coalesce("c", F.lit(0)))
            .groupBy(item_col)
            .agg(F.min("c").alias("est")))
