"""Range (interval) join — the second canonical market-data join
Spark's surface lacks natively (sibling of ``operators/asof.py``;
reference domain: interpret each tick against the session/candle/
maintenance window that CONTAINS its event time, main.py:408-415's
tick fields consumed against README.md:11-12's weekly windows).

A naive interval join is a cross product with a range predicate —
Catalyst can only nested-loop it unless an equi-key exists. The scale
shape here turns it into an equi-join:

  1. pick a bucket width W (>= typical interval length)
  2. left rows get ONE bucket: floor(ts / W)
  3. right intervals EXPLODE to every bucket they overlap
     (sequence(floor(start/W), floor((end-1)/W)))
  4. equi-join on (*keys, bucket) — a plain shuffle hash join
  5. exact residual filter start <= ts < end

Each left row meets each overlapping interval in exactly one bucket
(the left row's own), so no dedup pass is needed. Cost is
O(intervals * avg_buckets_per_interval) exploded rows — W trades
explode volume against bucket-join selectivity; at 100 TB choose W
near the 95th-percentile interval length and let AQE handle residual
bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_SECOND = 1_000_000


def range_join(left: DataFrame, right: DataFrame, left_ts: str,
               right_start: str, right_end: str,
               keys: list[str] | None = None,
               bucket_width_s: int = 86_400,
               max_buckets_per_interval: int = 1_000,
               how: str = "inner") -> DataFrame:
    """Join each left row to every right interval with
    ``right_start <= left_ts < right_end`` (closed-open, the market
    convention), optionally also matching on equi ``keys``.

    ``how='inner'`` drops unmatched left rows; ``how='left'`` keeps
    them with NULL right payload (matched rows ∪ anti-join of the
    matched left side — a plain left join on the bucket would wrongly
    drop rows whose bucket collides but whose residual fails).

    ``left_ts``/``right_start``/``right_end`` are timestamp columns.
    Right payload column names must not clash with left columns.
    An interval spanning more than ``max_buckets_per_interval``
    buckets fails the job (assert_true) instead of silently exploding
    the bucket fan-out — raise the width, not the cap."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = keys or []
    payload = [c for c in right.columns if c not in (*keys,)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {clash}")

    w_us = bucket_width_s * US_PER_SECOND
    l_bucket = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(w_us))
    start_b = F.floor(F.unix_micros(F.col(right_start)) / F.lit(w_us))
    end_b = F.floor((F.unix_micros(F.col(right_end)) - 1) / F.lit(w_us))
    n_buckets = end_b - start_b + 1
    guarded = F.when(
        F.assert_true(n_buckets <= max_buckets_per_interval,
                      F.lit("range_join: interval spans too many buckets; "
                            "increase bucket_width_s")).isNull(),
        F.sequence(start_b, end_b))

    l = left.withColumn("__bucket", l_bucket)
    r = (right
         .withColumn("__bucket", F.explode(guarded))
         .withColumnRenamed(right_start, f"__rs_{right_start}")
         .withColumnRenamed(right_end, f"__re_{right_end}"))

    joined = l.join(r, [*keys, "__bucket"])
    out = joined.filter(
        (F.col(left_ts) >= F.col(f"__rs_{right_start}"))
        & (F.col(left_ts) < F.col(f"__re_{right_end}")))
    out = (out
           .withColumnRenamed(f"__rs_{right_start}", right_start)
           .withColumnRenamed(f"__re_{right_end}", right_end))
    out = out.drop("__bucket")
    if how == "left":
        # anti join keyed on the full left row: exact when left rows
        # are distinct and key/ts columns are non-null (true for any
        # id-carrying fact table; duplicate left rows would collapse)
        unmatched = left.join(
            out.select(*left.columns), left.columns, "left_anti")
        out = out.unionByName(unmatched, allowMissingColumns=True)
    return out
