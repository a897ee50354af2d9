"""As-of (point-in-time) join — the canonical market-data operator
Spark's join surface lacks (reference domain: every tick interpreted
against the latest official quote/candle at or before its event time).

Implementation is a union + keyed window carry-forward, not a join:

  1. tag right rows 0, left rows 1; union on (key, event time)
  2. one shuffle on the key; sort by (ts, side) so a right row at the
     exact same timestamp sorts before the left rows it must serve
  3. last(right_col, ignorenulls) over rows unbounded-preceding..current
     carries the most recent right payload onto every left row
  4. keep left rows; inner semantics = drop rows with no prior match

Scale: one exchange + one sort per call — the same cost as a regular
sort-merge join, with no range-explosion; skewed keys split via AQE.
Right-side rows must be unique per (key, ts) for determinism (true for
any sane quote feed; assert upstream if not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              how: str = "inner") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key.

    Right payload column names must not clash with left columns
    (rename, e.g. ``quote_price``, before calling). ``how`` is
    ``inner`` (drop left rows with no prior right row) or ``left``
    (keep them with NULL payload)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    payload = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {clash}")

    l_tagged = left.withColumn("__ats", F.col(left_ts)).withColumn(
        "__side", F.lit(1))
    # The whole right payload travels as ONE struct (never NULL on a
    # right row, even when every payload field is NULL), so
    # last(ignorenulls) carries the most recent right ROW atomically.
    # Per-column carry would leak an OLDER row's value into a field
    # the matching row holds as NULL; first-payload-column match
    # detection additionally IndexErrors on a payload-less right side.
    # The struct's __match_ts field doubles as the match marker.
    r_tagged = (right.select(
                    on, F.col(right_ts).alias("__ats"),
                    F.struct(F.col(right_ts).alias("__match_ts"), *payload)
                     .alias("__rpay"))
                .withColumn("__side", F.lit(0)))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (Window.partitionBy(on).orderBy("__ats", "__side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__rpay", F.last("__rpay", ignorenulls=True).over(w))

    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__rpay").isNotNull())
    out = out.select(*left.columns,
                     *[F.col(f"__rpay.{c}").alias(c) for c in payload])
    return out
