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
              how: str = "inner", direction: str = "backward",
              tolerance_s: float | None = None) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: ``direction='backward'`` (default) the greatest
    ``right_ts <= left_ts``; ``direction='forward'`` the smallest
    ``right_ts >= left_ts`` (pandas ``merge_asof`` semantics, both
    inclusive at equality). ``tolerance_s`` bounds the allowed gap
    ``|left_ts - right_ts|`` in seconds — a match farther away than
    the tolerance counts as NO match (stale quotes must not serve
    fresh ticks); None = unbounded.

    Right payload column names must not clash with left columns
    (rename, e.g. ``quote_price``, before calling). ``how`` is
    ``inner`` (drop left rows with no match) or ``left`` (keep them
    with NULL payload). Cost is identical for both directions and
    with/without tolerance: one exchange + one sort; the tolerance is
    a post-carry filter on the matched timestamp, not a join
    condition."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {clash}")

    l_tagged = left.withColumn("__ats", F.col(left_ts)).withColumn(
        "__side", F.lit(1))
    # The whole right payload travels as ONE struct (never NULL on a
    # right row, even when every payload field is NULL), so the
    # ignorenulls carry moves the nearest right ROW atomically.
    # Per-column carry would leak an OLDER row's value into a field
    # the matching row holds as NULL; first-payload-column match
    # detection additionally IndexErrors on a payload-less right side.
    # The struct's __match_ts field doubles as the match marker.
    # Side tag ordering makes equality INCLUSIVE in both directions:
    # backward, a right row at the exact left ts must sort BEFORE the
    # left row (tag 0 < 1); forward, AFTER it (tag 2 > 1) so the
    # forward-looking window still sees it.
    r_side = 0 if direction == "backward" else 2
    r_tagged = (right.select(
                    on, F.col(right_ts).alias("__ats"),
                    F.struct(F.col(right_ts).alias("__match_ts"), *payload)
                     .alias("__rpay"))
                .withColumn("__side", F.lit(r_side)))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    base = Window.partitionBy(on).orderBy("__ats", "__side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__rpay", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__rpay", ignorenulls=True).over(w)
    carried = unioned.withColumn("__rpay", carry)

    out = carried.filter(F.col("__side") == 1)
    if tolerance_s is not None:
        gap = F.abs(F.col(left_ts).cast("double")
                    - F.col("__rpay.__match_ts").cast("double"))
        out = out.withColumn(
            "__rpay", F.when(gap <= float(tolerance_s), F.col("__rpay")))
    if how == "inner":
        out = out.filter(F.col("__rpay").isNotNull())
    out = out.select(*left.columns,
                     *[F.col(f"__rpay.{c}").alias(c) for c in payload])
    return out
