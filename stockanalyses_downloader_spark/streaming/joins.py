"""Stream-stream joins (ST extension, round 5): the live counterpart
of the batch interval machinery (operators/asof.py, rangejoin.py).

Reference domain: the WSS pipeline consumes two live feeds — trade
ticks and book quotes (main.py:375-434's BtfxWss channels) — and every
enrichment the reference does batch-wise (attach the quote context a
tick arrived under) becomes a stream-stream join online. Spark's
Structured Streaming supports exactly this shape natively when the
join carries an EVENT-TIME RANGE condition plus watermarks on both
sides: the range bound tells the engine how much of each side's state
can ever still match, so state is evicted as the watermarks advance —
without it, both sides buffer forever (the unbounded-state failure
ST6's TTL work closed for aggregations).

Scale shape: state per key is bounded by (lookback + watermark) ×
arrival rate; the join itself shuffles both streams on the key exactly
like the batch equi-join. The SAME transform bound to static frames is
the batch backfill (ST7's write-once-bind-twice contract) — pinned by
the stream-matches-batch test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(left: DataFrame, right: DataFrame,
                          left_key: str, right_key: str,
                          left_ts: str, right_ts: str,
                          lookback_s: int = 60,
                          watermark_s: int = 120,
                          how: str = "inner") -> DataFrame:
    """Inner-join each left event to every right event of the same key
    whose timestamp lies in the closed window
    ``[left_ts - lookback_s, left_ts]`` (the "context the tick arrived
    under" window).

    Works identically on streaming and static frames: watermarks are
    applied only when the input is streaming (``withWatermark`` on a
    batch frame is a documented no-op), so one definition serves both
    the live pipeline and its backfill. Column names must not clash
    across sides (same contract as rangejoin.range_join) — including
    the key columns, which both survive into the output for
    downstream sanity checks.

    For streaming inputs both sides MUST carry a watermark and the
    range condition bounds both buffers: left state can be dropped
    once right's watermark passes left_ts + lookback, right state once
    left's watermark passes right_ts (Spark derives both from the
    condition).

    ``how='left_outer'`` keeps left events with no in-window partner,
    NULL-padded — emitted only once the watermark has passed the
    event's window (the engine must be SURE no partner can still
    arrive), so outer results trail the watermark by construction; a
    batch bind emits them immediately."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"column names clash across sides: {clash}")
    wl = left.withWatermark(left_ts, f"{watermark_s} seconds")
    wr = right.withWatermark(right_ts, f"{watermark_s} seconds")
    cond = ((wl[left_key] == wr[right_key])
            & (wr[right_ts] <= wl[left_ts])
            & (wr[right_ts] >= wl[left_ts]
               - F.expr(f"INTERVAL {int(lookback_s)} SECONDS")))
    return wl.join(wr, cond, how)
