"""Slowly-changing-dimension (type 2) versioning — the temporal
dimension machinery a market-data warehouse keeps around its reference
data (the currency/ISIN dim is static in the reference
(dims/currency.py), but any production feed of it arrives as change
events, and every historical join needs "the dim AS OF the tick's
time" — the dimension-side dual of operators/asof.py's fact-side
point-in-time join).

Two operators:

  history_from_events   change events (key, ts, state) -> versioned
                        rows (key, state, valid_from, valid_to), where
                        valid_to is the NEXT change's ts (NULL = still
                        current). Consecutive duplicate states are
                        COMPACTED first (a re-sent unchanged state is
                        not a new version) — the lag/lead window pair
                        every SCD2 build reduces to.
  snapshot_as_of        history + timestamp -> the one live row per
                        key at that instant (valid_from <= ts <
                        valid_to).

Scale: one shuffle on the key for the history build (two window
functions over the same (key, ts) sort — Catalyst shares the
exchange), a plain filter for snapshots. No MERGE/upsert storage
engine is required — history is an append-friendly derivation of the
raw event log, recomputable and oracle-checkable (vs Delta/Hudi-style
mutable upserts, which trade recomputability for in-place edits the
reference never needs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def history_from_events(events: DataFrame, key: str, ts: str,
                        state: str) -> DataFrame:
    """(key, state, valid_from, valid_to) — one row per key per state
    RUN. Ties on (key, ts) are broken by state so the build is
    deterministic even if a feed emits two different states at one
    timestamp (the later-sorting state wins the instant; both rows
    surface, the earlier with a zero-length interval).

    NULL states are ordinary values (review r5): a transition TO NULL
    (state cleared) opens a NULL-state version, consecutive NULL
    states compact like any other run, and a key whose FIRST event
    carries NULL still appears — change detection is null-safe
    (eqNullSafe / IS DISTINCT FROM, with an explicit first-row
    marker, since `lag IS NULL` can't distinguish "no previous row"
    from "previous state was NULL")."""
    w = Window.partitionBy(key).orderBy(ts, state)
    changed = (events.select(key, ts, state)
               .withColumn("__rn", F.row_number().over(w))
               .withColumn("__prev", F.lag(state).over(w))
               .filter((F.col("__rn") == 1)
                       | ~F.col(state).eqNullSafe(F.col("__prev"))))
    w2 = Window.partitionBy(key).orderBy(ts, state)
    return (changed
            .withColumn("valid_to", F.lead(ts).over(w2))
            .select(key, state, F.col(ts).alias("valid_from"),
                    "valid_to"))


def snapshot_as_of(history: DataFrame, at: Column) -> DataFrame:
    """The live version of every key at instant ``at``: rows with
    valid_from <= at < valid_to (open-ended current rows match any
    later instant). Keys that first appear after ``at`` are absent —
    a dimension member that didn't exist yet."""
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at)))
